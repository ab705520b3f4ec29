"""Output files: reference-compatible naming, writers/readers, restart.

Rebuild of the output layer of io_routines.f90: filename scheme
(set_filenames io:720-794), per-wavelength HDF5 files for the big arrays,
stage-level restart detection (check_files io:893).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np


def wave_label(lambda_um: float) -> str:
    """Fortran "(F9.3)" trimmed (read_lambda_list io_routines.f90:2301)."""
    return f"{lambda_um:9.3f}".strip()


@dataclasses.dataclass
class OutputFiles:
    """Filename scheme of set_filenames (io_routines.f90:720-794)."""

    dir_runs: str
    label: str
    lambda_um: np.ndarray  # wavelengths of the current RT range
    chext: str = ""  # '' stellar, '_dust_<type>' dust, '_stars_em'/'_opt_depth' projection

    def _f(self, kind: str) -> str:
        return os.path.join(self.dir_runs, f"grid_{self.label}_{kind}{self.chext}.h5")

    def _fl(self, il: int, kind: str) -> str:
        lab = wave_label(self.lambda_um[il])
        return os.path.join(
            self.dir_runs, f"grid_{self.label}_l{lab}um_{kind}{self.chext}.h5"
        )

    # scalar files
    @property
    def sed(self):
        return self._f("sed")

    @property
    def sed_dir(self):
        return self._f("sed_dir")

    @property
    def lum_lost(self):
        return self._f("lum_lost")

    @property
    def lum_lost_part2(self):
        return self._f("lum_lost_part2")

    @property
    def maps(self):
        return self._f("maps")

    @property
    def maps_in(self):
        return self._f("maps_in")

    @property
    def info(self):
        return os.path.join(self.dir_runs, f"grid_{self.label}_info{self.chext}.dat")

    # per-wavelength files
    def u_fest_part1(self, il):
        return self._fl(il, "u_fest_part1")

    def ufield_part2(self, il):
        return self._fl(il, "ufield_part2")

    def ufield(self, il):
        return self._fl(il, "ufield")

    def i_obs(self, il):
        return self._fl(il, "i_obs")

    def i_obs_part2(self, il):
        return self._fl(il, "i_obs_part2")

    def i_obs_in(self, il):
        return self._fl(il, "i_obs_in")

    def i_obs_in_part2(self, il):
        return self._fl(il, "i_obs_in_part2")

    def scaspe_part2(self, il):
        return self._fl(il, "scaspe_part2")

    def scaspe_tot(self, il):
        return self._fl(il, "scaspe_tot")


def _write_h5(path, **datasets):
    import h5py

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with h5py.File(path, "w") as f:
        for k, v in datasets.items():
            f.create_dataset(k, data=np.asarray(v))


def _read_h5(path, name):
    import h5py

    with h5py.File(path, "r") as f:
        return f[name][...]


def write_field_per_lambda(files: OutputFiles, kind: str, arr, ind=None):
    """Write a (ncell|nsid, L) or (nsid, ndir, L) array as per-lambda files.

    kind: 'u_fest_part1' | 'ufield' | 'ufield_part2' | 'i_obs' | ... matching
    the OutputFiles accessors; dataset name inside the file = kind.
    """
    arr = np.asarray(arr)
    L = arr.shape[-1]
    ind = range(L) if ind is None else ind
    for il in ind:
        _write_h5(getattr(files, kind)(il), **{kind: arr[..., il]})


def read_field_per_lambda(files: OutputFiles, kind: str, shape_head, ind=None):
    L = len(files.lambda_um)
    ind = list(range(L)) if ind is None else list(ind)
    out = np.zeros(tuple(shape_head) + (L,))
    for il in ind:
        out[..., il] = _read_h5(getattr(files, kind)(il), kind)
    return out


def write_sed(files: OutputFiles, sed, part2=False):
    _write_h5(files.sed_dir if part2 else files.sed, sed=np.asarray(sed),
              lambda_um=files.lambda_um)


def write_lum_lost(files: OutputFiles, lum_lost, tot_rad_en, part2=False):
    """Lost-luminosity fractions per wavelength (print_lum_lost
    io_routines.f90:2191): > 1% triggers a warning in the reference."""
    frac = np.where(np.asarray(tot_rad_en) > 0,
                    np.asarray(lum_lost) / np.maximum(tot_rad_en, 1e-300), 0.0)
    _write_h5(files.lum_lost_part2 if part2 else files.lum_lost,
              lum_lost=np.asarray(lum_lost), fraction=frac,
              lambda_um=files.lambda_um)


def write_maps(files: OutputFiles, maps_arr, lambda_maps, internal=False):
    _write_h5(files.maps_in if internal else files.maps,
              maps=np.asarray(maps_arr), lambda_um=np.asarray(lambda_maps))


def check_files(files: OutputFiles, need_in: bool = False) -> str:
    """Stage-level restart detection (check_files, io_routines.f90:893):
    returns 'part2' if all direct-light outputs (incl. scaspe) exist,
    'part1' if the precalc output exists, else ''."""
    L = len(files.lambda_um)
    part2 = all(
        os.path.exists(files.ufield_part2(il)) and os.path.exists(files.scaspe_part2(il))
        for il in range(L)
    )
    if part2:
        return "part2"
    part1 = all(os.path.exists(files.u_fest_part1(il)) for il in range(L))
    return "part1" if part1 else ""
