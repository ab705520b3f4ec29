"""N-body/SPH simulation import: particles -> adaptive grid.

Rebuild of user_routines_Nbody_SPH.f90 + the related io/sed routines:
star/gas particles are binned into the octree (av_galaxy nbody.f90:403-649),
dust follows gas mass x metallicity with a temperature cut (nbody:561-565),
stellar luminosities come from an SSP library interpolated in (age, Z)
(set_star_particle_luminosity, sed_routines.f90:2839-2906).

The reference accelerates binning with a 10^3 sector index and per-cell
particle loops; here the particle sums per cell are exact box sums over a
summed-area table on the virtual finest grid — one pass builds cumulative
sums, every cell query is 8 lookups.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..constants import M_H, MSUN, PARSEC
from ..grid.builder import build_grid


@dataclasses.dataclass
class Particles:
    starcoord: np.ndarray  # (Ns,3)
    mstar: np.ndarray  # (Ns,) [Msun]
    agestar: np.ndarray  # (Ns,) [Gyr]
    fehstar: np.ndarray  # (Ns,)
    gascoord: np.ndarray  # (Ng,3)
    mgas: np.ndarray  # (Ng,) [Msun]
    gastemp: np.ndarray  # (Ng,) [K]
    fehgas: np.ndarray  # (Ng,)
    ofegas: np.ndarray  # (Ng,)


def load_particles(path: str) -> Particles:
    """Read the file_nbody_sph HDF5 produced by tipsy2dartray.py
    (dataset list io_routines.f90:149-160)."""
    import h5py

    with h5py.File(path, "r") as f:
        def g(name):
            a = f[name][...]
            return a.T if a.ndim == 2 and a.shape[0] == 3 else a

        return Particles(
            starcoord=g("starcoord"), mstar=f["mstar"][...],
            agestar=f["agestar"][...], fehstar=f["fehstar"][...],
            gascoord=g("gascoord"), mgas=f["mgas"][...],
            gastemp=f["gastemp"][...], fehgas=f["fehgas"][...],
            ofegas=f["ofegas"][...],
        )


@dataclasses.dataclass
class StellarLibrary:
    lambda_um: np.ndarray  # (Nl,)
    age_yr: np.ndarray  # (Na,)
    met: np.ndarray  # (Nm,)
    lum_to_mass: np.ndarray  # (Nl, Na, Nm) [erg/s/Hz/Msun]


def load_stellar_library(path: str) -> StellarLibrary:
    """Read a stellar library HDF5 (read_stellar_library io_routines.f90:4165;
    e.g. STELLAR_LIBRARIES/maraston2005/...h5)."""
    import h5py

    with h5py.File(path, "r") as f:
        names = {k.lower(): k for k in f.keys()}

        def pick(*cands):
            for c in cands:
                if c in names:
                    return f[names[c]][...]
            raise KeyError(f"none of {cands} in {list(f.keys())}")

        lam = pick("lambda_lib_arr", "lambda_arr", "lambda_lib")
        age = pick("age_arr", "age_lib_arr", "age_lib")
        met = pick("met_arr", "met_lib_arr", "met_lib")
        ltm = pick("lum_to_mass_arr", "lum_to_mass", "lum_to_mass_lib")
    # the shipped maraston2005 table contains NaNs at unpopulated
    # (age, metallicity) corners; treat them as zero luminosity
    ltm = np.nan_to_num(np.asarray(ltm), nan=0.0)
    # normalize axis order to (Nl, Na, Nm)
    shape = (len(lam), len(age), len(met))
    if ltm.shape != shape:
        perm = [ltm.shape.index(s) for s in shape]
        ltm = np.transpose(ltm, perm)
    return StellarLibrary(np.asarray(lam), np.asarray(age), np.asarray(met), ltm)


def star_luminosities(lambda_um: float, parts: Particles, lib: StellarLibrary,
                      z_sun: float = 0.018):
    """Per-particle luminosity at one wavelength [erg/s/Hz]: mass times the
    (age, Z)-bilinear-interpolated (log) L/M ratio
    (set_star_particle_luminosity, sed_routines.f90:2839-2906)."""
    il = int(np.argmin(np.abs(lib.lambda_um - lambda_um)))
    if abs(lib.lambda_um[il] - lambda_um) / lambda_um > 1e-3:
        # interpolate the library in lambda too (the reference pre-interpolates
        # onto the RT grid, lum_to_mass_int)
        tab = 10.0 ** np.stack(
            [
                np.interp(np.log10(lambda_um), np.log10(lib.lambda_um),
                          np.log10(np.maximum(lib.lum_to_mass[:, a, m], 1e-300)))
                for a in range(len(lib.age_yr))
                for m in range(len(lib.met))
            ]
        ).reshape(len(lib.age_yr), len(lib.met))
    else:
        tab = lib.lum_to_mass[il]

    t = parts.agestar * 1e9  # Gyr -> yr
    z = z_sun * 10.0**parts.fehstar

    ia = np.clip(np.searchsorted(lib.age_yr, t) - 1, 0, len(lib.age_yr) - 2)
    iz = np.clip(np.searchsorted(lib.met, z) - 1, 0, len(lib.met) - 2)
    ta, tb = lib.age_yr[ia], lib.age_yr[ia + 1]
    za, zb = lib.met[iz], lib.met[iz + 1]
    wa = (t - ta) / (tb - ta)
    wz = (z - za) / (zb - za)
    lt = np.log10(np.maximum(tab, 1e-300))
    f = (
        lt[ia, iz] * (1 - wa) * (1 - wz)
        + lt[ia + 1, iz] * wa * (1 - wz)
        + lt[ia, iz + 1] * (1 - wa) * wz
        + lt[ia + 1, iz + 1] * wa * wz
    )
    return parts.mstar * 10.0**f


def kext_gas(kext_per_grain_m2: float, tot_n_dust: float) -> float:
    """Extinction cross section per Msun of (solar-metallicity) gas, in
    pc^2/Msun (set_kext_gas, nbody.f90:102-111): assumes
    n_tot = n_H + n_He = 1.1 n_H -> mean mass 1.4 m_H per H."""
    return kext_per_grain_m2 * tot_n_dust / (1.4 * M_H * PARSEC**2) * MSUN


class _SAT:
    """Summed-area tables of particle quantities on the virtual finest grid."""

    def __init__(self, coords, weights, modelsize, n_fine):
        self.n = n_fine
        self.ms = modelsize
        idx = np.floor((coords + modelsize / 2.0) / (modelsize / n_fine)).astype(np.int64)
        ok = np.all((idx >= 0) & (idx < n_fine), axis=1)
        idx = idx[ok]
        self.tables = []
        for w in weights:
            h = np.zeros((n_fine,) * 3)
            np.add.at(h, (idx[:, 0], idx[:, 1], idx[:, 2]), np.asarray(w)[ok])
            sat = h.cumsum(0).cumsum(1).cumsum(2)
            self.tables.append(np.pad(sat, ((1, 0),) * 3))

    def box_sums(self, lo, hi):
        """Sums over fine-index boxes [lo, hi) per table; lo/hi (N,3)."""
        out = []
        for t in self.tables:
            s = (
                t[hi[:, 0], hi[:, 1], hi[:, 2]]
                - t[lo[:, 0], hi[:, 1], hi[:, 2]]
                - t[hi[:, 0], lo[:, 1], hi[:, 2]]
                - t[hi[:, 0], hi[:, 1], lo[:, 2]]
                + t[lo[:, 0], lo[:, 1], hi[:, 2]]
                + t[lo[:, 0], hi[:, 1], lo[:, 2]]
                + t[hi[:, 0], lo[:, 1], lo[:, 2]]
                - t[lo[:, 0], lo[:, 1], lo[:, 2]]
            )
            out.append(s)
        return out


def build_nbody_grid(
    parts: Particles,
    star_lum_ref: np.ndarray,  # (Ns,) luminosities at lambda_ref [erg/s/Hz]
    kext_gas_ref: float,  # [pc^2/Msun]
    base=(10, 2),
    max_lvl: int = 5,
    min_lvl: int = 1,
    modelsize: float = 50_000.0,
    max_ncell: int = 3_000_000,
    max_dtau: float = 0.5,
    max_dlum: float = 1e-5,
    gastemp_limit: float = 1e6,
):
    """Adaptive grid from the particle distribution.

    Cell dust extinction [1/pc] = kext_gas_ref * sum(mgas * 10^([O/Fe]+[Fe/H]))
    / V over cool gas (av_galaxy nbody.f90:561-565); cell stellar emissivity
    = sum(star_lum)/V.  Subdivision per the 'standard' criterion: tau or
    luminosity above thresholds (relative to the model totals).
    """
    n_fine = base[0] * base[1] ** (max_lvl - 1)
    if n_fine > 512:
        raise ValueError(f"n_fine={n_fine} too large for the SAT binning")
    cool = parts.gastemp < gastemp_limit
    mdust = np.where(cool, parts.mgas * 10.0 ** (parts.ofegas + parts.fehgas), 0.0)
    sat_gas = _SAT(parts.gascoord, [mdust], modelsize, n_fine)
    sat_star = _SAT(parts.starcoord, [star_lum_ref], modelsize, n_fine)
    fine_size = modelsize / n_fine

    tot_lum = float(star_lum_ref.sum())
    # mean optical depth over the model (subdivision_criteria doc nbody:44-46)
    tau_model = kext_gas_ref * float(mdust.sum()) / modelsize**3 * modelsize

    def dens_fn(centers, csize):
        lo = np.rint((np.asarray(centers) - csize[:, None] / 2 + modelsize / 2) / fine_size).astype(np.int64)
        n_per = np.rint(csize / fine_size).astype(np.int64)
        hi = lo + n_per[:, None]
        lo = np.clip(lo, 0, n_fine)
        hi = np.clip(hi, 0, n_fine)
        (md,) = sat_gas.box_sums(lo, hi)
        (ls,) = sat_star.box_sums(lo, hi)
        vol = csize**3
        return kext_gas_ref * md / vol, ls / vol

    def subdivision_fn(centers, csize, level, dens, dens_stars):
        tau = dens * csize
        lum = dens_stars * csize**3
        return (level < max_lvl) & (
            (tau > max_dtau * tau_model) | (lum > max_dlum * tot_lum)
        )

    return build_grid(
        dens_fn, subdivision_fn, base=base, max_lvl=max_lvl, min_lvl=min_lvl,
        modelsize=modelsize, max_ncell=max_ncell,
    )


def particle_cells(grid, coords):
    """Particle -> host-cell map (pcell_star/pcell_gas,
    nbody.f90:528,570; persisted by print_pcell nbody:663)."""
    from ..grid.octree import point_to_cell

    cell, _ = point_to_cell(grid, np.asarray(coords))
    return np.asarray(cell)


def nbody_dens_stars_arr(grid, parts: Particles, lib: StellarLibrary,
                         lambda_um, z_sun: float = 0.018):
    """Per-wavelength stellar emissivity on the grid leaves: the lambda-grid
    equivalent, via the particle->cell map."""
    pcell = particle_cells(grid, parts.starcoord)
    vol = np.asarray(grid.csize) ** 3
    lam = np.atleast_1d(np.asarray(lambda_um))
    out = np.zeros((grid.n_cells, len(lam)))
    for il, l in enumerate(lam):
        lum = star_luminosities(float(l), parts, lib, z_sun)
        np.add.at(out[:, il], pcell, lum)
    out /= vol[:, None]
    return out
