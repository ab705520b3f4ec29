"""Wavelength grid handling.

Mirrors read_lambda_list (io_routines.f90:2258-2493) and set_lambda_arr_si
(sed_routines.f90:951-992): ascending wavelength list in microns, split into
a stellar range (lambda <= max_lambda_stars) and a dust range
(lambda >= min_lambda_dust, default 1 um), with log-centered bin widths for
wavelength integrations.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class WavelengthGrid:
    lambda_um: np.ndarray  # (lnum_tot,) ascending [um]
    lambda_si: np.ndarray  # (lnum_tot,) [m]
    delta_lambda_bin: np.ndarray  # (lnum_tot,) [m]
    i_lambda_stars: tuple  # (start, end) inclusive indices of stellar range
    i_lambda_dust: tuple  # (start, end) inclusive indices of dust range
    no_dust_rt: bool

    @property
    def lnum_tot(self) -> int:
        return len(self.lambda_um)

    @property
    def lnum_stars(self) -> int:
        return self.i_lambda_stars[1] - self.i_lambda_stars[0] + 1

    @property
    def lnum_dust(self) -> int:
        return self.i_lambda_dust[1] - self.i_lambda_dust[0] + 1

    @property
    def stellar_slice(self) -> slice:
        return slice(self.i_lambda_stars[0], self.i_lambda_stars[1] + 1)

    @property
    def dust_slice(self) -> slice:
        return slice(self.i_lambda_dust[0], self.i_lambda_dust[1] + 1)

    @property
    def delta_lambda_bin_stars(self) -> np.ndarray:
        return self.delta_lambda_bin[self.stellar_slice]

    @property
    def delta_lambda_bin_dust(self) -> np.ndarray:
        """Bin widths for the dust range; the last bin is clipped at the grid
        edge exactly as in set_lambda_arr_si (sed_routines.f90:984-988)."""
        lam = self.lambda_si
        i0 = self.i_lambda_dust[0]
        n = self.lnum_dust
        bins = 10.0 ** ((np.log10(lam[1:]) + np.log10(lam[:-1])) / 2.0)
        out = np.empty(n)
        out[1:-1] = bins[1 + i0 : len(lam) - 1] - bins[i0 : len(lam) - 2]
        out[0] = bins[i0] - lam[i0]
        out[-1] = lam[-1] - bins[-1]
        return out


def make_wavelength_grid(
    lambda_um, max_lambda_stars: float = -1.0, min_lambda_dust: float = -1.0
) -> WavelengthGrid:
    lam = np.asarray(lambda_um, dtype=np.float64)
    if np.any(np.diff(lam) < 0):
        raise ValueError("wavelength list must be ascending")
    lnum_tot = len(lam)
    lam_si = lam * 1e-6

    # stellar range: up to the last lambda <= max_lambda_stars
    # (read_lambda_list io_routines.f90:2333-2356)
    i_stars = (0, lnum_tot - 1)
    if max_lambda_stars > 0:
        above = np.where(lam > max_lambda_stars)[0]
        if len(above) > 0 and above[0] >= 1:
            i_stars = (0, int(above[0]) - 1)

    # dust range: from the last lambda <= min_lambda_dust (io:2358-2387)
    if min_lambda_dust <= 0:
        min_lambda_dust = 1.0
    i_dust = (0, lnum_tot - 1)
    below = np.where(lam <= min_lambda_dust)[0]
    if len(below) > 0:
        i_dust = (int(below[-1]), lnum_tot - 1)

    # log-centered bins (set_lambda_arr_si sed_routines.f90:974-978)
    if lnum_tot > 2:
        bins = 10.0 ** ((np.log10(lam_si[1:]) + np.log10(lam_si[:-1])) / 2.0)
        delta = np.empty(lnum_tot)
        delta[1:-1] = bins[1:] - bins[:-1]
        delta[0] = bins[0] - lam_si[0]
        delta[-1] = lam_si[-1] - bins[-1]
    else:
        delta = np.zeros(lnum_tot)

    lnum_stars = i_stars[1] - i_stars[0] + 1
    lnum_dust = lnum_tot - i_dust[0]
    no_dust_rt = lnum_dust < 10 or lnum_stars < 10  # io_routines.f90:2486-2489

    return WavelengthGrid(
        lambda_um=lam,
        lambda_si=lam_si,
        delta_lambda_bin=delta,
        i_lambda_stars=i_stars,
        i_lambda_dust=i_dust,
        no_dust_rt=no_dust_rt,
    )


def read_lambda_list(path: str) -> np.ndarray:
    """Read a wavelength list file (one value per line, microns)."""
    return np.loadtxt(path, dtype=np.float64).ravel()
