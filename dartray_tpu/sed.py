"""Integrated SED synthesis from observer intensities.

Rebuild of calc_sed / sum_i_obs (sed_routines.f90:90-246): unit conversion
of i_obs to Jy/sr and the sum over cells and point sources weighted by
(csize/dist_obs)^2.
"""
from __future__ import annotations

import numpy as np

from .constants import PARSEC, CSPEED


def i_obs_to_jy_sr(i_obs, units_i_obs: str, lambda_si=None):
    """Convert i_obs to Jy/sr (sum_i_obs, sed_routines.f90:215-236)."""
    i = np.asarray(i_obs)
    if units_i_obs == "erg/s/Hz/pc^2/sr":
        return i * 1e-7 * 1e26 / PARSEC**2
    if units_i_obs == "W/Hz/pc^2/sr":
        return i * 1e26 / PARSEC**2
    if units_i_obs == "W/m/pc^2/sr":
        lam2 = np.asarray(lambda_si) ** 2
        return i * lam2 / CSPEED * 1e26 / PARSEC**2
    raise ValueError(f"unknown units {units_i_obs!r}")


def calc_sed(
    grid,
    i_obs,  # (nsid, ndir, L) in native units
    dist_obs: float,
    units_i_obs: str,
    src_host=None,  # (nps,) host cells of the point sources
    lambda_si=None,
):
    """Total SED per direction, in Jy: sum of i_obs*(csize/dist)^2
    (sum_i_obs, sed_routines.f90:238-244)."""
    i = i_obs_to_jy_sr(i_obs, units_i_obs, lambda_si)
    csize = np.asarray(grid.csize)
    n = grid.n_cells
    w_cells = (csize / dist_obs) ** 2  # (ncell,)
    sed = np.einsum("ndl,n->dl", i[:n], w_cells)
    if i.shape[0] > n and src_host is not None:
        w_src = (csize[np.asarray(src_host)] / dist_obs) ** 2
        sed += np.einsum("ndl,n->dl", i[n:], w_src)
    return sed  # (ndir, L) [Jy]
