"""MAGTAR dust geometries: shell / cavity / wind around a point source.

Rebuild of user_routines_magtar.f90 (Natale et al. 2017, ApJ 837, 9):
ellipsoidal dust shells, cavities and r^2 / r^-2 wind profiles, with
blackbody point sources defined by (Teff, Lbol) in file_param_src.
"""
from __future__ import annotations

import numpy as np

from ..constants import CSPEED, SIGMA_SB
from ..grid.builder import build_grid

LSUN = 3.8268000e26  # W (user_routines_magtar.f90:380)


def _subsample(centers, csize, fn, nstep: int = 10):
    """Cell-average by a 9^3 subgrid (av_rho_dust_*, magtar.f90:159-317:
    loops run over nstep-1 points with spacing cellsize/(nstep-1))."""
    n = nstep - 1
    offs = (np.arange(n) + 0.5) / n  # fractions of the cell
    xx, yy, zz = np.meshgrid(offs, offs, offs, indexing="ij")
    frac = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], -1)  # (n^3, 3)
    lo = centers - csize[:, None] / 2.0
    pts = lo[:, None, :] + frac[None, :, :] * csize[:, None, None]  # (M, n^3, 3)
    vals = fn(pts.reshape(-1, 3)).reshape(len(centers), -1)
    return vals.mean(axis=1)


def make_dens_fn(dust_geometry: str, tau_z: float, ax: float, by: float, cz: float,
                 elrad_width: float = 0.0):
    """Extinction-coefficient field [1/pc]; ndust = tau_z (optical depth per
    pc at lambda_ref; set_mag_model_density magtar.f90:83-104)."""
    ndust = tau_z

    def rho(p):
        rad = np.sqrt((p[:, 0] / ax) ** 2 + (p[:, 1] / by) ** 2 + (p[:, 2] / cz) ** 2)
        if dust_geometry == "shell":
            return np.where(np.abs(rad - 1.0) < elrad_width, ndust, 0.0)
        if dust_geometry == "cavity":
            return np.where(rad > 1.0, ndust, 0.0)
        if dust_geometry == "wind":
            return np.where(rad <= 1.0, ndust * rad**2, ndust * rad**-2)
        raise ValueError(f"unknown dust_geometry {dust_geometry!r}")

    def dens_fn(centers, csize):
        d = _subsample(np.asarray(centers), np.asarray(csize), rho)
        return d, np.zeros_like(d)

    return dens_fn


def make_subdivision_fn(dust_geometry: str, max_dtau: float, max_lvl: int,
                        ax=1.0, by=1.0, cz=1.0, R_subd_lim: float = 1e30):
    """Subdivision criteria (user_routines_magtar.f90:33-36)."""

    def subdivision_fn(centers, csize, level, dens, dens_stars):
        tau = dens * csize
        if dust_geometry == "shell":
            return (level < max_lvl) & (tau > max_dtau)
        # cavity/wind: only inside R_subd_lim
        rad = np.sqrt(
            (centers[:, 0] / ax) ** 2 + (centers[:, 1] / by) ** 2 + (centers[:, 2] / cz) ** 2
        )
        return (level < max_lvl) & (tau > max_dtau) & (rad < R_subd_lim)

    return subdivision_fn


def build_magtar_grid(
    dust_geometry="shell", tau_z=0.48, ax=1.09, by=2.18, cz=2.18,
    elrad_width=0.10, base=(10, 3), max_lvl=3, min_lvl=1, max_dtau=4.8e-2,
    modelsize=10.0, max_ncell=1_500_000, R_subd_lim=1e30,
):
    """Create a MAGTAR grid (input_grid_shell.in defaults)."""
    return build_grid(
        make_dens_fn(dust_geometry, tau_z, ax, by, cz, elrad_width),
        make_subdivision_fn(dust_geometry, max_dtau, max_lvl, ax, by, cz, R_subd_lim),
        base=base, max_lvl=max_lvl, min_lvl=min_lvl,
        modelsize=modelsize, max_ncell=max_ncell,
    )


def read_param_src(path: str):
    """(Teff, Lbol[Lsun]) table, one row per point source
    (read_assign_param_src, magtar.f90:374-425)."""
    data = np.atleast_2d(np.loadtxt(path, skiprows=1))
    return data[:, 0], data[:, 1]


def source_luminosity(lambda_um, teff, lbol_lsun):
    """Blackbody point-source luminosity [erg/s/Hz] at the given wavelengths
    (magtar.f90:403-421)."""
    from ..dust_emission import bplanck

    lam_si = np.asarray(lambda_um) * 1e-6
    teff = np.atleast_1d(np.asarray(teff, dtype=np.float64))
    lbol = np.atleast_1d(np.asarray(lbol_lsun, dtype=np.float64)) * LSUN
    # W/m per source per lambda
    B = np.asarray(bplanck(teff[:, None], lam_si[None, :]))
    lstar = B * np.pi * (lbol / (SIGMA_SB * teff**4))[:, None]
    return lstar * 1e7 * (lam_si**2)[None, :] / CSPEED  # erg/s/Hz
