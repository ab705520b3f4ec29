"""TRUST I slab benchmark model.

Uniform dust slab z in [-5, -2] pc inside a 10 pc box, illuminated by a
single T = 10^4 K blackbody point source of 100,000 Lsun at (0, 0, 4) pc
(user_routines_trustI.f90:15-19).  This is the standard RT benchmark
(Gordon et al.) and the headline perf workload (BASELINE.md).
"""
from __future__ import annotations

import numpy as np

from ..constants import PARSEC
from ..grid.builder import build_grid

# slab geometry [pc] (user_routines_trustI.f90:15-19)
Z0_SLAB, Z1_SLAB = -5.0, -2.0
X0_SLAB, X1_SLAB = -5.0, 5.0
Y0_SLAB, Y1_SLAB = -5.0, 5.0
LZ_SLAB = 3.0
STAR_POS = np.array([0.0, 0.0, 4.0])


def slab_extinction(tau_z: float, kext_ref_m2: float):
    """Extinction coefficient [1/pc] inside the slab for vertical optical
    depth tau_z at the reference wavelength (set_slab_density,
    user_routines_trustI.f90:78-89)."""
    # kext_ref in m^2/grain -> pc^2; ndust = tau/(kext*Lz) [pc^-3]; the grid
    # stores ndust*kext = extinction coefficient [pc^-1]
    return tau_z / LZ_SLAB


def make_dens_fn(tau_z: float):
    """Cell-averaged extinction coefficient for the slab.

    Cells are axis-aligned, the slab is axis-aligned: the exact volume
    fraction is a product of 1D overlaps (the reference samples with
    nstep=1, av_rho_dust_slab user_routines_trustI.f90:167-221 — i.e. it
    uses the *center* value; we keep center sampling for parity).
    """
    ndust = slab_extinction(tau_z, 0.0)

    def dens_fn(centers, csize):
        x, y, z = centers[:, 0], centers[:, 1], centers[:, 2]
        inside = (
            (z >= Z0_SLAB) & (z <= Z1_SLAB)
            & (x >= X0_SLAB) & (x <= X1_SLAB)
            & (y >= Y0_SLAB) & (y <= Y1_SLAB)
        )
        dens = np.where(inside, ndust, 0.0)
        dens_stars = np.zeros_like(dens)
        return dens, dens_stars

    return dens_fn


def make_subdivision_fn(max_dtau: float, min_lvl_in: int, max_lvl: int):
    """'standard' subdivision criterion (create_adap_grid_trustI.f90:86-94):
    subdivide while level < max_lvl AND (cell top face on the slab top
    OR (tau > max_dtau AND level < min_lvl_in))."""

    def subdivision_fn(centers, csize, level, dens, dens_stars):
        z = centers[:, 2]
        tau = dens * csize
        top_on_slab = np.abs(z + csize / 2.0 - Z1_SLAB) / abs(Z1_SLAB) < 1e-5
        return (level < max_lvl) & (
            top_on_slab | ((tau > max_dtau) & (level < min_lvl_in))
        )

    return subdivision_fn


def build_trustI_grid(
    tau_z: float = 0.01,
    base=(10, 2),
    max_lvl: int = 4,
    min_lvl: int = 1,
    min_lvl_in: int = 10,
    max_dtau: float = 1e-4,
    modelsize: float = 10.0,
    max_ncell: int = 4_000_000,
):
    """Create the TRUST I adaptive grid (input_grid_trustI_tau0.01_LD.in)."""
    return build_grid(
        make_dens_fn(tau_z),
        make_subdivision_fn(max_dtau, min_lvl_in, max_lvl),
        base=base,
        max_lvl=max_lvl,
        min_lvl=min_lvl,
        modelsize=modelsize,
        max_ncell=max_ncell,
    )


def read_planck_table(path: str):
    """Load the BB_T10000_L100000.dat source SED table.

    Returns (lambda_um, lum_erg_s_hz); log-log interpolation to arbitrary
    wavelengths is done by ``source_luminosity``
    (read_planck_table_trustI, user_routines_trustI.f90:91-165).
    """
    data = np.loadtxt(path, skiprows=6)
    return data[:, 0], data[:, 1]


def source_luminosity(lambda_um, table_lambda, table_lum):
    """Point-source luminosity [erg/s/Hz] at given wavelengths, log-log
    linearly interpolated from the blackbody table."""
    lam = np.atleast_1d(np.asarray(lambda_um, dtype=np.float64))
    if lam.min() < table_lambda[0] or lam.max() > table_lambda[-1]:
        raise ValueError("lambda outside tabulated blackbody range")
    return 10.0 ** np.interp(
        np.log10(lam), np.log10(table_lambda), np.log10(table_lum)
    )
