"""End-to-end TRUST I slab benchmark, direct light only.

The minimum end-to-end slice of SURVEY.md §7 M2: adaptive grid + point
source + wavelength-dependent dust + precalc/direct/i_obs + SED + maps,
checked against the analytic solution for the unscattered component:

    F_nu(down) = L_nu * exp(-tau_z(lambda)) / (4 pi d^2)
    F_nu(up)   = L_nu / (4 pi d^2)

with tau_z(lambda) = tau_z(1um) * kext(lambda)/kext(1um).
"""
import os

import numpy as np
import pytest

from dartray_tpu.config import RTConfig
from dartray_tpu.constants import PARSEC
from dartray_tpu.wavelength import make_wavelength_grid
from dartray_tpu import dust as D
from dartray_tpu.models import trustI
from dartray_tpu import pipeline as P

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
AV_OPAC = os.path.join(DATA, "DUST_OPACITY", "TRUST", "ZDA_BARE_GR_S_Effective.dat")
BB_TABLE = os.path.join(DATA, "TRUSTI_GRIDS", "BB_T10000_L100000.dat")

TAU_Z = 0.5  # stronger slab than the tau=0.01 benchmark so attenuation is testable
LAM = [0.4, 1.0, 10.0, 80.0]


@pytest.fixture(scope="module")
def setup():
    grid = trustI.build_trustI_grid(
        tau_z=TAU_Z, base=(10, 2), max_lvl=3, min_lvl=1, max_ncell=500_000
    )
    wl = make_wavelength_grid(np.asarray(LAM), max_lambda_stars=80.0)
    dustm = D.load_effective_dust_model(AV_OPAC, wl.lambda_um, lambda_ref=1.0)
    tl, tf = trustI.read_planck_table(BB_TABLE)
    lum = trustI.source_luminosity(wl.lambda_um, tl, tf)[None, :]
    cfg = RTConfig(
        accuracy=0.2, bm_par=10, bm_par_sca=5, bm_par_max=200, rad_lim=0.1,
        dist_obs=1e4, npixel_maps=100, map_size_factor=1.5,
        use_p_src=True, use_dir_out=True, print_maps=True, print_sed=True,
    ).validate()
    dir_out = np.array([[0.0, 0.0], [np.pi, 0.0]])  # up (+z), down (-z)
    res = P.run_direct_light(
        grid, cfg, wl, dustm,
        p_src_pos=trustI.STAR_POS[None, :], p_src_lum=lum,
        dir_out=dir_out,
    )
    return grid, wl, dustm, lum, cfg, res


def test_sed_up_unattenuated(setup):
    grid, wl, dustm, lum, cfg, res = setup
    # observer at theta=0 sees the source with no dust in between
    d_pc = cfg.dist_obs
    expect_jy = lum[0] / (4 * np.pi * (d_pc * PARSEC * 100) ** 2) * 1e23  # erg/s/Hz/cm^2 -> Jy
    got = res.sed_direct[0]
    np.testing.assert_allclose(got, expect_jy, rtol=1e-6)


def test_sed_down_attenuated(setup):
    grid, wl, dustm, lum, cfg, res = setup
    d_pc = cfg.dist_obs
    tau_l = TAU_Z * dustm.kext / dustm.kext_ref
    expect_jy = (
        lum[0] * np.exp(-tau_l) / (4 * np.pi * (d_pc * PARSEC * 100) ** 2) * 1e23
    )
    got = res.sed_direct[1]
    np.testing.assert_allclose(got, expect_jy, rtol=1e-6)


def test_u_field_above_slab(setup):
    """U in the dust-free region between source and slab follows 1/r^2."""
    grid, wl, dustm, lum, cfg, res = setup
    cc = np.asarray(grid.ccoord)
    leaf = np.asarray(grid.leaf_mask())
    r = np.sqrt(np.sum((cc - trustI.STAR_POS) ** 2, axis=1))
    # region above the slab, away from source
    sel = leaf & (cc[:, 2] > -1.5) & (r > 2.0)
    i1 = 1  # lambda = 1um
    cs = 2.99792458e8 / PARSEC
    expect = lum[0, i1] / (4 * np.pi * r[sel] ** 2 * cs)
    ratio = res.u_final[sel, i1] / expect
    assert abs(np.median(ratio) - 1) < 0.05, np.median(ratio)


def test_u_field_inside_slab_attenuated(setup):
    """U inside the slab is attenuated by the dust column from the slab top
    (z = -2) down to the cell, along the source direction."""
    grid, wl, dustm, lum, cfg, res = setup
    cc = np.asarray(grid.ccoord)
    leaf = np.asarray(grid.leaf_mask())
    sel = leaf & (np.abs(cc[:, 0]) < 0.6) & (np.abs(cc[:, 1]) < 0.6) & (cc[:, 2] < -2.6)
    assert sel.sum() > 0
    i1 = 1
    r = np.sqrt(np.sum((cc[sel] - trustI.STAR_POS) ** 2, axis=1))
    cs = 2.99792458e8 / PARSEC
    k = TAU_Z / trustI.LZ_SLAB  # extinction coefficient at 1um [1/pc]
    cosang = (trustI.STAR_POS[2] - cc[sel, 2]) / r
    depth = (-2.0) - cc[sel, 2]  # dust column depth below slab top
    expect = (
        lum[0, i1] * np.exp(-k * depth / cosang) / (4 * np.pi * r**2 * cs)
    )
    ratio = res.u_final[sel, i1] / expect
    assert abs(np.median(ratio) - 1) < 0.1, np.median(ratio)


def test_map_flux_matches_sed(setup):
    """Total flux in the down map equals the SED (direct splat for the point
    source; slab invisible in direct light)."""
    grid, wl, dustm, lum, cfg, res = setup
    # map index 1 = down direction; MJy/sr * sr/px -> Jy
    px_pc = cfg.map_size_factor * grid.modelsize / cfg.npixel_maps
    omega_px = (px_pc / cfg.dist_obs) ** 2
    for il in range(len(LAM)):
        flux = res.maps_direct[1, :, :, il].sum() * 1e6 * omega_px
        np.testing.assert_allclose(flux, res.sed_direct[1][il], rtol=1e-6)


def test_lum_lost_small(setup):
    grid, wl, dustm, lum, cfg, res = setup
    # lost-luminosity fraction must stay below the 1% warning threshold
    # (smooth_grid_routines.f90:35-36)
    frac = res.lum_lost / lum[0]
    assert np.all(frac < 0.01), frac
