"""Sharded execution of the production pipeline (P1 source-data parallelism
+ P6 no-communications semantics, SURVEY.md §2.2): the field stages march
rays over the mesh 'rays' axis with per-device field replicas summed once
per stage (reduce_u_*_arr, io_routines.f90:3667-3986).

Equivalence oracle: sharded and single-device runs deposit the same
energies (order of summation differs, so allclose not allequal)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dartray_tpu.models import trustI
from dartray_tpu.rt import engine as E
from dartray_tpu.rt import march as M
from dartray_tpu.rt import scattering as SC
from dartray_tpu.parallel import mesh as PM


@pytest.fixture(scope="module")
def setup():
    grid = trustI.build_trustI_grid(
        tau_z=1.0, base=(10, 2), max_lvl=2, min_lvl=1, max_ncell=100_000
    )
    L = 4
    phys = E.Physics(
        dens_ref=jnp.asarray(grid.dens_ref),
        kext_norm=jnp.asarray(np.linspace(2.0, 0.5, L)),
        albedo=jnp.asarray(np.full(L, 0.4)),
        gsca=jnp.asarray(np.array([0.6, 0.4, 0.2, 0.0])),
        cs=1.0,
        lambda_um=np.array([0.3, 0.5, 1.0, 2.0]),
    )
    src = E.point_source_set(grid, trustI.STAR_POS[None, :], np.ones((1, L)))
    return grid, phys, src, L


def test_sharded_direct_stage_matches_single(setup, monkeypatch):
    grid, phys, src, L = setup
    mesh = PM.ray_mesh()
    assert mesh.shape["rays"] == 8

    kw = dict(
        mode=M.MODE_DIRECT, en_lim=1e-12, bm_par=3.0, bm_par_max=30.0,
        chunk=8,
    )
    r1 = E.run_field_stage(grid, phys, src, **kw)
    r8 = E.run_field_stage(grid, phys, src, mesh=mesh, **kw)
    u1 = np.asarray(r1.u)
    u8 = np.asarray(r8.u)
    assert r1.stats["rays"] == r8.stats["rays"]
    assert r1.stats["steps"] == r8.stats["steps"]
    np.testing.assert_allclose(u8, u1, rtol=1e-10, atol=u1.max() * 1e-13)
    np.testing.assert_allclose(r8.lum_lost, r1.lum_lost, rtol=1e-10)


def test_sharded_scaspe_stage_matches_single(setup):
    grid, phys, src, L = setup
    mesh = PM.ray_mesh()
    scfg = SC.ScaspeConfig.make(1, np.asarray(phys.gsca), None)

    kw = dict(
        mode=M.MODE_DIRECT, en_lim=1e-12, bm_par=3.0, bm_par_max=30.0,
        chunk=8, scaspe_cfg=scfg,
    )
    r1 = E.run_field_stage(grid, phys, src,
                           scaspe_init=scfg.zeros(grid.n_cells, jnp.float64),
                           **kw)
    r8 = E.run_field_stage(grid, phys, src, mesh=mesh,
                           scaspe_init=scfg.zeros(grid.n_cells, jnp.float64),
                           **kw)
    np.testing.assert_allclose(
        np.asarray(r8.u), np.asarray(r1.u), rtol=1e-10,
        atol=float(np.max(np.asarray(r1.u))) * 1e-13,
    )
    for a, b in zip(r8.scaspe, r1.scaspe):
        b = np.asarray(b)
        np.testing.assert_allclose(
            np.asarray(a), b, rtol=1e-9, atol=float(b.max()) * 1e-12
        )


def test_sharded_full_pipeline(setup):
    """pipeline.run_main end-to-end through the mesh: direct + scattering
    iterations, sharded vs single-device."""
    from dartray_tpu import pipeline as P
    from dartray_tpu.config import RTConfig
    from dartray_tpu.wavelength import make_wavelength_grid
    from dartray_tpu.dust import DustModel

    grid, phys, src, L = setup
    mesh = PM.ray_mesh()
    lam = np.array([0.3, 0.5, 1.0, 2.0])
    wl = make_wavelength_grid(lam, max_lambda_stars=30.0, min_lambda_dust=1.0)
    dust = DustModel(
        lambda_um=lam, kabs=np.full(L, 0.6), ksca=np.full(L, 0.4),
        kext=np.asarray(phys.kext_norm), gsca=np.asarray(phys.gsca),
        kext_ref=1.0,
    )
    cfg = RTConfig(
        accuracy=0.3, bm_par=3, bm_par_sca=2, bm_par_max=30,
        conv_en_lim=0.05, kp_sca_max=1, use_p_src=True,
    ).validate()
    kw = dict(
        dens_stars_arr=None, p_src_pos=trustI.STAR_POS[None, :],
        p_src_lum=np.ones((1, L)), dir_out=np.array([[0.0, 0.0]]),
        chunk=8,
    )
    res1 = P.run_main(grid, cfg, wl, dust, **kw)
    res8 = P.run_main(grid, cfg, wl, dust, mesh=mesh, **kw)
    assert res8.iterations == res1.iterations
    u1 = np.asarray(res1.u_final)
    np.testing.assert_allclose(
        np.asarray(res8.u_final), u1, rtol=1e-8, atol=u1.max() * 1e-11
    )
    i1 = res1.i_obs
    np.testing.assert_allclose(
        res8.i_obs, i1, rtol=1e-8, atol=np.max(i1) * 1e-11
    )


def test_wave_sharded_scaspe_matches_single(setup):
    """P3 lambda sharding (prepare_scaspe_splitting, rt_routines.f90:
    2855-2965): a (rays=2, wave=4) mesh shards each scaspe bucket's
    wavelength axis over 'wave'; results match the single-device run and
    the in-stage per-device scaspe shard holds ~1/4 of the columns."""
    grid, phys, src, L = setup
    mesh = PM.make_mesh(2, 4)
    scfg = SC.ScaspeConfig.make(1, np.asarray(phys.gsca), None)

    kw = dict(
        mode=M.MODE_DIRECT, en_lim=1e-12, bm_par=3.0, bm_par_max=30.0,
        chunk=8, scaspe_cfg=scfg,
    )
    r1 = E.run_field_stage(grid, phys, src,
                           scaspe_init=scfg.zeros(grid.n_cells, jnp.float64),
                           **kw)
    rw = E.run_field_stage(grid, phys, src, mesh=mesh,
                           scaspe_init=scfg.zeros(grid.n_cells, jnp.float64),
                           **kw)
    np.testing.assert_allclose(
        np.asarray(rw.u), np.asarray(r1.u), rtol=1e-10,
        atol=float(np.max(np.asarray(r1.u))) * 1e-13,
    )
    for a, b in zip(rw.scaspe, r1.scaspe):
        b = np.asarray(b)
        assert np.asarray(a).shape == b.shape  # padding sliced off
        np.testing.assert_allclose(
            np.asarray(a), b, rtol=1e-9, atol=float(b.max()) * 1e-12
        )


def test_wave_sharded_scattering_matches_single(setup):
    """Full scattering iterations with the lambda-sharded scaspe."""
    grid, phys, src, L = setup
    mesh = PM.make_mesh(2, 4)
    scfg = SC.ScaspeConfig.make(1, np.asarray(phys.gsca), None)
    kw = dict(
        mode=M.MODE_DIRECT, en_lim=1e-12, bm_par=3.0, bm_par_max=30.0,
        chunk=8, scaspe_cfg=scfg,
    )
    r1 = E.run_field_stage(grid, phys, src,
                           scaspe_init=scfg.zeros(grid.n_cells, jnp.float64),
                           **kw)
    skw = dict(conv_en_lim=0.05, en_lim=1e-12, bm_par_sca=2.0,
               bm_par_max=30.0, max_iterations=2, chunk=8)
    s1 = SC.run_scattering(grid, phys, scfg, r1.scaspe, r1.u, **skw)
    sw = SC.run_scattering(grid, phys, scfg, r1.scaspe, r1.u, mesh=mesh,
                           **skw)
    assert sw.iterations == s1.iterations
    u1 = np.asarray(s1.u_final)
    np.testing.assert_allclose(
        np.asarray(sw.u_final), u1, rtol=1e-8, atol=u1.max() * 1e-11
    )
    for a, b in zip(sw.scaspe_tot, s1.scaspe_tot):
        b = np.asarray(b)
        np.testing.assert_allclose(
            np.asarray(a), b, rtol=1e-8, atol=float(b.max()) * 1e-11
        )
