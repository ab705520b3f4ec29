"""Differentiability through SCATTERED light (BASELINE.md gradient target;
process_scatt_rad rt_routines.f90:2638-2726, assign_src_lum :3043):

the chain  dens/albedo/gsca -> en_sca deposits -> scaspe -> scattered-light
launch toward an observer -> attenuated pixel intensity  is replayed as pure
tensor math over recorded ray geometry (rt.replay.replay_scaspe +
scattered_obs_lum + replay_iobs), checked against the march kernel at the
nominal parameters and FD-verified for jax.grad w.r.t. all three inputs."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dartray_tpu.models import trustI
from dartray_tpu.rt import engine as E
from dartray_tpu.rt import march as M
from dartray_tpu.rt import rays as R
from dartray_tpu.rt import replay as REP
from dartray_tpu.rt import scattering as SC


@pytest.fixture(scope="module")
def setup():
    grid = trustI.build_trustI_grid(
        tau_z=2.0, base=(10, 2), max_lvl=1, min_lvl=1, max_ncell=10_000
    )
    L = 2
    kext_norm = jnp.asarray([2.0, 1.0])
    albedo = jnp.asarray([0.5, 0.4])
    gsca = jnp.asarray([0.5, 0.3])
    dir_out = np.array([[0.3, 1.1]])
    scfg = SC.ScaspeConfig.make(1, np.asarray(gsca), dir_out)

    src = E.point_source_set(grid, trustI.STAR_POS[None, :], np.ones((1, L)))
    # single-call launch at nside 16 with the beam-density window disabled
    # (bm_par -> 0, bm_par_max -> inf): rays run source-to-exit in one march
    # so the whole scattered chain replays from one trace set (the ladder's
    # split points would otherwise cut the traces at the blocking distance)
    launch = R.fresh_launch(src.pos, src.cell, np.array([0]), src.lum,
                            nside=16)
    batch, _, _ = R._to_batch(launch, L, pad_to=3072, fdtype=jnp.float64)
    beam_i = 4 * np.pi / 3072.0

    dens0 = jnp.asarray(grid.dens_ref)
    u0 = jnp.zeros((grid.n_cells, L))
    S = 64
    kw = dict(
        mode=M.MODE_DIRECT, point_source=True, beam_i=beam_i, en_lim=0.0,
        bm_par=1e-30, bm_par_max=1e30, allow_block=False, cs=1.0,
        max_steps=S, trace_steps=S, collect_en_sca=True,
        scaspe_dirs=tuple(jnp.asarray(b.dirs) for b in scfg.buckets),
        scaspe_g=tuple(jnp.asarray(np.asarray(gsca)[b.lam_idx]) for b in scfg.buckets),
        scaspe_npix_hp=tuple(b.npix_hp for b in scfg.buckets),
        scaspe_lam_idx=scfg.lam_idx_tuple(),
        scaspe_accum=scfg.zeros(grid.n_cells, jnp.float64),
    )
    u, res, scaspe_march = M.march(
        grid, dens0, kext_norm, albedo, u0, u0, batch, **kw
    )
    assert not np.any(np.asarray(res.status) == M.ST_ACTIVE)

    rep_args = dict(
        init_lum=batch.lum,
        trace_cells=res.trace_cells, trace_lengths=res.trace_lengths,
        trace_count=res.trace_count, src_cell=batch.src_cell,
        csize_nc=jnp.asarray(grid.csize)[batch.src_cell],
        theta=batch.theta, phi=batch.phi,
        beam_i=jnp.full((batch.n,), beam_i),
        bucket_dirs=tuple(jnp.asarray(b.dirs) for b in scfg.buckets),
        bucket_lam_idx=tuple(jnp.asarray(b.lam_idx) for b in scfg.buckets),
    )
    static = dict(
        npix_hp=tuple(b.npix_hp for b in scfg.buckets),
        n_cells=grid.n_cells, point_source=True,
    )
    return (grid, L, kext_norm, albedo, gsca, dir_out, scfg, dens0,
            scaspe_march, rep_args, static)


def test_replay_scaspe_matches_march(setup):
    (grid, L, kext_norm, albedo, gsca, dir_out, scfg, dens0,
     scaspe_march, rep_args, static) = setup
    scaspe_rep = REP.replay_scaspe(
        dens0, kext_norm, albedo, gsca, **rep_args, **static
    )
    for a, b in zip(scaspe_rep, scaspe_march):
        b = np.asarray(b)
        np.testing.assert_allclose(
            np.asarray(a), b, rtol=1e-10, atol=float(b.max()) * 1e-13
        )


@pytest.fixture(scope="module")
def pixel_fn(setup):
    """Observer-pixel scattered intensity as a pure function of
    (dens, albedo, gsca), geometry frozen at the nominal parameters."""
    (grid, L, kext_norm, albedo, gsca, dir_out, scfg, dens0,
     scaspe_march, rep_args, static) = setup

    # scattering cells & their iobs traces toward observer 0 (geometry is
    # medium-independent)
    lumcell = scfg.lumcell(scaspe_march)
    sel = np.flatnonzero(np.asarray(grid.leaf_mask()) & (lumcell.sum(1) > 0))
    phys = E.Physics(
        dens_ref=dens0, kext_norm=kext_norm, albedo=albedo, gsca=gsca,
        cs=1.0, lambda_um=np.array([0.5, 1.0]),
    )
    sca_src = E.SourceSet(
        pos=np.asarray(grid.ccoord)[sel], cell=sel, sid=sel,
        lum=lumcell[sel], point=False,
    )
    th, ph = dir_out[0]
    traces, _ = E.trace_iobs_rays(
        grid, phys, sca_src, np.full(len(sel), th), np.full(len(sel), ph)
    )
    tr = {k: jnp.asarray(v) for k, v in traces.items()}
    sel_j = jnp.asarray(sel)
    npix_hp = static["npix_hp"]
    lam_idx = rep_args["bucket_lam_idx"]

    def pixel(dens, alb, g):
        scaspe = REP.replay_scaspe(
            dens, kext_norm, alb, g, **rep_args, **static
        )
        lum_sca = REP.scattered_obs_lum(scaspe, sel_j, 0, lam_idx, npix_hp, L)
        i_obs = REP.replay_iobs(
            dens, kext_norm, lum_sca, tr["cells"], tr["lengths"], tr["count"],
            tr["src_cell"], tr["csize_nc"], point_source=False,
            own_full_cell=True,
        )
        return jnp.sum(i_obs)  # the pixel: summed scattered intensity

    return pixel, (grid, sel, scfg, scaspe_march, phys, sca_src, dir_out)


def test_scattered_pixel_matches_engine(pixel_fn, setup):
    """At the nominal parameters, the replayed scattered pixel equals the
    engine's scattered-light iobs stage (first scattering iteration)."""
    (grid, L, kext_norm, albedo, gsca, dir_out, scfg, dens0,
     scaspe_march, *_) = setup
    pixel, (grid, sel, scfg, scaspe_march, phys, sca_src, dir_out) = pixel_fn

    def dir_fn(j, cells):
        return scfg.obs_lum(SC.ScaspeConfig.asarray(scaspe_march), cells, j)

    i_obs, _ = E.run_iobs_stage(
        grid, phys, sca_src, dir_out=dir_out, n_sid=grid.n_cells,
        src_lum_dir_fn=dir_fn,
    )
    want = i_obs[:, 0, :].sum()
    got = float(pixel(dens0, phys.albedo, phys.gsca))
    np.testing.assert_allclose(got, want, rtol=1e-10)
    assert got > 0


def test_scattered_pixel_fd_gradients(pixel_fn, setup):
    """FD check of jax.grad through the full scattered chain: density,
    albedo AND asymmetry-parameter gradients on a scattered-light pixel."""
    (grid, L, kext_norm, albedo, gsca, *_), = (setup[:6],)
    pixel, (grid, sel, *_rest) = pixel_fn
    dens0 = jnp.asarray(grid.dens_ref)

    g_d, g_a, g_g = jax.grad(pixel, argnums=(0, 1, 2))(dens0, albedo, gsca)
    g_d = np.asarray(g_d)
    g_a = np.asarray(g_a)
    g_g = np.asarray(g_g)
    assert np.isfinite(g_d).all() and np.isfinite(g_a).all() and np.isfinite(g_g).all()
    assert np.abs(g_a).max() > 0 and np.abs(g_g).max() > 0

    # FD vs autodiff: densest cell + both albedo/gsca components
    ic = int(np.asarray(jnp.argmax(jnp.abs(jnp.asarray(g_d)))))
    eps = 1e-6 * max(float(dens0[ic]), 1.0)
    fd = (
        float(pixel(dens0.at[ic].add(eps), albedo, gsca))
        - float(pixel(dens0.at[ic].add(-eps), albedo, gsca))
    ) / (2 * eps)
    np.testing.assert_allclose(g_d[ic], fd, rtol=2e-5)

    for k in range(L):
        eps = 1e-6
        fd_a = (
            float(pixel(dens0, albedo.at[k].add(eps), gsca))
            - float(pixel(dens0, albedo.at[k].add(-eps), gsca))
        ) / (2 * eps)
        np.testing.assert_allclose(g_a[k], fd_a, rtol=2e-5)
        fd_g = (
            float(pixel(dens0, albedo, gsca.at[k].add(eps)))
            - float(pixel(dens0, albedo, gsca.at[k].add(-eps)))
        ) / (2 * eps)
        np.testing.assert_allclose(g_g[k], fd_g, rtol=2e-5)
