"""Differentiability tests: trace replay equivalence and finite-difference
gradient checks (SURVEY.md §7 M4; BASELINE.md pixel-gradient target)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dartray_tpu.grid import build_grid
from dartray_tpu.models import trustI
from dartray_tpu.rt import engine as E
from dartray_tpu.rt import march as M
from dartray_tpu.rt import replay as REP
from dartray_tpu.rt import rays as R


@pytest.fixture(scope="module")
def slab_setup():
    grid = trustI.build_trustI_grid(
        tau_z=1.0, base=(10, 2), max_lvl=2, min_lvl=1, max_ncell=100_000
    )
    L = 2
    phys = E.Physics(
        dens_ref=jnp.asarray(grid.dens_ref),
        kext_norm=jnp.asarray([2.0, 1.0]),
        albedo=jnp.zeros(L),
        gsca=jnp.zeros(L),
        cs=1.0,
        lambda_um=np.array([0.5, 1.0]),
    )
    # a handful of emitting cells in the slab
    ds = np.zeros((grid.n_cells, L))
    cc = np.asarray(grid.ccoord)
    leaf = np.asarray(grid.leaf_mask())
    sel = np.flatnonzero(leaf & (cc[:, 2] > -4) & (cc[:, 2] < -3))[:6]
    ds[sel] = 1.0
    src = E.cell_sources(grid, ds)
    return grid, phys, src


def test_replay_iobs_matches_march(slab_setup):
    grid, phys, src = slab_setup
    theta = np.full(src.n, 0.4)
    phi = np.full(src.n, 1.2)
    traces, i_obs_march = E.trace_iobs_rays(grid, phys, src, theta, phi)
    i_obs_rep = REP.replay_iobs(
        jnp.asarray(grid.dens_ref), phys.kext_norm, jnp.asarray(src.lum),
        jnp.asarray(traces["cells"]), jnp.asarray(traces["lengths"]),
        jnp.asarray(traces["count"]), jnp.asarray(traces["src_cell"]),
        jnp.asarray(traces["csize_nc"]),
        point_source=False, own_full_cell=True,
    )
    np.testing.assert_allclose(np.asarray(i_obs_rep), i_obs_march, rtol=1e-12)


def test_replay_field_matches_march(slab_setup):
    """Precalc-mode march deposits == replayed deposits for the same traces."""
    grid, phys, src = slab_setup
    L = 2
    launch = R.fresh_launch(src.pos[:2], src.cell[:2], np.arange(2), src.lum[:2])
    n = len(launch["src_cell"])
    batch, _, _ = R._to_batch(launch, L, pad_to=R._bucket(n))
    u0 = jnp.zeros((grid.n_cells, L))
    beam_i = 4 * np.pi / 192
    u, res = M.march(
        grid, jnp.asarray(grid.dens_ref), phys.kext_norm, phys.albedo, u0, u0,
        batch, mode=M.MODE_PRECALC, point_source=False,
        beam_i=jnp.asarray(beam_i), rad_lim_dist=1e9,
        bm_par=0.0, bm_par_max=1e30, allow_block=False, cs=phys.cs,
        trace_steps=4 * grid.n_fine,
    )
    nr = batch.n
    u_rep = REP.replay_field(
        jnp.asarray(grid.dens_ref), phys.kext_norm,
        batch.lum,
        res.trace_cells, res.trace_lengths, res.trace_count,
        batch.src_cell, jnp.asarray(grid.csize)[batch.src_cell],
        jnp.asarray(grid.lvl), jnp.asarray(grid.csize_levels()),
        jnp.full((nr,), beam_i), phys.cs,
        n_cells=grid.n_cells, point_source=False,
    )
    np.testing.assert_allclose(np.asarray(u_rep), np.asarray(u), rtol=1e-10, atol=1e-300)


def test_iobs_gradient_vs_finite_difference(slab_setup):
    """d(observer intensity)/d(dens_ref): autodiff through the replay vs
    central finite differences of the full forward (geometry re-derived).
    For iobs rays the geometry never depends on the density, so the two
    must agree to FD truncation error."""
    grid, phys, src = slab_setup
    theta = np.full(src.n, 0.3)
    phi = np.full(src.n, 5.0)
    traces, _ = E.trace_iobs_rays(grid, phys, src, theta, phi)
    args = (
        jnp.asarray(traces["cells"]), jnp.asarray(traces["lengths"]),
        jnp.asarray(traces["count"]), jnp.asarray(traces["src_cell"]),
        jnp.asarray(traces["csize_nc"]),
    )

    def objective(dens_ref):
        i = REP.replay_iobs(
            dens_ref, phys.kext_norm, jnp.asarray(src.lum), *args,
            point_source=False, own_full_cell=True,
        )
        return jnp.sum(i)

    g = np.asarray(jax.grad(objective)(jnp.asarray(grid.dens_ref)))

    # FD through the *full* forward for a few touched cells
    touched = np.unique(np.asarray(traces["cells"])[np.asarray(traces["lengths"]) > 0])
    rng = np.random.default_rng(0)
    test_cells = rng.choice(touched, 5, replace=False)
    eps = 1e-5
    dens0 = np.asarray(grid.dens_ref)
    import dataclasses

    for c in test_cells:
        dp = dens0.copy(); dp[c] += eps
        dm = dens0.copy(); dm[c] -= eps
        vals = []
        for dd in (dp, dm):
            g2 = dataclasses.replace(grid, dens_ref=jnp.asarray(dd))
            _, i_obs = E.trace_iobs_rays(g2, phys, src, theta, phi)
            vals.append(i_obs.sum())
        fd = (vals[0] - vals[1]) / (2 * eps)
        np.testing.assert_allclose(g[c], fd, rtol=1e-5, err_msg=f"cell {c}")


def test_field_gradient_vs_finite_difference(slab_setup):
    """d(sum of U over a region)/d(dens_ref) via replay autodiff vs FD of
    the full march (en_lim=0, fixed beam structure -> frozen geometry)."""
    grid, phys, src = slab_setup
    L = 2
    launch = R.fresh_launch(src.pos[:1], src.cell[:1], np.arange(1), src.lum[:1])
    batch, _, _ = R._to_batch(launch, L, pad_to=R._bucket(len(launch["src_cell"])))
    beam_i = 4 * np.pi / 192
    kw = dict(
        mode=M.MODE_PRECALC, point_source=False, beam_i=jnp.asarray(beam_i),
        rad_lim_dist=1e9, bm_par=0.0, bm_par_max=1e30, allow_block=False,
        cs=phys.cs,
    )
    u0 = jnp.zeros((grid.n_cells, L))

    def full_forward(dens):
        u, _ = M.march(grid, dens, phys.kext_norm, phys.albedo, u0, u0, batch, **kw)
        return float(jnp.sum(u))

    _, res = M.march(
        grid, jnp.asarray(grid.dens_ref), phys.kext_norm, phys.albedo, u0, u0,
        batch, trace_steps=4 * grid.n_fine, **kw,
    )
    nr = batch.n

    def objective(dens_ref):
        u = REP.replay_field(
            dens_ref, phys.kext_norm, batch.lum,
            res.trace_cells, res.trace_lengths, res.trace_count,
            batch.src_cell, jnp.asarray(grid.csize)[batch.src_cell],
            jnp.asarray(grid.lvl), jnp.asarray(grid.csize_levels()),
            jnp.full((nr,), beam_i), phys.cs,
            n_cells=grid.n_cells, point_source=False,
        )
        return jnp.sum(u)

    g = np.asarray(jax.grad(objective)(jnp.asarray(grid.dens_ref)))
    touched = np.unique(
        np.asarray(res.trace_cells)[np.asarray(res.trace_lengths) > 0]
    )
    rng = np.random.default_rng(1)
    dens0 = np.asarray(grid.dens_ref)
    eps = 1e-6
    for c in rng.choice(touched, 4, replace=False):
        dp = dens0.copy(); dp[c] += eps
        dm = dens0.copy(); dm[c] -= eps
        fd = (full_forward(jnp.asarray(dp)) - full_forward(jnp.asarray(dm))) / (2 * eps)
        np.testing.assert_allclose(g[c], fd, rtol=2e-4, err_msg=f"cell {c}")


def test_source_luminosity_gradient(slab_setup):
    """d(i_obs)/d(source luminosity) is the transmission itself (linear)."""
    grid, phys, src = slab_setup
    theta = np.full(src.n, 2.0)
    phi = np.full(src.n, 0.7)
    traces, i_obs = E.trace_iobs_rays(grid, phys, src, theta, phi)
    args = (
        jnp.asarray(traces["cells"]), jnp.asarray(traces["lengths"]),
        jnp.asarray(traces["count"]), jnp.asarray(traces["src_cell"]),
        jnp.asarray(traces["csize_nc"]),
    )

    def f(lum):
        return jnp.sum(
            REP.replay_iobs(
                jnp.asarray(grid.dens_ref), phys.kext_norm, lum, *args,
                point_source=False, own_full_cell=True,
            )
        )

    g = np.asarray(jax.grad(f)(jnp.asarray(src.lum)))
    # linearity: f(lum) = sum(g * lum)
    np.testing.assert_allclose((g * src.lum).sum(), i_obs.sum(), rtol=1e-12)
