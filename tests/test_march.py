"""Physics validation of the batched ray-march engine against analytic
solutions.

The key check: a single point source of luminosity Lu in a uniform absorbing
medium gives a radiation field energy density

    U(r) = Lu * exp(-k r) / (4 pi r^2 c)

and in vacuum U(r) = Lu / (4 pi r^2 c).  The precalc/direct stages must
reproduce this per cell (up to the cell-average discretization of the
method), and energy must be conserved: the luminosity exiting the box plus
the absorbed luminosity equals the source luminosity.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dartray_tpu.grid import build_grid
from dartray_tpu.rt import engine as E
from dartray_tpu.rt import march as M


def uniform_grid(dens_value=0.0, base=(6, 2), max_lvl=2, modelsize=10.0):
    def dens_fn(centers, csize):
        return np.full(len(centers), dens_value), np.zeros(len(centers))

    def subdiv(centers, csize, level, dens, dens_stars):
        return np.zeros(len(centers), dtype=bool)

    return build_grid(dens_fn, subdiv, base=base, max_lvl=max_lvl, min_lvl=1,
                      modelsize=modelsize, max_ncell=200_000)


def make_physics(grid, L=1):
    return E.Physics(
        dens_ref=jnp.asarray(grid.dens_ref),
        kext_norm=jnp.ones(L),
        albedo=jnp.zeros(L),
        gsca=jnp.zeros(L),
        cs=1.0,  # c = 1 grid unit / time unit for clean analytics
        lambda_um=np.ones(L),
    )


@pytest.fixture(scope="module")
def vacuum_setup():
    grid = uniform_grid(0.0)
    phys = make_physics(grid)
    src = E.point_source_set(grid, np.array([[0.3, 0.2, 0.1]]), np.array([[1.0]]))
    return grid, phys, src


def test_vacuum_inverse_square(vacuum_setup):
    """U(r) = Lu/(4 pi r^2 c) in vacuum, bm_par controls accuracy."""
    grid, phys, src = vacuum_setup
    res = E.run_field_stage(
        grid, phys, src, mode=M.MODE_PRECALC, rad_lim=2.0,
        bm_par=10, bm_par_max=200,
    )
    u = np.asarray(res.u)[:, 0]
    cc = np.asarray(grid.ccoord)
    leaf = np.asarray(grid.leaf_mask())
    r = np.sqrt(np.sum((cc - src.pos[0]) ** 2, axis=1))
    sel = leaf & (r > 1.2)  # skip cells near the source (discretization)
    expect = 1.0 / (4 * np.pi * r[sel] ** 2)
    ratio = u[sel] / expect
    # the ray method approximates cell-averaged 1/r^2; median should be
    # within a few percent, individual cells within ~30%
    assert abs(np.median(ratio) - 1) < 0.03, np.median(ratio)
    assert np.quantile(np.abs(ratio - 1), 0.9) < 0.3


def test_vacuum_energy_conservation(vacuum_setup):
    """Sum over cells of U*c*V/<path> has no meaning, but total absorbed = 0
    and nothing is lost: the luminosity reaching the boundary equals Lu.
    Instead we check sum(U * V) = Lu * <path length> / c summed over rays:
    integral of U dV = Lu <L_box>/c where <L_box> is the mean chord from the
    source to the boundary.  We verify to 2% against a Monte Carlo chord
    estimate."""
    grid, phys, src = vacuum_setup
    res = E.run_field_stage(
        grid, phys, src, mode=M.MODE_PRECALC, rad_lim=2.0, bm_par=10, bm_par_max=200,
    )
    u = np.asarray(res.u)[:, 0]
    vol = np.asarray(grid.csize) ** 3
    total = np.sum(u * vol) * phys.cs  # = Lu * <chord>
    # MC estimate of the mean chord length from the source over the sphere
    rng = np.random.default_rng(0)
    nmc = 20000
    mu = rng.uniform(-1, 1, nmc)
    az = rng.uniform(0, 2 * np.pi, nmc)
    d = np.stack([np.sqrt(1 - mu**2) * np.cos(az), np.sqrt(1 - mu**2) * np.sin(az), mu], -1)
    p0 = src.pos[0]
    half = grid.modelsize / 2
    with np.errstate(divide="ignore"):
        tpos = np.where(d > 0, (half - p0) / d, np.where(d < 0, (-half - p0) / d, np.inf))
    chord = np.min(tpos, axis=1)
    expect = chord.mean()
    assert abs(total - expect) / expect < 0.02, (total, expect)


def test_uniform_absorption_profile():
    """With uniform extinction k, U(r) = Lu e^{-k r}/(4 pi r^2 c)."""
    k = 0.3
    grid = uniform_grid(k)
    phys = make_physics(grid)
    src = E.point_source_set(grid, np.array([[0.0, 0.0, 0.0]]), np.array([[1.0]]))
    res = E.run_field_stage(
        grid, phys, src, mode=M.MODE_PRECALC, rad_lim=2.0, bm_par=10, bm_par_max=200,
    )
    u = np.asarray(res.u)[:, 0]
    cc = np.asarray(grid.ccoord)
    leaf = np.asarray(grid.leaf_mask())
    r = np.sqrt(np.sum(cc**2, axis=1))
    sel = leaf & (r > 1.2)
    expect = np.exp(-k * r[sel]) / (4 * np.pi * r[sel] ** 2)
    ratio = u[sel] / expect
    assert abs(np.median(ratio) - 1) < 0.05, np.median(ratio)


def test_direct_equals_precalc_in_simple_case():
    """With no kill criterion (en_lim=0) and identical beam parameters, the
    direct stage deposits the same field as the precalc stage (rad_lim off)."""
    grid = uniform_grid(0.1)
    phys = make_physics(grid)
    src = E.point_source_set(grid, np.array([[0.5, -0.4, 0.3]]), np.array([[2.0]]))
    pre = E.run_field_stage(
        grid, phys, src, mode=M.MODE_PRECALC, rad_lim=2.0, bm_par=10, bm_par_max=200,
    )
    dire = E.run_field_stage(
        grid, phys, src, mode=M.MODE_DIRECT, u_fest=pre.u, en_lim=0.0,
        bm_par=10, bm_par_max=200,
    )
    np.testing.assert_allclose(np.asarray(dire.u), np.asarray(pre.u), rtol=1e-10)


def test_iobs_attenuation():
    """External-observer intensity of a cell source seen through a uniform
    medium is I0 * exp(-tau_los)."""
    k = 0.2
    grid = uniform_grid(k)
    # make one cell luminous
    ds = np.zeros((grid.n_cells, 1))
    cc = np.asarray(grid.ccoord)
    leaf = np.asarray(grid.leaf_mask())
    # pick the leaf nearest the center
    r = np.sum(cc**2, axis=1) + np.where(leaf, 0, 1e9)
    icell = int(np.argmin(r))
    ds[icell, 0] = 1.0
    src = E.cell_sources(grid, ds)
    phys = make_physics(grid)

    dir_out = np.array([[0.0, 0.0]])  # observer along +z
    i_obs, _ = E.run_iobs_stage(
        grid, phys, src, dir_out=dir_out, n_sid=grid.n_cells,
    )
    # expected: I0 = lum/(4 pi csize^2); attenuation over the z-path from
    # the emitting cell border to the box top. NOTE the reference convention:
    # inside the source cell, attenuation covers a full cell size (tau_own).
    csize = float(np.asarray(grid.csize)[icell])
    lum = float(src.lum[0, 0])
    I0 = lum / (4 * np.pi * csize**2)
    z0 = cc[icell, 2]
    # own-cell homogeneous factor: (1-e^-tau_c)/tau_c with tau_c = k*csize
    tau_c = k * csize
    own = (1 - np.exp(-tau_c)) / tau_c
    path = grid.modelsize / 2 - (z0 + csize / 2)
    expect = I0 * own * np.exp(-k * path)
    got = i_obs[icell, 0, 0]
    np.testing.assert_allclose(got, expect, rtol=1e-8)


def test_nav_table_matches_descend():
    """The face-neighbour navigation (octree.build_nav_table) must traverse
    the same cells as the per-level descend walk on an adaptive grid."""
    from dartray_tpu.grid.octree import build_nav_table

    def dens_fn(centers, csize):
        d = np.where(centers[:, 2] < 0, 0.5, 0.01)
        return d, np.zeros(len(centers))

    def subdiv(centers, csize, level, dens, dens_stars):
        return (np.abs(centers[:, 2]) < 1.0) & (level < 3)

    from dartray_tpu.grid import build_grid
    grid = build_grid(dens_fn, subdiv, base=(6, 2), max_lvl=3, min_lvl=1,
                      modelsize=10.0, max_ncell=200_000)
    phys = make_physics(grid)
    src = E.point_source_set(grid, np.array([[0.3, 0.2, 2.1]]), np.array([[1.0]]))
    nav = jnp.asarray(build_nav_table(grid))

    import dartray_tpu.rt.rays as R
    launch = R.fresh_launch(src.pos, src.cell, np.array([0]), src.lum, nside=8)
    batch, _, _ = R._to_batch(launch, 1, fdtype=jnp.float64)
    dens_ref = jnp.asarray(grid.dens_ref)
    kn = jnp.ones(1)
    al = jnp.zeros(1)
    z = jnp.zeros((grid.n_cells, 1))

    kw = dict(mode=M.MODE_PRECALC, point_source=True, rad_lim_dist=1e9,
              bm_par=1e9, bm_par_max=1e18, allow_block=False, cs=1.0,
              trace_steps=256)
    _, r_nav = M.march(grid, dens_ref, kn, al, z, z, batch, nav=nav, **kw)
    _, r_ref = M.march(grid, dens_ref, kn, al, z, z, batch, **kw)

    assert np.array_equal(np.asarray(r_nav.trace_count),
                          np.asarray(r_ref.trace_count))
    assert np.array_equal(np.asarray(r_nav.trace_cells),
                          np.asarray(r_ref.trace_cells))
    np.testing.assert_allclose(np.asarray(r_nav.trace_lengths),
                               np.asarray(r_ref.trace_lengths), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(r_nav.status),
                                  np.asarray(r_ref.status))
