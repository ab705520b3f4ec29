"""Octree grid tests: construction, navigation, grading, HDF5 round-trip."""
import numpy as np
import pytest

from dartray_tpu.grid import (
    Grid,
    build_grid,
    point_to_cell,
    pos_to_fine,
    fine_to_cell,
    read_grid,
    write_grid,
)
from dartray_tpu.models import trustI


@pytest.fixture(scope="module")
def small_grid():
    """A small TRUST-like slab grid: base=(10,2), max_lvl=3 (slab top at
    z=-2 falls on level-1 cell boundaries, as in the reference setup)."""
    return build_grid(
        trustI.make_dens_fn(tau_z=0.1),
        trustI.make_subdivision_fn(max_dtau=1e-6, min_lvl_in=10, max_lvl=3),
        base=(10, 2),
        max_lvl=3,
        min_lvl=1,
        modelsize=10.0,
        max_ncell=100_000,
    )


def test_grid_structure(small_grid):
    g = small_grid
    cchild = np.asarray(g.cchild)
    lvl = np.asarray(g.lvl)
    csize = np.asarray(g.csize)
    assert cchild[0] == 1 and lvl[0] == 0
    # levels consistent with sizes
    expect = {0: 10.0, 1: 1.0, 2: 0.5, 3: 0.25}
    for l, s in expect.items():
        sel = lvl == l
        if sel.any():
            np.testing.assert_allclose(csize[sel], s)
    # children contiguous and consistent
    nonleaf = np.where(cchild != -1)[0]
    for c in nonleaf[:50]:
        b = g.base[0] if lvl[c] == 0 else g.base[1]
        kids = np.arange(cchild[c], cchild[c] + b**3)
        assert np.all(lvl[kids] == lvl[c] + 1)


def test_leaves_tile_volume(small_grid):
    g = small_grid
    leaves = np.asarray(g.leaf_mask())
    vol = np.sum(np.asarray(g.csize)[leaves] ** 3)
    np.testing.assert_allclose(vol, g.modelsize**3, rtol=1e-12)


def test_point_to_cell_centers(small_grid):
    """Every leaf center maps back to that leaf."""
    g = small_grid
    leaves = np.where(np.asarray(g.leaf_mask()))[0]
    cell, clvl = point_to_cell(g, np.asarray(g.ccoord)[leaves])
    np.testing.assert_array_equal(np.asarray(cell), leaves)
    np.testing.assert_array_equal(np.asarray(clvl), np.asarray(g.lvl)[leaves])


def test_point_to_cell_random(small_grid):
    g = small_grid
    rng = np.random.default_rng(1)
    pos = rng.uniform(-4.999, 4.999, size=(2000, 3))
    cell, clvl = point_to_cell(g, pos)
    cell = np.asarray(cell)
    # containment: |pos - center| <= csize/2
    cc = np.asarray(g.ccoord)[cell]
    cs = np.asarray(g.csize)[cell]
    assert np.all(np.abs(pos - cc) <= cs[:, None] / 2 * (1 + 1e-12))
    # the found cells are leaves
    assert np.all(np.asarray(g.cchild)[cell] == -1)


def test_grading(small_grid):
    """Face-adjacent leaves differ by at most one level."""
    g = small_grid
    lvl = np.asarray(g.lvl)
    csize = np.asarray(g.csize)
    ccoord = np.asarray(g.ccoord)
    leaves = np.where(np.asarray(g.leaf_mask()))[0]
    for axis in range(3):
        for s in (-1, 1):
            p = ccoord[leaves].copy()
            p[:, axis] += s * csize[leaves] * 0.5001
            inside = np.all(np.abs(p) < g.modelsize / 2, axis=1)
            cell, clvl = point_to_cell(g, p[inside])
            jump = np.asarray(clvl) - lvl[leaves[inside]]
            assert jump.max() <= 1, f"level jump {jump.max()} on axis {axis}"


def test_hdf5_roundtrip(tmp_path, small_grid):
    g = small_grid
    path = str(tmp_path / "grid.h5")
    write_grid(path, g)
    g2 = read_grid(path)
    np.testing.assert_array_equal(np.asarray(g2.cchild), np.asarray(g.cchild))
    np.testing.assert_array_equal(np.asarray(g2.lvl), np.asarray(g.lvl))
    np.testing.assert_allclose(np.asarray(g2.ccoord), np.asarray(g.ccoord))
    np.testing.assert_allclose(np.asarray(g2.dens_ref), np.asarray(g.dens_ref))
    assert g2.base == g.base and g2.max_lvl == g.max_lvl
    assert g2.modelsize == g.modelsize


def test_cindex_encoding(small_grid):
    """cindex bitcodes decode back to each cell via the reference's
    cindex_to_ccindd arithmetic (smooth_grid_routines.f90:793-813)."""
    from dartray_tpu.grid.octree import compute_cindex

    g = small_grid
    cchild = np.asarray(g.cchild)
    lvl = np.asarray(g.lvl)
    ccoord = np.asarray(g.ccoord)
    cindex = compute_cindex(cchild, lvl, ccoord, g.base, g.max_lvl, g.modelsize)

    b1, b2 = g.base
    # basediv per reference set_base
    bd = []
    for bb in (b1, b2):
        j = 0
        while not (bb**3 < (1 << j)):
            j += 1
        bd.append(1 << j)
    # decode each cell's digits and walk the tree
    for c in np.random.default_rng(0).choice(g.n_cells - 1, 200) + 1:
        digits = []
        code = cindex[c]
        for i in range(1, lvl[c] + 1):
            if i == 1:
                j = (code // (bd[0] ** 0)) & (bd[0] - 1)
                bb = b1
            else:
                j = (code // (bd[0] * bd[1] ** (i - 2))) & (bd[1] - 1)
                bb = b2
            j = j - 1
            digits.append((j % bb, (j // bb) % bb, (j // bb**2) % bb))
        # walk
        node_child = cchild[0]
        cell = 0
        for i, (dx, dy, dz) in enumerate(digits):
            bb = b1 if i == 0 else b2
            cell = node_child + (dz * bb + dy) * bb + dx
            node_child = cchild[cell]
        assert cell == c


def test_slab_density(small_grid):
    """Leaf densities match the analytic slab and total tau_z is correct."""
    g = small_grid
    leaves = np.asarray(g.leaf_mask())
    cc = np.asarray(g.ccoord)
    dens = np.asarray(g.dens_ref)
    # vertical ray through x=y=0.1: total optical depth = tau_z
    z = np.linspace(-4.999, 4.999, 5000)
    pos = np.stack([np.full_like(z, 0.1), np.full_like(z, 0.1), z], axis=-1)
    cell, _ = point_to_cell(g, pos)
    dz = z[1] - z[0]
    tau = np.sum(dens[np.asarray(cell)] * dz)
    np.testing.assert_allclose(tau, 0.1, rtol=0.01)
