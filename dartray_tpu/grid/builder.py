"""Adaptive grid construction.

Host-side (numpy) rebuild of the reference's grid-creation programs
(create_adap_grid_*.f90): starting from the root cell, repeatedly subdivide
cells that fail a model-specific predicate, while keeping the grid *graded*
(neighbouring leaves never differ by more than one subdivision level —
subdivide_neighbour_cells / check_level_jump,
create_adap_grid_trustI.f90:280-308, smooth_grid_routines.f90:774-787).

Differences from the reference (deliberate — this is a rebuild, not a port):

* density/emissivity callbacks are *vectorized* over cell batches, so model
  evaluation is array code rather than a per-cell function call;
* grading is enforced by an iterate-to-fixpoint sweep per level instead of
  interleaved recursive neighbour subdivision; the resulting set of leaves
  satisfies the same invariants (predicate satisfied or max level reached;
  <= 1 level jump across faces) although cell *ordering* in the flat arrays
  can differ from the Fortran program's.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

from .octree import Grid


@dataclasses.dataclass
class _Builder:
    base: tuple
    max_lvl: int
    modelsize: float
    max_ncell: int

    def __post_init__(self):
        n0 = 1
        self.cchild = [1]
        self.lvl = [0]
        self.ccoord = [(0.0, 0.0, 0.0)]
        self.csize = [self.modelsize]
        self.dens = [0.0]
        self.dens_stars = [0.0]
        self.parent = [-1]

    def n(self):
        return len(self.cchild)

    def cellsize(self, level):
        if level == 0:
            return self.modelsize
        return self.modelsize / (self.base[0] * self.base[1] ** (level - 1))

    def subdivide(self, ids, dens_fn):
        """Subdivide the given cells (all must be leaves); returns child ids."""
        ids = np.asarray(ids, dtype=np.int64)
        if ids.size == 0:
            return np.empty(0, dtype=np.int64)
        all_children = []
        for c in ids:
            level = self.lvl[c]
            b = self.base[0] if level == 0 else self.base[1]
            child_size = self.cellsize(level + 1)
            if self.n() + b**3 > self.max_ncell:
                raise RuntimeError("too many cells; raise max_ncell")
            self.cchild[c] = self.n()
            # child ordering: ix fastest, then iy, iz
            # (subdivide_cell, create_adap_grid_trustI.f90:335-393)
            off = (np.arange(b) - b // 2 + (0.5 if b % 2 == 0 else 0.0)) * child_size
            zz, yy, xx = np.meshgrid(off, off, off, indexing="ij")
            centers = np.stack(
                [xx.ravel(), yy.ravel(), zz.ravel()], axis=-1
            ) + np.asarray(self.ccoord[c])
            first = self.n()
            for i in range(b**3):
                self.cchild.append(-1)
                self.lvl.append(level + 1)
                self.ccoord.append(tuple(centers[i]))
                self.csize.append(child_size)
                self.dens.append(0.0)
                self.dens_stars.append(0.0)
                self.parent.append(int(c))
            all_children.append(np.arange(first, first + b**3))
        children = np.concatenate(all_children)
        # vectorized model evaluation for the new cells
        cc = np.asarray([self.ccoord[i] for i in children])
        cs = np.asarray([self.csize[i] for i in children])
        d, ds = dens_fn(cc, cs)
        for j, i in enumerate(children):
            self.dens[i] = float(d[j])
            self.dens_stars[i] = float(ds[j])
        return children


def build_grid(
    dens_fn: Callable,
    subdivision_fn: Callable,
    base=(10, 2),
    max_lvl: int = 4,
    min_lvl: int = 1,
    modelsize: float = 10.0,
    max_ncell: int = 4_000_000,
    dtype=np.float64,
) -> Grid:
    """Create an adaptive grid.

    dens_fn(centers (M,3), csize (M,)) -> (dens (M,), dens_stars (M,)):
        vectorized cell-averaged extinction coefficient and source emissivity.
    subdivision_fn(centers, csize, level, dens, dens_stars) -> bool (M,):
        vectorized subdivision predicate (min_lvl/max_lvl are enforced here).
    """
    b = _Builder(tuple(base), max_lvl, float(modelsize), int(max_ncell))
    # root density
    d, ds = dens_fn(np.zeros((1, 3)), np.asarray([modelsize]))
    b.dens[0], b.dens_stars[0] = float(d[0]), float(ds[0])

    # root is always subdivided (create_grid_arrays: cchild(0)=1,
    # smooth_grid_routines.f90:588-597)
    frontier = b.subdivide([0], dens_fn)

    for level in range(1, max_lvl):
        if frontier.size == 0:
            break
        cc = np.asarray([b.ccoord[i] for i in frontier])
        cs = np.asarray([b.csize[i] for i in frontier])
        dd = np.asarray([b.dens[i] for i in frontier])
        dss = np.asarray([b.dens_stars[i] for i in frontier])
        pred = np.asarray(
            subdivision_fn(cc, cs, level, dd, dss), dtype=bool
        ) | (level < min_lvl)
        to_split = frontier[pred]
        frontier = b.subdivide(to_split, dens_fn)

    grid = _grade(b, dens_fn)
    return grid


def _grade(b: _Builder, dens_fn) -> Grid:
    """Enforce the <=1-level-jump invariant between face-adjacent leaves.

    Sweep to fixpoint: find leaves with a face-adjacent leaf 2+ levels deeper
    and subdivide them (the reference does this interleaved + in a post-pass,
    create_adap_grid_trustI.f90:238-269; the fixpoint is the same).
    """
    from .octree import np_point_to_cell

    while True:
        n = b.n()
        cchild = np.asarray(b.cchild)
        lvl = np.asarray(b.lvl)
        ccoord = np.asarray(b.ccoord)
        csize = np.asarray(b.csize)
        leaves = np.where(cchild == -1)[0]
        # probe the 6 face-neighbour positions of each leaf
        to_split = set()
        probes = []
        owners = []
        for axis in range(3):
            for s in (-1.0, 1.0):
                p = ccoord[leaves].copy()
                p[:, axis] += s * csize[leaves] * 0.5 * 1.0001
                probes.append(p)
                owners.append(leaves)
        probes = np.concatenate(probes)
        owners = np.concatenate(owners)
        inside = np.all(np.abs(probes) < b.modelsize / 2.0, axis=1)
        cell, clvl = np_point_to_cell(cchild, b.base, b.max_lvl, b.modelsize, probes[inside])
        own = owners[inside]
        # neighbour leaf deeper than owner by 2+ -> owner must subdivide
        jump = clvl - lvl[own]
        bad = own[jump >= 2]
        if bad.size == 0:
            break
        b.subdivide(np.unique(bad), dens_fn)

    return finalize(b)


def finalize(b: _Builder) -> Grid:
    import jax.numpy as jnp

    return Grid(
        cchild=jnp.asarray(np.asarray(b.cchild, dtype=np.int32)),
        lvl=jnp.asarray(np.asarray(b.lvl, dtype=np.int32)),
        ccoord=jnp.asarray(np.asarray(b.ccoord)),
        csize=jnp.asarray(np.asarray(b.csize)),
        dens_ref=jnp.asarray(np.asarray(b.dens)),
        dens_stars_ref=jnp.asarray(np.asarray(b.dens_stars)),
        base=tuple(b.base),
        max_lvl=b.max_lvl,
        modelsize=b.modelsize,
    )
