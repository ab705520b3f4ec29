"""HDF5 grid I/O, wire-compatible with the reference's main-grid schema.

The main grid file holds 9 datasets: ncell, ccoord, cchild, cindex, lvl,
csize, dens, dens_stars, base (make_dsetname_main_grid,
io_routines.f90:185-199; written by print_3d_grid_file io_routines.f90:202,
read by read_main_grid io_routines.f90:297).  Note the reference stores
``ccoord`` as Fortran (3, N); h5py sees the transposed (N, 3).
"""
from __future__ import annotations

import numpy as np

from .octree import Grid, compute_cindex


def write_grid(path: str, grid: Grid) -> None:
    import h5py

    n = grid.n_cells
    cchild = np.asarray(grid.cchild, dtype=np.int32)
    lvl = np.asarray(grid.lvl, dtype=np.int32)
    ccoord = np.asarray(grid.ccoord, dtype=np.float64)
    with h5py.File(path, "w") as f:
        f.create_dataset("ncell", data=np.arange(n, dtype=np.int32))
        f.create_dataset("ccoord", data=ccoord)  # (N,3): transpose of Fortran (3,N)
        f.create_dataset("cchild", data=cchild)
        f.create_dataset(
            "cindex",
            data=compute_cindex(cchild, lvl, ccoord, grid.base, grid.max_lvl, grid.modelsize),
        )
        f.create_dataset("lvl", data=lvl)
        f.create_dataset("csize", data=np.asarray(grid.csize, dtype=np.float64))
        f.create_dataset("dens", data=np.asarray(grid.dens_ref, dtype=np.float64))
        f.create_dataset("dens_stars", data=np.asarray(grid.dens_stars_ref, dtype=np.float64))
        f.create_dataset("base", data=np.asarray(grid.base, dtype=np.int32))


def read_grid(path: str) -> Grid:
    import h5py
    import jax.numpy as jnp

    with h5py.File(path, "r") as f:
        cchild = f["cchild"][...].astype(np.int32)
        lvl = f["lvl"][...].astype(np.int32)
        ccoord = f["ccoord"][...].astype(np.float64)
        csize = f["csize"][...].astype(np.float64)
        dens = f["dens"][...].astype(np.float64)
        dens_stars = f["dens_stars"][...].astype(np.float64)
        base = tuple(int(x) for x in f["base"][...])

    if ccoord.shape[0] == 3 and ccoord.shape[1] != 3:
        ccoord = ccoord.T  # Fortran-written file: (3, N) on disk
    max_lvl = int(lvl.max())  # read_main_grid: max_lvl = maxval(lvl)
    modelsize = float(csize[0])  # root cell size == modelsize
    return Grid(
        cchild=jnp.asarray(cchild),
        lvl=jnp.asarray(lvl),
        ccoord=jnp.asarray(ccoord),
        csize=jnp.asarray(csize),
        dens_ref=jnp.asarray(dens),
        dens_stars_ref=jnp.asarray(dens_stars),
        base=base,
        max_lvl=max_lvl,
        modelsize=modelsize,
    )
