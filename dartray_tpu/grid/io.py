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


# ---------------------------------------------------------------------------
# lambda grids: optional per-wavelength dens/dens_stars files
# (read_lambda_grid io_routines.f90:397-498; names grid_<label>_l<λ>um.h5,
# io_routines.f90:2323-2330; datasets 'dens' and 'dens_stars')
# ---------------------------------------------------------------------------


def lambda_grid_name(label: str, lambda_um: float) -> str:
    """grid_<label>_l<lam>um.h5 with the F9.3 wavelength label of
    make_label_wave (io_routines.f90:2301)."""
    return f"grid_{label}_l{lambda_um:.3f}um.h5"


def write_lambda_grid(path: str, dens, dens_stars) -> None:
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset("dens", data=np.asarray(dens, dtype=np.float64))
        f.create_dataset(
            "dens_stars", data=np.asarray(dens_stars, dtype=np.float64)
        )


def read_lambda_grids(dir_grid: str, label: str, lambda_um, n_cells: int,
                      lambda_ref: float):
    """Load all per-wavelength grids (read_lambda_grid,
    io_routines.f90:397-498).

    Returns (dens_arr (N, L), dens_stars_arr (N, L), dens_ref (N,)); raises
    if a file is missing, a dens_stars value is negative, or the reference
    wavelength is not among the lambda grids (io:473-496)."""
    import os
    import h5py

    lambda_um = np.asarray(lambda_um)
    L = len(lambda_um)
    dens_arr = np.empty((n_cells, L))
    dens_stars_arr = np.empty((n_cells, L))
    dens_ref = None
    for il, lam in enumerate(lambda_um):
        path = os.path.join(dir_grid, lambda_grid_name(label, float(lam)))
        if not os.path.exists(path):
            raise FileNotFoundError(f"lambda grid file not found: {path}")
        with h5py.File(path, "r") as f:
            d = f["dens"][...]
            ds = f["dens_stars"][...]
        if len(d) != n_cells or len(ds) != n_cells:
            raise ValueError(
                f"lambda grid {path}: {len(d)} cells, main grid has {n_cells}"
            )
        if np.any(ds < 0):
            raise ValueError(f"negative value in dens_stars ({path})")
        dens_arr[:, il] = d
        dens_stars_arr[:, il] = ds
        if abs(lambda_ref - lam) / lambda_ref < 1e-4:
            dens_ref = d
    if dens_ref is None:
        raise ValueError(
            "reference grid not found among the lambda grids "
            f"(lambda_ref = {lambda_ref})"
        )
    return dens_arr, dens_stars_arr, dens_ref
