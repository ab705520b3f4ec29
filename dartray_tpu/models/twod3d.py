"""2D (R,z) -> 3D grid import.

Rebuild of user_routines_2dto3d.f90: per-wavelength ASCII tables of
axisymmetric emissivity j_nu(R,z) [W/Hz/pc^3] and extinction k(R,z) [1/pc]
(read_grid_2d 2dto3d.f90:168-280) are interpolated onto the 3D octree by
cell-averaged nearest-grid-point sampling (av_dens_2dto3d 2dto3d.f90:360-478:
the reference samples the cube on a ~modelsize/1000 step and picks the
bracketing (R,z) table cell for each sample point).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..grid.builder import build_grid


@dataclasses.dataclass
class Grid2D:
    r: np.ndarray  # (NR,) ascending radial points
    z: np.ndarray  # (NZ,) ascending |z| points
    lum: np.ndarray  # (NR, NZ) emissivity
    dens: np.ndarray  # (NR, NZ) extinction coefficient


def read_grid_2d(path: str) -> Grid2D:
    """Parse a 2D grid table: columns R, z, j_nu, k (one comment line)."""
    data = np.loadtxt(path, skiprows=1)
    rcol, zcol = data[:, 0], data[:, 1]
    # number of z points = length of the first constant-R run
    nz = 1
    while nz < len(rcol) and rcol[nz] == rcol[0]:
        nz += 1
    nr = len(rcol) // nz
    return Grid2D(
        r=rcol[::nz][:nr],
        z=zcol[:nz],
        lum=data[:, 2].reshape(nr, nz),
        dens=data[:, 3].reshape(nr, nz),
    )


def sample(g2: Grid2D, pts):
    """(lum, dens) at 3D points by bracketing lookup (av_dens_2dto3d):
    values beyond max R or max |z| are zero."""
    r = np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2)
    z = np.abs(pts[:, 2])
    ir = np.clip(np.searchsorted(g2.r, r, side="right") - 1, 0, len(g2.r) - 1)
    iz = np.clip(np.searchsorted(g2.z, z, side="right") - 1, 0, len(g2.z) - 1)
    inside = (r <= g2.r[-1]) & (z <= g2.z[-1])
    return (
        np.where(inside, g2.lum[ir, iz], 0.0),
        np.where(inside, g2.dens[ir, iz], 0.0),
    )


def cell_average(g2: Grid2D, centers, csize, modelsize, max_steps: int = 200):
    """Cell-averaged (lum, dens) with the reference's resolution heuristic
    (av_dens_2dto3d: step ~ modelsize/1000, 2..200 midpoints per axis).

    The n^3 sample grid is a product grid and the table lookup separates
    into (R(x,y), |z|) indices, so the sum reduces exactly to
    hist_xy(ir)^T * TABLE * hist_z(iz) — O(n^2) per cell instead of O(n^3).
    """
    centers = np.asarray(centers)
    csize = np.asarray(csize)
    nr, nz = len(g2.r), len(g2.z)
    out_l = np.empty(len(centers))
    out_d = np.empty(len(centers))
    step_pc = modelsize / 1000.0
    np_per = np.clip((csize / step_pc).astype(int), 2, max_steps)
    for ic in range(len(centers)):
        n = int(np_per[ic]) - 1  # midpoints of (np-1) intervals (ref loop 0..np-2)
        n = max(n, 1)
        cs = csize[ic]
        step = cs / n
        offs = (np.arange(n) + 0.5) * step
        x = centers[ic, 0] - cs / 2 + offs
        y = centers[ic, 1] - cs / 2 + offs
        z = np.abs(centers[ic, 2] - cs / 2 + offs)
        rad = np.sqrt(x[:, None] ** 2 + y[None, :] ** 2).ravel()
        ir = np.clip(np.searchsorted(g2.r, rad, side="right") - 1, 0, nr - 1)
        ir = np.where(rad <= g2.r[-1], ir, nr)  # nr = outside sentinel
        iz = np.clip(np.searchsorted(g2.z, z, side="right") - 1, 0, nz - 1)
        iz = np.where(z <= g2.z[-1], iz, nz)
        h_r = np.bincount(ir, minlength=nr + 1)[:nr].astype(np.float64)
        h_z = np.bincount(iz, minlength=nz + 1)[:nz].astype(np.float64)
        denom = n**3
        out_l[ic] = h_r @ g2.lum @ h_z / denom
        out_d[ic] = h_r @ g2.dens @ h_z / denom
    return out_l, out_d


def build_2dto3d_grid(
    g2_ref: Grid2D,
    base=(10, 2),
    max_lvl: int = 4,
    min_lvl: int = 1,
    modelsize: float = 28_000.0,
    max_ncell: int = 3_000_000,
    max_dtau: float = 0.01,
    max_dlum: float = 1e-6,
):
    """Adaptive 3D grid from the reference-wavelength 2D table."""
    # total luminosity for the relative-luminosity criterion
    # (create_adap_grid_2dto3d.f90 subdivision)
    dr = np.gradient(g2_ref.r)
    dz = np.gradient(g2_ref.z)
    tot_lum = float(
        (g2_ref.lum * (2 * np.pi * g2_ref.r * dr)[:, None] * (2 * dz)[None, :]).sum()
    )

    def dens_fn(centers, csize):
        l, d = cell_average(g2_ref, centers, csize, modelsize)
        return d, l

    def subdivision_fn(centers, csize, level, dens, dens_stars):
        tau = dens * csize
        lum = dens_stars * csize**3
        return (level < max_lvl) & ((tau > max_dtau) | (lum > max_dlum * tot_lum))

    return build_grid(
        dens_fn, subdivision_fn, base=base, max_lvl=max_lvl, min_lvl=min_lvl,
        modelsize=modelsize, max_ncell=max_ncell,
    )


def dens_stars_arr_2dto3d(grid, tables: dict, modelsize: float):
    """Per-wavelength emissivity on the grid: tables = {il: Grid2D}."""
    centers = np.asarray(grid.ccoord)
    csize = np.asarray(grid.csize)
    leaf = np.asarray(grid.leaf_mask())
    L = len(tables)
    out = np.zeros((grid.n_cells, L))
    for il, g2 in tables.items():
        l, _ = cell_average(g2, centers[leaf], csize[leaf], modelsize)
        out[leaf, il] = l
    return out
