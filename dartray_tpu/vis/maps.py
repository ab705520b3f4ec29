"""Surface-brightness maps for external observers.

Rebuild of make_maps / map_projection (visual_routines.f90:59-772): each
leaf cell's outgoing intensity is splatted onto a 4x-oversampled map using a
per-level normalized "texture" (the projected line-of-sight intersection
lengths of a cube), median-filtered, 4x downsampled, and per-level
flux-renormalized.  Point sources land in single pixels.

The implementation is vectorized numpy (host post-processing): textures via
the slab method over the pixel grid, splats via np.add.at over per-level
cell batches.
"""
from __future__ import annotations

import numpy as np

from ..constants import PARSEC, CSPEED

HD_XFACTOR = 4  # visual_routines.f90:40


def observer_frame(theta: float, phi: float, dtheta: float = 1e-3):
    """Line-of-sight unit vector and in-plane axes (calc_texture_array,
    visual_routines.f90:350-376).  Y' is the projection of +Z onto the map
    plane; X' = Y' x obs."""
    obs = np.array(
        [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)]
    )
    z = np.array([0.0, 0.0, 1.0])
    zz = obs @ z
    if abs(abs(zz) - 1.0) > 1e-6:
        yi = z - zz * obs
    else:
        if abs(theta - np.pi) < 1e-6:
            dtheta = -dtheta
        obs2 = np.array(
            [
                np.sin(theta + dtheta) * np.cos(phi),
                np.sin(theta + dtheta) * np.sin(phi),
                np.cos(theta + dtheta),
            ]
        )
        zz2 = obs2 @ z
        yi = z - zz2 * obs2
        yi = yi - (yi @ z) * z
    yi = yi / np.linalg.norm(yi)
    xi = np.cross(yi, obs)
    return obs, xi, yi


def cube_line_lengths(points, direction, cellsize):
    """Intersection length of lines (through `points`, along `direction`)
    with the axis-aligned cube of side `cellsize` centered at the origin
    (find_ray_cell_intersections, visual_routines.f90:456-475; slab method
    instead of the per-face loop)."""
    d = np.asarray(direction, dtype=np.float64)
    p = np.asarray(points, dtype=np.float64)
    h = cellsize / 2.0
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (-h - p) / d
        t2 = (h - p) / d
    tmin = np.where(d != 0, np.minimum(t1, t2), -np.inf)
    tmax = np.where(d != 0, np.maximum(t1, t2), np.inf)
    # axis-parallel: inside slab or never
    inside = np.abs(p) <= h * (1 + 1e-7)
    tmin = np.where(d == 0, np.where(inside, -np.inf, np.inf), tmin)
    tmax = np.where(d == 0, np.where(inside, np.inf, -np.inf), tmax)
    lo = tmin.max(axis=-1)
    hi = tmax.min(axis=-1)
    return np.maximum(hi - lo, 0.0)


def make_textures(grid, obs, xi, yi, npixel_maps: int, size_map: float):
    """Per-level normalized projected-cube profiles (calc_texture_array,
    visual_routines.f90:314-453)."""
    npix_hd = HD_XFACTOR * npixel_maps
    px = size_map / npix_hd
    csizes = grid.csize_levels()
    textures = {}
    for lvl in range(1, grid.max_lvl + 1):
        lside = csizes[lvl]
        nt = int(round(npix_hd / size_map * lside * 2.5))
        nt = max(nt, 1)
        if nt % 2 == 0:
            xpp = np.arange(nt) * px - nt * px / 2.0
        else:
            xpp = np.arange(nt) * px - nt * px / 2.0 + px / 2.0
        xx, yy = np.meshgrid(xpp, xpp, indexing="ij")
        ro = (
            obs[None, None, :] * 0.0
            + xx[..., None] * xi[None, None, :]
            + yy[..., None] * yi[None, None, :]
        )
        prof = cube_line_lengths(ro.reshape(-1, 3), obs, lside * 0.99).reshape(nt, nt)
        tot = prof.sum()
        if tot > 0:
            prof = prof / tot
        textures[lvl] = prof
    return textures


def median_filter_4(im):
    """4x4-window median excluding zeros (median_section,
    visual_routines.f90:801-836); pixels whose own value is zero stay zero
    unless a majority of the window is nonzero."""
    n = im.shape[0]
    out = im.copy()
    # build 4x4 windows centered at (i-2..i+1) x (j-2..j+1)
    pad = 2
    big = np.pad(im, ((pad, pad), (pad, pad)) + ((0, 0),) * (im.ndim - 2))
    windows = np.empty((n, n, 16) + im.shape[2:], dtype=im.dtype)
    k = 0
    for di in range(-2, 2):
        for dj in range(-2, 2):
            windows[:, :, k] = big[pad + di : pad + di + n, pad + dj : pad + dj + n]
            k += 1
    sortw = np.sort(windows, axis=2)
    nz_start = (sortw == 0).sum(axis=2)  # first nonzero index
    ntot = 16
    iel = (ntot - nz_start) // 2 + nz_start
    zero_here = im == 0
    # zero-valued pixels with majority-zero windows stay zero
    iel = np.where(zero_here & (nz_start > (ntot - 1) // 2), 0, iel)
    iel = np.clip(iel, 0, ntot - 1)
    out = np.take_along_axis(sortw, iel[:, :, None], axis=2)[:, :, 0]
    # map edges: keep original values (visual_routines.f90:683-686)
    out[:pad] = im[:pad]
    out[-pad:] = im[-pad:]
    out[:, :pad] = im[:, :pad]
    out[:, -pad:] = im[:, -pad:]
    return out


def make_map(
    grid,
    i_obs,  # (nsid, L) intensity toward this observer (cells + point sources)
    theta: float,
    phi: float,
    npixel_maps: int,
    map_size_factor: float,
    src_pos=None,  # (nps, 3) point-source positions
    src_host=None,  # (nps,) host cells
):
    """Project one line of sight into a (npixel_maps, npixel_maps, L) map.

    Follows map_projection (visual_routines.f90:570-772): per-level splat at
    4x resolution, median filter, rebin, flux renormalization per level.
    """
    nL = i_obs.shape[1]
    size_map = map_size_factor * grid.modelsize
    npix_hd = HD_XFACTOR * npixel_maps
    px_hd = size_map / npix_hd
    px = size_map / npixel_maps
    area_hd = px_hd**2
    area = px**2

    obs, xi, yi = observer_frame(theta, phi)
    textures = make_textures(grid, obs, xi, yi, npixel_maps, size_map)

    ccoord = np.asarray(grid.ccoord)
    csize = np.asarray(grid.csize)
    lvl = np.asarray(grid.lvl)
    leaf = np.asarray(grid.leaf_mask())

    # left/down pixel-edge coordinates (map_projection visual:593-597)
    xpp0_hd = -npix_hd * px_hd / 2.0
    xpp0 = -npixel_maps * px / 2.0

    out = np.zeros((npixel_maps, npixel_maps, nL))

    for level in range(1, grid.max_lvl + 1):
        sel = np.flatnonzero(leaf & (lvl == level) & (np.abs(i_obs[: grid.n_cells]).sum(1) > 0))
        if len(sel) == 0:
            continue
        tex = textures[level]
        nt = tex.shape[0]
        # projected center coordinates
        r = ccoord[sel]
        vn = r @ obs
        ri = r - vn[:, None] * obs[None, :]
        xi_p = ri @ xi
        yi_p = ri @ yi
        ix_p = np.floor((xi_p - xpp0_hd) / px_hd).astype(np.int64)
        iy_p = np.floor((yi_p - xpp0_hd) / px_hd).astype(np.int64)

        # texture support: the reference narrows to [im0, im1]
        # (calc_texture_array visual:426-447); we keep the full nt window
        half = nt // 2
        ix0 = ix_p - half
        iy0 = iy_p - half
        ok = (ix0 >= 0) & (iy0 >= 0) & (ix0 + nt <= npix_hd) & (iy0 + nt <= npix_hd)
        sel, ix0, iy0 = sel[ok], ix0[ok], iy0[ok]
        if len(sel) == 0:
            continue

        hd = np.zeros((npix_hd, npix_hd, nL))
        w = i_obs[sel] * (csize[sel] ** 2)[:, None] / area_hd  # (n, L)
        # splat: hd[ix0+a, iy0+b, l] += w[n, l] * tex[a, b]
        ii = ix0[:, None, None] + np.arange(nt)[None, :, None]  # (n, nt, 1)
        jj = iy0[:, None, None] + np.arange(nt)[None, None, :]  # (n, 1, nt)
        contrib = w[:, None, None, :] * tex[None, :, :, None]  # (n, nt, nt, L)
        np.add.at(
            hd,
            (
                np.broadcast_to(ii, contrib.shape[:3]),
                np.broadcast_to(jj, contrib.shape[:3]),
            ),
            contrib,
        )

        tot_old = hd.sum(axis=(0, 1)) * area_hd

        hd = median_filter_4(hd)

        # rebin 4x (mean of the 4x4 block, visual:699-721)
        reb = hd.reshape(npixel_maps, HD_XFACTOR, npixel_maps, HD_XFACTOR, nL).sum(
            axis=(1, 3)
        ) / HD_XFACTOR**2

        tot_new = reb.sum(axis=(0, 1)) * area
        scale = np.where(tot_new > 0, tot_old / np.maximum(tot_new, 1e-300), 0.0)
        out += reb * scale[None, None, :]

    # point sources: single low-res pixels (visual:742-770)
    if src_pos is not None and len(src_pos) > 0:
        r = np.asarray(src_pos)
        vn = r @ obs
        ri = r - vn[:, None] * obs[None, :]
        ix_p = np.floor((ri @ xi - xpp0) / px).astype(np.int64)
        iy_p = np.floor((ri @ yi - xpp0) / px).astype(np.int64)
        for k in range(len(r)):
            if 0 <= ix_p[k] < npixel_maps and 0 <= iy_p[k] < npixel_maps:
                out[ix_p[k], iy_p[k]] += (
                    i_obs[grid.n_cells + k] * float(csize[src_host[k]]) ** 2 / area
                )
    return out


def convert_map_to_MJy_sr(map_arr, units_i_obs: str, lambda_si=None):
    """convert_maps_to_MJy_sr (visual_routines.f90:180-246)."""
    if units_i_obs == "erg/s/Hz/pc^2/sr":
        return map_arr * 1e-7 * 1e20 / PARSEC**2
    if units_i_obs == "W/Hz/pc^2/sr":
        return map_arr * 1e20 / PARSEC**2
    if units_i_obs == "W/m/pc^2/sr":
        return map_arr * (np.asarray(lambda_si) ** 2 / CSPEED)[None, None, :] * 1e20 / PARSEC**2
    raise ValueError(f"unknown units {units_i_obs!r}")
