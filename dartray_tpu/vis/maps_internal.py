"""Surface-brightness maps for observers inside the model.

Rebuild of map_in_projection / calc_cube_texture_sphere
(visual_routines.f90:917-1182): each cell's intensity is projected onto a
HEALPix sphere centered on the observer.  Three cases per cell:

1. cell solid angle < pixel solid angle -> all flux into one pixel;
2. observer inside the cell -> uniform I/2 over the whole sphere;
3. otherwise -> distribute over pixels proportionally to the line-of-sight
   intersection lengths with the cell cube.

The reference flood-fills pixel neighbours; here case 3 is rasterized
densely over the pixels within the cell's bounding cone — vectorized
(cells x pixels) math instead of per-pixel recursion.
"""
from __future__ import annotations

import numpy as np

from .. import healpix as hp
from .maps import cube_line_lengths


def make_map_in(
    grid,
    i_obs_in,  # (nsid, L) intensities toward this observer
    obs_pos,  # (3,)
    kp_maps: int,
    src_pos=None,
    src_host=None,
    cell_chunk: int = 4096,
):
    """Project one internal observer into a (npix_maps, L) HEALPix map."""
    nside = 2**kp_maps
    npix = hp.nside2npix(nside)
    nL = i_obs_in.shape[1]
    omega_hp = 4.0 * np.pi / npix
    pix_dirs = np.asarray(hp.pix2vec_nest(nside, np.arange(npix)))  # (npix, 3)

    ccoord = np.asarray(grid.ccoord)
    csize = np.asarray(grid.csize)
    leaf = np.asarray(grid.leaf_mask())
    ro = np.asarray(obs_pos, dtype=np.float64)

    out = np.zeros((npix, nL))

    sel = np.flatnonzero(leaf & (np.abs(i_obs_in[: grid.n_cells]).sum(1) > 0))
    if len(sel) == 0 and src_pos is None:
        return out

    rel = ccoord[sel] - ro[None, :]
    dist2 = np.sum(rel**2, axis=1)
    cs = csize[sel]
    omega_cell = np.where(dist2 > 0, cs**2 / np.maximum(dist2, 1e-300), 4 * np.pi)
    omega_ratio = omega_cell / omega_hp

    inside = np.all(np.abs(rel) <= (1 + 1e-7) * cs[:, None] / 2, axis=1)

    # case 2: observer inside the cell -> uniform I/2 (visual:1002-1011)
    for k in np.flatnonzero(inside):
        out += i_obs_in[sel[k]][None, :] / 2.0

    # case 1: single pixel (visual:981-997)
    small = (~inside) & (omega_ratio < 1.0)
    if small.any():
        d = rel[small]
        ip = np.asarray(hp.vec2pix_nest(nside, d))
        np.add.at(out, ip, i_obs_in[sel[small]] * omega_ratio[small][:, None])

    # case 3: rasterize over the bounding cone (visual:1013-1019, 1080-1182)
    big = (~inside) & (omega_ratio >= 1.0)
    bidx = np.flatnonzero(big)
    for b0 in range(0, len(bidx), cell_chunk):
        bb = bidx[b0 : b0 + cell_chunk]
        n = len(bb)
        r = rel[bb]  # (n, 3)
        c2 = cs[bb]
        d = np.sqrt(dist2[bb])
        # candidate pixels: within the cone of half-angle
        # atan(r_cube/d) + pixel radius (margin)
        half = np.arctan2(np.sqrt(3.0) * c2 / 2.0, d) + 2.0 * np.sqrt(omega_hp)
        cosang = (pix_dirs @ (r / d[:, None]).T).T  # (n, npix)
        cand = cosang >= np.cos(np.minimum(half, np.pi))[:, None]
        # intersection lengths for candidate pixels: line from observer
        # along each pixel direction vs the cube centered at r
        lengths = np.zeros((n, npix))
        for i in range(n):
            pj = np.flatnonzero(cand[i])
            if len(pj) == 0:
                continue
            # lines from the observer (at -r[i] relative to the cube center)
            # along the candidate pixel directions, batched slab test
            p0 = np.broadcast_to(-r[i], (len(pj), 3))
            lengths[i, pj] = cube_line_lengths(p0, pix_dirs[pj], c2[i])
        tot = lengths.sum(axis=1)
        # no intersection found despite omega_ratio>1: central pixel fallback
        # (visual:1122-1127)
        for i in np.flatnonzero(tot == 0):
            ip = int(np.asarray(hp.vec2pix_nest(nside, r[i])))
            lengths[i, ip] = 1.0
            tot[i] = 1.0
        w = lengths / tot[:, None]
        out += (w[:, :, None] * (i_obs_in[sel[bb]] * omega_ratio[bb][:, None])[:, None, :]).sum(
            axis=0
        )

    # point sources (visual:1038-1073)
    if src_pos is not None and len(src_pos) > 0:
        for k in range(len(src_pos)):
            rel_s = np.asarray(src_pos[k]) - ro
            d2 = float(np.sum(rel_s**2))
            if d2 == 0:
                continue
            csz = float(csize[src_host[k]])
            ip = int(np.asarray(hp.vec2pix_nest(nside, rel_s)))
            out[ip] += i_obs_in[grid.n_cells + k] * (csz**2 / d2) / omega_hp
    return out
