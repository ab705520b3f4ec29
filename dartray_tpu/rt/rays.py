"""Adaptive ray management: the HEALPix nside ladder.

Rebuild of main_dir_loop + ray_list (rt_routines.f90:1343-1467,
ray_list.f90): every source emits rays over the sphere starting at
nside_min=4; rays blocked for too-low angular density respawn as 4 children
at twice the nside from the blocking point; rays blocked for too-high
density merge 4->1 at half the nside when they share the parent pixel, the
blocking-plane axis and the plane distance within 0.1%
(extract_ray_list, ray_list.f90:210-296).

The reference runs one source per OpenMP task with thread-private dynamic
lists.  Here the ladder is *global and batched*: one march() call advances
every pending ray of every source at a given nside in lock-step on the
accelerator, and the (small) blocked-ray records are regrouped between
levels with numpy on the host.  Physics is order-independent (deposits
commute), so the batching changes nothing but the summation order.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List

import numpy as np
import jax
import jax.numpy as jnp


def _is_dev(a):
    return isinstance(a, jax.Array)


def _take(a, idx):
    return jnp.take(a, jnp.asarray(idx), axis=0) if _is_dev(a) else np.asarray(a)[idx]


def _repeat(a, k):
    return jnp.repeat(a, k, axis=0) if _is_dev(a) else np.repeat(a, k, axis=0)


def _concat(parts):
    return jnp.concatenate(parts) if any(_is_dev(x) for x in parts) else np.concatenate(parts)

from .. import healpix as hp
from .march import RayBatch, MarchResult, ST_HIGH, ST_LOW, ST_GONE, march

NSIDE_MIN = 4  # rt_routines.f90:60
NSIDE_MAX = 8192  # safety cap (the blocking window terminates well before)


@dataclasses.dataclass
class Blocked:
    """Host-side record arrays of blocked rays at one nside."""

    src_pos: np.ndarray  # (n,3)
    src_cell: np.ndarray  # (n,)
    src_idx: np.ndarray  # (n,) source index (for merge grouping / stats)
    ipix: np.ndarray  # (n,) pixel id at the record's nside
    theta: np.ndarray
    phi: np.ndarray
    lum: np.ndarray  # (n,L)
    prev: np.ndarray
    cc_old: np.ndarray
    isel_old: np.ndarray
    dplane: np.ndarray

    @property
    def n(self):
        return len(self.src_cell)

    @classmethod
    def empty(cls, L):
        z = np.zeros(0)
        zi = np.zeros(0, dtype=np.int64)
        return cls(np.zeros((0, 3)), zi, zi, zi, z, z, np.zeros((0, L)), z, zi, zi, z)

    @classmethod
    def concat(cls, items):
        items = [b for b in items if b.n > 0]
        if not items:
            return None
        return cls(
            **{
                f.name: _concat([getattr(b, f.name) for b in items])
                for f in dataclasses.fields(cls)
            }
        )


def fresh_launch(src_pos, src_cell, src_idx, lum, nside=NSIDE_MIN, pix_subset=None):
    """All-sky launch: one ray per HEALPix pixel at `nside` per source.

    Equivalent to the reference's 12 sectors x 4 subsectors x 4 pixels
    (create_high_ray_list ray_list.f90:71 + the first extract at nside=4).
    """
    npix = 12 * nside * nside if pix_subset is None else len(pix_subset)
    pix = np.arange(12 * nside * nside) if pix_subset is None else np.asarray(pix_subset)
    ns = len(src_cell)
    theta, phi = hp.pix2ang_nest(nside, pix)
    theta = np.asarray(theta)
    phi = np.asarray(phi)

    rep = lambda a: np.repeat(a, npix, axis=0)
    tile = lambda a: np.tile(a, ns)
    return dict(
        src_pos=rep(np.asarray(src_pos)),
        src_cell=rep(np.asarray(src_cell)),
        src_idx=rep(np.asarray(src_idx)),
        ipix=tile(pix),
        theta=tile(theta),
        phi=tile(phi),
        lum=rep(np.asarray(lum)),
        prev=np.zeros(ns * npix),
        cc_old=rep(np.asarray(src_cell)),
        isel_old=np.full(ns * npix, -1, dtype=np.int64),
        dplane=np.zeros(ns * npix),
        fresh=np.ones(ns * npix, dtype=bool),
        seen_other=np.zeros(ns * npix, dtype=bool),
    )


def _to_batch(d, L, pad_to=None, fdtype=jnp.float64):
    """Host dict -> padded device RayBatch."""
    n = len(d["src_cell"])
    m = pad_to or n
    pad = m - n

    def p(a, fill=0):
        if _is_dev(a):
            if pad:
                w = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
                a = jnp.pad(a, w, constant_values=fill)
            return a
        a = np.asarray(a)
        if pad == 0:
            return a
        w = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, w, constant_values=fill)

    return RayBatch(
        src_pos=jnp.asarray(p(d["src_pos"]), dtype=fdtype),
        src_cell=jnp.asarray(p(d["src_cell"]), dtype=jnp.int32),
        theta=jnp.asarray(p(d["theta"]), dtype=fdtype),
        phi=jnp.asarray(p(d["phi"]), dtype=fdtype),
        ipix=jnp.asarray(p(d["ipix"]), dtype=jnp.int32),
        lum=jnp.asarray(p(d["lum"]), dtype=fdtype),
        prev=jnp.asarray(p(d["prev"]), dtype=fdtype),
        cc_old=jnp.asarray(p(d["cc_old"]), dtype=jnp.int32),
        isel_old=jnp.asarray(p(d["isel_old"]), dtype=jnp.int32),
        fresh=jnp.asarray(p(d["fresh"]), dtype=bool),
        seen_other=jnp.asarray(p(d.get("seen_other", np.zeros(n, dtype=bool))), dtype=bool),
        active=jnp.asarray(np.arange(m) < n),
    )


def _bucket(n, minimum=256):
    """Round up to a power of two (bounds the number of jit specializations)."""
    m = minimum
    while m < n:
        m *= 2
    return m


def split_high(blocked: Blocked, nside: int):
    """4x refinement of blocked-high rays: children at 2*nside from the
    blocking point (main_dir_loop rt_routines.f90:1389-1396)."""
    n = blocked.n
    child_pix = (blocked.ipix[:, None] * 4 + np.arange(4)[None, :]).ravel()
    theta, phi = hp.pix2ang_nest(2 * nside, child_pix)
    rep = lambda a: np.repeat(a, 4, axis=0)
    return dict(
        src_pos=rep(blocked.src_pos),
        src_cell=rep(blocked.src_cell),
        src_idx=rep(blocked.src_idx),
        ipix=child_pix,
        theta=np.asarray(theta),
        phi=np.asarray(phi),
        lum=_repeat(blocked.lum, 4),
        prev=rep(blocked.prev),
        cc_old=rep(blocked.cc_old),
        isel_old=rep(blocked.isel_old),
        dplane=rep(blocked.dplane),
        fresh=np.zeros(4 * n, dtype=bool),
        seen_other=np.zeros(4 * n, dtype=bool),
    )


def merge_low(blocked: Blocked, nside: int):
    """Group blocked-low rays (at `nside`) into parents at nside/2.

    Merge requires 4 children with the same (source, parent pixel, blocking
    axis) and plane distances within 0.1% (extract_ray_list,
    ray_list.f90:245-269).  Returns (merged_dict_at_half_nside, reco_dict)
    where reco rays re-run individually at `nside`
    (ray_type_reco, ray_list.f90:276-291).
    """
    n = blocked.n
    parent = blocked.ipix // 4
    # group key
    key = (blocked.src_idx.astype(np.int64) * (12 * nside * nside // 4) + parent) * 4 + blocked.isel_old
    order = np.lexsort((blocked.dplane, key))
    k = key[order]
    # vectorized grouping: within each sorted key-run, consecutive 4-tuples
    # with matching dplane merge (the reference matches each leader with up
    # to 3 later entries, ray_list.f90:237-269; dplane-sorted quadruples are
    # equivalent up to ties)
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    run_id = np.cumsum(np.r_[True, k[1:] != k[:-1]]) - 1
    pos = np.arange(n) - starts[run_id]
    quad = pos // 4
    counts = np.diff(np.r_[starts, n])
    full_quad = (quad + 1) * 4 <= counts[run_id]  # quad fully inside the run
    # dplane tolerance vs the quad leader
    dpl = blocked.dplane[order]
    lead_idx = starts[run_id] + quad * 4
    lead = dpl[np.clip(lead_idx, 0, n - 1)]
    tol_ok = np.abs(dpl - lead) <= 0.001 * np.maximum(np.abs(lead), 1e-300)
    # a quad merges iff all four members are in tolerance
    qkey = run_id * (n + 1) + quad
    uq, inv = np.unique(qkey, return_inverse=True)
    ok_per_quad = np.zeros(len(uq), dtype=np.int64)
    np.add.at(ok_per_quad, inv, (tol_ok & full_quad).astype(np.int64))
    merge_mask = ok_per_quad[inv] == 4
    merged_idx = order[merge_mask]
    rr = order[~merge_mask]

    L = blocked.lum.shape[1]
    if merged_idx.size:
        mr = merged_idx.reshape(-1, 4)  # (m, 4)
        ppix = parent[mr[:, 0]]
        theta, phi = hp.pix2ang_nest(nside // 2, ppix)
        merged = dict(
            src_pos=blocked.src_pos[mr[:, 0]],
            src_cell=blocked.src_cell[mr[:, 0]],
            src_idx=blocked.src_idx[mr[:, 0]],
            ipix=ppix,
            theta=np.asarray(theta),
            phi=np.asarray(phi),
            lum=(jnp.take(blocked.lum, jnp.asarray(mr.ravel()), axis=0)
                 .reshape(len(mr), 4, L).mean(axis=1)
                 if _is_dev(blocked.lum) else blocked.lum[mr].mean(axis=1)),
            prev=blocked.prev[mr].mean(axis=1),
            cc_old=blocked.cc_old[mr[:, 0]],
            isel_old=blocked.isel_old[mr[:, 0]],
            dplane=blocked.dplane[mr[:, 0]],
            fresh=np.zeros(len(mr), dtype=bool),
            seen_other=np.zeros(len(mr), dtype=bool),
        )
    else:
        merged = None

    if rr.size:
        reco = dict(
            src_pos=blocked.src_pos[rr],
            src_cell=blocked.src_cell[rr],
            src_idx=blocked.src_idx[rr],
            ipix=blocked.ipix[rr],
            theta=blocked.theta[rr],
            phi=blocked.phi[rr],
            lum=_take(blocked.lum, rr),
            prev=blocked.prev[rr],
            cc_old=blocked.cc_old[rr],
            isel_old=blocked.isel_old[rr],
            dplane=blocked.dplane[rr],
            fresh=np.zeros(len(rr), dtype=bool),
            seen_other=np.zeros(len(rr), dtype=bool),
        )
    else:
        reco = None
    return merged, reco


def collect_blocked(d: dict, res: MarchResult, status: int) -> Blocked:
    """Extract the rays that finished the march with `status` into a
    host-side Blocked record (luminosity/prev taken at the blocking point).

    The row selection happens on-device so only the blocked rows cross the
    host link (the full (NR, L) luminosity array is the big one)."""
    st = np.asarray(res.status)
    nin = len(d["src_cell"])
    sel = np.flatnonzero(st[:nin] == status)
    if len(sel) == 0:
        return Blocked.empty(res.lum.shape[1])
    dsel = jnp.asarray(sel)
    return Blocked(
        src_pos=np.asarray(d["src_pos"])[sel],
        src_cell=np.asarray(d["src_cell"])[sel],
        src_idx=np.asarray(d["src_idx"])[sel],
        ipix=np.asarray(d["ipix"])[sel],
        theta=np.asarray(d["theta"])[sel],
        phi=np.asarray(d["phi"])[sel],
        lum=jnp.take(res.lum, dsel, axis=0),
        prev=np.asarray(jnp.take(res.prev, dsel)),
        cc_old=np.asarray(jnp.take(res.cc, dsel)),
        isel_old=np.asarray(jnp.take(res.isel_old, dsel)),
        dplane=np.asarray(jnp.take(res.dplane, dsel)),
    )


def run_ladder(
    march_fn: Callable,
    launch: dict,
    L: int,
    fdtype=jnp.float64,
    stats: dict | None = None,
):
    """Drive the nside ladder to completion for a batch of sources.

    march_fn(batch: RayBatch, nside: int) -> MarchResult — closure over the
    grid/physics/accumulators, calling march() with the right mode and the
    solid angle per ray for `nside`.

    Mirrors define_next_level (rt_routines.f90:2745-2770): climb while
    blocked-high rays exist, then descend through the merge levels.
    """
    high: Dict[int, List[Blocked]] = {}
    low: Dict[int, List[Blocked]] = {}

    def do_march(d, nside):
        n = len(d["src_cell"])
        if n == 0:
            return
        batch = _to_batch(d, L, pad_to=_bucket(n), fdtype=fdtype)
        res = march_fn(batch, nside)
        if stats is not None:
            stats["rays"] = stats.get("rays", 0) + n
            stats["steps"] = stats.get("steps", 0) + int(res.n_steps)
        b_high = collect_blocked(d, res, ST_HIGH)
        b_low = collect_blocked(d, res, ST_LOW)
        if b_high.n:
            high.setdefault(nside, []).append(b_high)
        if b_low.n:
            low.setdefault(nside, []).append(b_low)

    do_march(launch, NSIDE_MIN)

    while True:
        if high:
            nside = min(high)
            pool = Blocked.concat(high.pop(nside))
            # splitting terminates physically: beam_i shrinks 4x per level
            # while beam_f at the blocking point is fixed, so the too-sparse
            # condition eventually fails (NSIDE_MAX is a pure safety net)
            if 2 * nside > NSIDE_MAX:
                raise RuntimeError("nside ladder exceeded NSIDE_MAX")
            do_march(split_high(pool, nside), 2 * nside)
            continue
        if low:
            nside = max(low)
            pool = Blocked.concat(low.pop(nside))
            merged, reco = merge_low(pool, nside)
            if reco is not None:
                do_march(reco, nside)
                # reco rays may add to high/low again; loop handles it
            if merged is not None:
                do_march(merged, nside // 2)
            continue
        break
