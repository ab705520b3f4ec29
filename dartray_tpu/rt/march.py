"""Batched ray-march kernel: the hot loop of the framework.

TPU-native rebuild of ray_tracing / calc_psel / deposit
(rt_routines.f90:1618-1857, 2307-2351, 2362-2557).  Instead of one scalar
ray marched to completion per OpenMP task, a fixed-size *batch* of rays is
advanced in lock-step inside a single ``lax.while_loop`` under ``jit``:

* next-wall selection (calc_psel) is a 3-vector min over the batch;
* deposits are scatter-adds into the (ncell, L) radiation-field accumulator
  — no locks/atomics needed (P9 of SURVEY.md becomes a scatter-add);
* the DART-Ray blocking rules (ray-precision lower bound
  ``u_beam < f_U * U_LL`` and the beam-density window bm_par/bm_par_max,
  deposit rt_routines.f90:2426-2534) are evaluated vectorized; each ray can
  block at most once per call, so blocked-ray records live in per-ray output
  slots with a status code — no dynamic lists;
* octree navigation uses fine integer coordinates (see grid.octree) —
  increment with carry on the crossed axis, per-level re-floor on the other
  axes (the exact arithmetic of rt_routines.f90:1778-1841).

Wavelengths are carried densely: the per-step math is (NR, L)-shaped, which
maps straight onto the VPU lanes (the reference's iq compressed-index loop,
set_iq_list rt_routines.f90:1860, is unnecessary on TPU).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..grid.octree import Grid

# status codes
ST_ACTIVE = 0
ST_GONE = 1  # finished (killed, exited, or reached rad_lim)
ST_HIGH = 2  # blocked: needs 4x angular refinement (ras_go_high)
ST_LOW = 3  # blocked: merge candidate (ras_go_low)

# march modes (static)
MODE_PRECALC = 0  # deposits to u_fest, rad_lim-limited
MODE_DIRECT = 1  # deposits to u_final (+ scattering source), kill test
MODE_IOBS = 2  # external-observer intensity: attenuation only
MODE_IOBS_IN = 3  # internal-observer intensity: stops at the observer

GLEPSILON = 1.0e-7  # direction sign threshold (rt_routines.f90:76)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RayBatch:
    """A batch of rays, all at the same HEALPix nside."""

    src_pos: jax.Array  # (NR,3) source position
    src_cell: jax.Array  # (NR,) int32 source cell id (nc)
    theta: jax.Array  # (NR,)
    phi: jax.Array  # (NR,)
    ipix: jax.Array  # (NR,) int32 pixel id at the batch nside
    lum: jax.Array  # (NR,L) ray luminosity (= I * 4 pi csize(nc)^2)
    prev: jax.Array  # (NR,) path length already crossed (0 = fresh)
    cc_old: jax.Array  # (NR,) int32 last intersected cell (relaunch anchor)
    isel_old: jax.Array  # (NR,) int32 axis of last crossing (-1 = none)
    fresh: jax.Array  # (NR,) bool: ray starts at its source
    seen_other: jax.Array  # (NR,) bool: ray already left its start cell
    active: jax.Array  # (NR,) bool

    @property
    def n(self):
        return self.src_pos.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MarchResult:
    status: jax.Array  # (NR,) int32 final status
    lum: jax.Array  # (NR,L) luminosity at exit/blocking
    prev: jax.Array  # (NR,) path length at blocking point
    cc: jax.Array  # (NR,) last cell (blocking records)
    isel_old: jax.Array  # (NR,) entry axis at blocking
    dplane: jax.Array  # (NR,) axis-distance to blocking plane (merge key)
    lum_lost: jax.Array  # (L,) luminosity killed by the f_U criterion
    i_obs: jax.Array  # (NR,L) exit intensity (iobs modes)
    n_steps: jax.Array  # () total ray-cell intersections processed
    cc_cur: jax.Array = None  # (NR,) current cell (for ST_ACTIVE continuation)
    isel_cur: jax.Array = None  # (NR,) current entry axis
    seen_other: jax.Array = None  # (NR,) flag_beam state for continuation
    trace_cells: jax.Array = None  # (NR,S) int32 visited cells (if traced)
    trace_lengths: jax.Array = None  # (NR,S) intersection lengths
    trace_count: jax.Array = None  # (NR,) number of trace entries


def _dir_components(theta, phi):
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)], axis=-1)


@partial(
    jax.jit,
    static_argnames=(
        "mode",
        "point_source",
        "trace_steps",
        "collect_en_sca",
        "allow_block",
    ),
)
def march(
    grid: Grid,
    dens_ref,  # (ncell,) extinction coeff at lambda_ref [1/length]
    kext_norm,  # (L,) kext(lambda)/kext_ref
    albedo,  # (L,) ksca/kext
    u_fest,  # (ncell, L) lower-bound field (direct mode kill test)
    u_accum,  # (ncell, L) accumulator (u_fest or u_final depending on mode)
    rays: RayBatch,
    *,
    mode: int,
    point_source: bool = False,
    beam_i=None,  # () solid angle per ray = 4 pi / (12 nside^2)
    en_lim=0.0,  # f_U
    rad_lim_dist=jnp.inf,  # rad_lim * modelsize (precalc)
    bm_par=10.0,
    bm_par_max=200.0,
    allow_block=True,  # False when nside <= 2*nside_min (no further splitting)
    cs=1.0,  # light speed in grid units
    wall_lo=(-jnp.inf, -jnp.inf, -jnp.inf),
    wall_hi=(jnp.inf, jnp.inf, jnp.inf),
    vec_mod=None,  # (NR,) source-observer distance (MODE_IOBS_IN)
    max_steps: int = 100000,
    trace_steps: int = 0,  # record (cell, length) per intersection if > 0
    collect_en_sca: bool = False,  # also accumulate scattered energy per step
    ffn=None,  # tuple of (NR, P_k, L_k) per-bucket HG deposition weights
    scaspe_lam_idx=None,  # tuple of (L_k,) int32 wavelength indices per bucket
    scaspe_accum=None,  # tuple of (ncell, P_k, L_k) accumulators
):
    """Advance every ray to completion (exit / kill / block).

    Returns (u_accum, MarchResult[, scaspe_accum]).

    The scattering deposit path (collect_en_sca) adds, for every
    intersection and every kp bucket, ``en_sca(ray, lambda in bucket) *
    ffn(ray, pix)`` into ``scaspe_accum[k][cell, pix, lambda]`` — the
    vectorized equivalent of process_scatt_rad (rt_routines.f90:2638-2726).
    The HG weights ffn depend only on the (fixed) ray direction, so they are
    precomputed per kernel call (calc_ffn_arr, rt:2186-2281).
    """
    NR = rays.n
    L = kext_norm.shape[0]
    fdtype = rays.lum.dtype
    csize_lv = jnp.asarray(grid.csize_levels(), dtype=fdtype)
    spl = jnp.asarray(grid.fine_per_level(), dtype=jnp.int32)
    n_fine = grid.n_fine
    max_lvl = grid.max_lvl
    b1, b2 = grid.base

    d = _dir_components(rays.theta, rays.phi)  # (NR,3)
    # sign of each direction component; 0 for axis-perpendicular rays
    # (rt_routines.f90:1666-1669)
    inc = jnp.clip((d / GLEPSILON).astype(jnp.int32), -1, 1)
    inv_d = jnp.where(inc != 0, 1.0 / jnp.where(d == 0, 1.0, d), jnp.inf)

    src = rays.src_pos
    nc = rays.src_cell
    csize_nc = grid.csize[nc].astype(fdtype)
    lvl_nc = grid.lvl[nc]
    area_i = csize_nc**2
    csize_i = csize_nc
    intensity0 = rays.lum / (4.0 * jnp.pi * csize_nc**2)[:, None]

    if beam_i is None:
        beam_i = jnp.asarray(4.0 * jnp.pi / 12.0, dtype=fdtype)
    beam_i = jnp.asarray(beam_i, dtype=fdtype)

    # --- starting cell -----------------------------------------------------
    # fresh rays start in their source cell; relaunched rays start at
    # src + prev*d (find_cc_new2, rt_routines.f90:1962-2066)
    start_pos = src + rays.prev[:, None] * d
    outside = jnp.any(jnp.abs(start_pos) > grid.modelsize / 2.0, axis=-1)

    # point -> fine coords (per-level floor, clamping at edges)
    norm = start_pos + grid.modelsize / 2.0
    fine = jnp.zeros((NR, 3), dtype=jnp.int32)
    for l in range(1, max_lvl + 1):
        b = b1 if l == 1 else b2
        digit = jnp.clip(jnp.floor(norm / csize_lv[l]).astype(jnp.int32), 0, b - 1)
        norm = norm - digit * csize_lv[l]
        fine = fine + digit * spl[l]

    # override with the source-cell coordinates for fresh rays (the source
    # center is always strictly inside its cell)
    cc0, clvl0 = _descend(grid, fine)
    # if the relaunch point is still inside cc_old use cc_old (identical
    # result; the descend already guarantees that)
    cc = jnp.where(rays.fresh, nc, cc0)
    clvl = jnp.where(rays.fresh, lvl_nc, clvl0)

    active0 = rays.active & ~outside
    # status for rays that exited the model before relaunch
    status0 = jnp.where(rays.active & outside, ST_GONE, ST_ACTIVE)
    status0 = jnp.where(~rays.active, ST_GONE, status0)

    wall_lo = jnp.asarray(wall_lo, dtype=fdtype)
    wall_hi = jnp.asarray(wall_hi, dtype=fdtype)

    if vec_mod is None:
        vec_mod = jnp.full((NR,), jnp.inf, dtype=fdtype)

    do_trace = trace_steps > 0

    state = dict(
        cc=cc.astype(jnp.int32),
        clvl=clvl.astype(jnp.int32),
        fine=fine,
        prev=rays.prev.astype(fdtype),
        isel_old=rays.isel_old.astype(jnp.int32),
        intensity=intensity0,
        flag_beam=jnp.ones((NR,), dtype=bool),
        seen_other=jnp.asarray(rays.seen_other, dtype=bool),
        active=active0,
        status=status0.astype(jnp.int32),
        # blocking records
        blk_prev=jnp.zeros((NR,), dtype=fdtype),
        blk_cc=jnp.zeros((NR,), dtype=jnp.int32),
        blk_isel=jnp.zeros((NR,), dtype=jnp.int32),
        blk_dplane=jnp.zeros((NR,), dtype=fdtype),
        i_obs=jnp.zeros((NR, L), dtype=fdtype),
        lum_lost=jnp.zeros((L,), dtype=fdtype),
        u=u_accum,
        n_steps=jnp.zeros((), dtype=jnp.int64 if jax.config.jax_enable_x64 else jnp.int32),
        it=jnp.zeros((), dtype=jnp.int32),
    )
    if do_trace:
        state["trace_cells"] = jnp.zeros((NR, trace_steps), dtype=jnp.int32)
        state["trace_lengths"] = jnp.zeros((NR, trace_steps), dtype=fdtype)
        state["trace_count"] = jnp.zeros((NR,), dtype=jnp.int32)
    if collect_en_sca:
        state["scaspe"] = scaspe_accum

    start_cell = cc  # cc_new in the reference: blocking exempt while inside

    def cond(s):
        return jnp.any(s["active"]) & (s["it"] < max_steps)

    def body(s):
        cc, clvl, fine = s["cc"], s["clvl"], s["fine"]
        act = s["active"]
        ccs = jnp.clip(cc, 0, grid.n_cells - 1)

        # flag_beam reflects the CURRENT cell (updated before deposit,
        # rt_routines.f90:1729)
        seen_other = s["seen_other"] | (act & (cc != nc) & (cc != start_cell))
        flag_beam = ~seen_other

        ccoord_c = grid.ccoord[ccs].astype(fdtype)  # (NR,3)
        csize_c = csize_lv[clvl]  # (NR,)

        # ---- calc_psel (rt_routines.f90:2307-2351) ----
        pabs = (ccoord_c - src + 0.5 * inc.astype(fdtype) * csize_c[:, None]) * inv_d
        pabs = jnp.where(inc != 0, pabs, jnp.inf)
        psel = jnp.min(pabs, axis=-1)
        isel = jnp.argmin(pabs, axis=-1).astype(jnp.int32)

        length = psel - s["prev"]
        length = jnp.where(jnp.abs(length) < 1e-5 * csize_c, 0.0, length)
        length = jnp.maximum(length, 0.0)
        has_len = length > 0

        # ---- deposit physics (rt_routines.f90:2362-2557) ----
        dref = dens_ref[ccs].astype(fdtype)  # (NR,)
        tau = dref[:, None] * kext_norm[None, :] * length[:, None]  # (NR,L)
        exp_tau = jnp.exp(-tau)
        I = s["intensity"]

        is_src_cell = cc == nc
        small = tau < 1e-8
        tau_safe = jnp.where(small, 1.0, tau)
        i_av_ext = jnp.where(small | (I == 0), I, I / tau_safe * (1.0 - exp_tau))
        # own-cell optical depth: over ray length for a point source, over
        # the full cell size for homogeneous emission (rt_routines.f90:2409-2417).
        # The point-source special case applies only in the precalc/direct
        # stages (rt_type == rtt_precalc_src / rtt_dir_src in the reference).
        ps_own = point_source and mode <= MODE_DIRECT
        if ps_own:
            tau_own = tau
        else:
            tau_own = dref[:, None] * kext_norm[None, :] * csize_i[:, None]
        exp_own = jnp.exp(-tau_own)
        sm_own = tau_own < 1e-8
        tau_own_safe = jnp.where(sm_own, 1.0, tau_own)
        if ps_own:
            i_av_own = jnp.where(sm_own | (I == 0), I, I / tau_own_safe * (1.0 - exp_own))
        else:
            i_av_own = jnp.where(
                sm_own | (I == 0), I, I / tau_own_safe**2 * (exp_own + tau_own - 1.0)
            )
        i_av = jnp.where(is_src_cell[:, None], i_av_own, i_av_ext)

        vol_f = csize_c**3
        area_f = csize_c**2
        beam_f = area_f / jnp.maximum(psel, 1e-300) ** 2

        # blocking conditions; the beam-density window
        # (deposit rt_routines.f90:2426-2534).  go_high has no nside limit;
        # go_low is disabled for nside <= 2*nside_min (allow_block=False)
        too_sparse = (beam_f / bm_par <= beam_i) & ~flag_beam
        in_window = beam_f / bm_par_max < beam_i
        dep_ok = in_window | flag_beam | (not allow_block)
        if mode == MODE_PRECALC:
            beyond = has_len & (psel > rad_lim_dist)
            go_high = has_len & ~beyond & too_sparse
            dep = ~beyond & ~(has_len & too_sparse) & (dep_ok | ~has_len)
            go_low = has_len & ~beyond & ~too_sparse & ~dep_ok
            gone = beyond
            kill_mask = jnp.zeros((NR, L), dtype=bool)
        elif mode == MODE_DIRECT:
            # ray-precision criterion: kill lambdas whose future
            # contribution is below f_U * U_LL (rt_routines.f90:2473-2491)
            u_beam = i_av * (csize_c / cs / vol_f * area_i * beam_f)[:, None]
            ull = u_fest[ccs]
            kill = u_beam < en_lim * ull
            kill_mask = (has_len & too_sparse)[:, None] & kill
            wall_hit = jnp.any(
                (ccoord_c < wall_lo[None, :]) | (ccoord_c > wall_hi[None, :]), axis=-1
            )
            I_after_kill = jnp.where(kill_mask, 0.0, I)
            any_left = jnp.any(I_after_kill > 0, axis=-1)
            go_high = has_len & too_sparse & any_left & ~wall_hit
            gone = has_len & too_sparse & ~go_high
            go_low = has_len & ~too_sparse & ~dep_ok
            dep = ~(has_len & too_sparse) & (dep_ok | ~has_len)
            beyond = jnp.zeros((NR,), dtype=bool)
        else:  # iobs modes: attenuation only, never blocked
            go_high = jnp.zeros((NR,), dtype=bool)
            go_low = jnp.zeros((NR,), dtype=bool)
            gone = jnp.zeros((NR,), dtype=bool)
            dep = jnp.ones((NR,), dtype=bool)
            kill_mask = jnp.zeros((NR, L), dtype=bool)

        do_dep = act & dep & has_len & (mode <= MODE_DIRECT)

        # deposit energy density: i_av * length / cs / vol_f * area_i * beam_i
        du = i_av * (length / cs / vol_f * area_i)[:, None] * beam_i
        u = s["u"].at[ccs].add(jnp.where(do_dep[:, None], du, 0.0))

        if collect_en_sca:
            # scattered energy created in this intersection
            # (rt_routines.f90:2509-2525); Taylor fallback for small tau
            en_ext = jnp.where(small, I * tau, I * (1.0 - exp_tau))
            en_own = jnp.where(
                sm_own,
                I * tau_own / 2.0,
                I / tau_own_safe * (exp_own + tau_own - 1.0),
            )
            en_sca = jnp.where(is_src_cell[:, None], en_own, en_ext)
            en_sca = en_sca * albedo[None, :] * area_i[:, None] * beam_i
            en_sca = jnp.where(do_dep[:, None], en_sca, 0.0)
            # per-bucket deposit: scaspe_k[cell, pix, lam] +=
            #   en_sca[ray, lam in bucket] * ffn_k[ray, pix, lam]
            s_scaspe = tuple(
                sk.at[ccs].add(
                    ffn_k * jnp.take(en_sca, idx_k, axis=1)[:, None, :]
                )
                for sk, ffn_k, idx_k in zip(s["scaspe"], ffn, scaspe_lam_idx)
            )

        if do_trace:
            tc = jnp.clip(s["trace_count"], 0, trace_steps - 1)
            rows = jnp.arange(NR)
            rec = act & has_len & (dep | (mode >= MODE_IOBS))
            trace_cells = s["trace_cells"].at[rows, tc].set(
                jnp.where(rec, cc, s["trace_cells"][rows, tc])
            )
            trace_lengths = s["trace_lengths"].at[rows, tc].set(
                jnp.where(rec, length, s["trace_lengths"][rows, tc])
            )
            trace_count = s["trace_count"] + rec.astype(jnp.int32)

        # intensity update (rt_routines.f90:2543-2555); applies on deposit
        # steps and always in the iobs modes
        I_new_ext = I * exp_tau
        I_new_own = jnp.where(sm_own, I, I / tau_own_safe * (1.0 - exp_own))
        I_dep = jnp.where(is_src_cell[:, None], I_new_own, I_new_ext)
        attenuate = act & has_len & (dep | (mode >= MODE_IOBS))
        I_next = jnp.where(attenuate[:, None], I_dep, I)
        # killed lambdas zero out + lum_lost bookkeeping
        killed_now = act[:, None] & kill_mask & (I > 0)
        lum_lost = s["lum_lost"] + jnp.sum(
            jnp.where(killed_now, i_av * beam_i * (csize_i**2)[:, None], 0.0), axis=0
        )
        I_next = jnp.where(killed_now, 0.0, I_next)

        # internal-observer stop (rt_routines.f90:1762-1770)
        if mode == MODE_IOBS_IN:
            hit_obs = act & (vec_mod >= s["prev"]) & (vec_mod <= psel)
            corr = jnp.exp(dref[:, None] * kext_norm[None, :] * (psel - vec_mod)[:, None])
            i_obs = jnp.where(hit_obs[:, None], I_next * corr, s["i_obs"])
        else:
            hit_obs = jnp.zeros((NR,), dtype=bool)
            i_obs = s["i_obs"]

        # ---- advance to the next cell (rt_routines.f90:1778-1841) ----
        sz = spl[clvl]  # fine cells per current-cell side
        fsel = jnp.take_along_axis(fine, isel[:, None], axis=1)[:, 0]
        blk = fsel // sz
        fnew_sel = jnp.where(inc[jnp.arange(NR), isel] > 0, (blk + 1) * sz, blk * sz - 1)
        out_grid = (fnew_sel < 0) | (fnew_sel >= n_fine)

        # other axes: recompute fine coords from the crossing position
        bpos = psel[:, None] * d + src + grid.modelsize / 2.0  # absolute coords
        fine_re = jnp.zeros((NR, 3), dtype=jnp.int32)
        normb = bpos
        for l in range(1, max_lvl + 1):
            b = b1 if l == 1 else b2
            digit = jnp.clip(jnp.floor(normb / csize_lv[l]).astype(jnp.int32), 0, b - 1)
            normb = normb - digit * csize_lv[l]
            fine_re = fine_re + digit * spl[l]
        # monotonicity guard: the float recompute can land exactly on a cell
        # boundary and round back *behind* a wall the ray already crossed
        # (degenerate diagonal rays through cell corners), which would
        # ping-pong forever.  Never move a coordinate against the ray
        # direction relative to the current cell's entry coordinates.
        fine_mono = jnp.where(
            inc > 0,
            jnp.maximum(fine_re, fine),
            jnp.where(inc < 0, jnp.minimum(fine_re, fine), fine_re),
        )
        sel_onehot = jax.nn.one_hot(isel, 3, dtype=jnp.int32)
        fine_next = jnp.where(sel_onehot == 1, fnew_sel[:, None], fine_mono)

        cc_next, clvl_next = _descend(grid, fine_next)

        # ---- status resolution ----
        blocked = act & (go_high | go_low)
        exited = act & out_grid & ~blocked & ~gone & ~hit_obs

        if mode == MODE_IOBS:
            i_obs = jnp.where(exited[:, None], I_next, i_obs)

        status = s["status"]
        status = jnp.where(act & go_high, ST_HIGH, status)
        status = jnp.where(act & go_low, ST_LOW, status)
        status = jnp.where(act & gone, ST_GONE, status)
        status = jnp.where(exited | hit_obs, ST_GONE, status)

        # blocking records: entry-plane values (prev, isel_old)
        rec_blk = act & (go_high | go_low)
        blk_prev = jnp.where(rec_blk, s["prev"], s["blk_prev"])
        blk_cc = jnp.where(rec_blk, cc, s["blk_cc"])
        blk_isel = jnp.where(rec_blk, s["isel_old"], s["blk_isel"])
        dsel = jnp.take_along_axis(d, jnp.clip(s["isel_old"], 0, 2)[:, None], axis=1)[:, 0]
        dplane_now = jnp.where(s["isel_old"] >= 0, s["prev"] * dsel, 0.0)
        blk_dplane = jnp.where(rec_blk, dplane_now, s["blk_dplane"])

        still_active = act & ~blocked & ~gone & ~exited & ~hit_obs

        new_state = dict(
            cc=jnp.where(still_active, cc_next, cc),
            clvl=jnp.where(still_active, clvl_next, clvl),
            fine=jnp.where(still_active[:, None], fine_next, fine),
            prev=jnp.where(still_active, psel, s["prev"]),
            isel_old=jnp.where(still_active, isel, s["isel_old"]),
            intensity=I_next,
            flag_beam=flag_beam,
            seen_other=seen_other,
            active=still_active,
            status=status,
            blk_prev=blk_prev,
            blk_cc=blk_cc,
            blk_isel=blk_isel,
            blk_dplane=blk_dplane,
            i_obs=i_obs,
            lum_lost=lum_lost,
            u=u,
            n_steps=s["n_steps"] + jnp.sum(act).astype(s["n_steps"].dtype),
            it=s["it"] + 1,
        )
        if do_trace:
            new_state["trace_cells"] = trace_cells
            new_state["trace_lengths"] = trace_lengths
            new_state["trace_count"] = trace_count
        if collect_en_sca:
            new_state["scaspe"] = s_scaspe
        return new_state

    out = jax.lax.while_loop(cond, body, state)

    lum_out = out["intensity"] * (4.0 * jnp.pi * csize_nc**2)[:, None]
    res = MarchResult(
        status=out["status"],
        lum=lum_out,
        prev=out["prev"],
        cc=out["blk_cc"],
        isel_old=out["blk_isel"],
        dplane=out["blk_dplane"],
        lum_lost=out["lum_lost"],
        i_obs=out["i_obs"],
        n_steps=out["n_steps"],
        cc_cur=out["cc"],
        isel_cur=out["isel_old"],
        seen_other=out["seen_other"],
        trace_cells=out.get("trace_cells"),
        trace_lengths=out.get("trace_lengths"),
        trace_count=out.get("trace_count"),
    )
    if collect_en_sca:
        return out["u"], res, out["scaspe"]
    return out["u"], res


def _descend(grid: Grid, fine):
    """fine coords (N,3) -> (leaf cell, level); inline copy of
    grid.octree.fine_to_cell for use inside the march body."""
    b1, b2 = grid.base
    spl = grid.fine_per_level()
    batch = fine.shape[:-1]
    child_base = jnp.broadcast_to(grid.cchild[0].astype(jnp.int32), batch)
    cell = jnp.zeros(batch, dtype=jnp.int32)
    clvl = jnp.zeros(batch, dtype=jnp.int32)
    done = jnp.zeros(batch, dtype=bool)
    finc = jnp.clip(fine, 0, grid.n_fine - 1)
    for l in range(1, grid.max_lvl + 1):
        b = b1 if l == 1 else b2
        if l == 1:
            dg = finc // int(spl[1])
        else:
            dg = (finc // int(spl[l])) % b2
        k = (dg[..., 2] * b + dg[..., 1]) * b + dg[..., 0]
        new_cell = child_base + k
        cell = jnp.where(done, cell, new_cell)
        clvl = jnp.where(done, clvl, l)
        cb = grid.cchild[jnp.clip(new_cell, 0, grid.n_cells - 1)]
        done = done | (cb == -1)
        child_base = jnp.where(done, child_base, cb)
    return cell, clvl
