"""Fast ray-march: scalar geometry loop + closed-form deposit phase.

Redesign of the hot loop (ray_tracing / calc_psel / deposit,
rt_routines.f90:1618-1857, 2307-2351, 2362-2557) that exploits a structural
property of the physics: along a ray, the per-wavelength intensity is
*separable*,

    I(lambda, step) = I0(lambda) * exp(-kext_norm(lambda) * A_step) * F_own,

where ``A_step`` is the cumulative reference-wavelength optical depth at the
step entry and ``F_own`` the (per-ray) source-cell attenuation factor.  The
per-wavelength ray-precision kills (rt_routines.f90:2473-2491) fire only at
the *terminal* blocking step, so nothing breaks the separability mid-flight.

This lets the while-loop hot path carry **only scalar per-ray state** — no
(NR, L) intensity, no (ncell, L) scatter-add per step, no u_fest row gather.
Per iteration it does pure index arithmetic plus ONE navigation-row gather,
and records a (cell, length) trace.  A second phase then computes every
deposit in closed form over the *compacted* flat entry list (sized by the
actual number of intersections, not iterations x pool width) and performs a
few large scatter-adds.  The legacy kernel paid ~0.9 ms/iteration at 8%
ray-utilization; the split design pays ~a tenth of that per iteration and
makes the deposit cost proportional to real intersections.

A further structural win: phase 2 is a pure vectorized function of
(dens, kext, albedo, I0) given the recorded geometry, i.e. the deposit and
observer intensities are differentiable by construction (the legacy design
needed a separate trace+replay pass for gradients).

Matches march.py (the legacy lock-step kernel) bit-for-bit in exact
arithmetic; tests/test_march_fast.py asserts equivalence in f64.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..grid.octree import Grid
from .march import (
    GLEPSILON,
    MODE_PRECALC,
    MODE_DIRECT,
    MODE_IOBS,
    MODE_IOBS_IN,
    ST_ACTIVE,
    ST_GONE,
    ST_HIGH,
    ST_LOW,
    MarchResult,
    RayBatch,
    _descend,
    _level_select,
    _sel3,
)

ST_SPARSE = 4  # internal: terminal low-density block, kill test pending

# profiling-only ablation switches (scripts/prof_march.py); trace-time env
import os as _os
_ABLATE = frozenset(
    t for t in _os.environ.get("DARTRAY_ABLATE", "").split(",") if t
)

# flat-deposit chunk sizes (entries per scatter round)
DEP_CHUNK = 1 << 15
DEP_CHUNK_SCA = 1 << 12


def march_fast(grid, dens_ref, kext_norm, albedo, u_fest, u_accum, rays, **kw):
    """Plain wrapper: derive static flags from concrete values, then enter
    the jitted implementation."""
    wall_lo = kw.get("wall_lo", (-np.inf,) * 3)
    wall_hi = kw.get("wall_hi", (np.inf,) * 3)
    use_walls = kw.get("mode", 0) == MODE_DIRECT and (
        any(np.isfinite(float(w)) for w in wall_lo)
        or any(np.isfinite(float(w)) for w in wall_hi)
    )
    kw.pop("dens_lambda", None)
    if "max_steps" in kw:
        kw["max_steps"] = int(kw["max_steps"])
    return _march_fast_jit(
        grid, dens_ref, kext_norm, albedo, u_fest, u_accum, rays,
        use_walls=use_walls, **kw,
    )


@partial(
    jax.jit,
    static_argnames=(
        "mode",
        "point_source",
        "max_steps",
        "trace_steps",
        "collect_en_sca",
        "scaspe_npix_hp",
        "use_walls",
    ),
)
def _march_fast_jit(
    grid: Grid,
    dens_ref,
    kext_norm,
    albedo,
    u_fest,
    u_accum,
    rays: RayBatch,
    *,
    mode: int,
    point_source: bool = False,
    beam_i=None,
    en_lim=0.0,
    rad_lim_dist=jnp.inf,
    bm_par=10.0,
    bm_par_max=200.0,
    allow_block=True,
    cs=1.0,
    wall_lo=(-jnp.inf, -jnp.inf, -jnp.inf),
    wall_hi=(jnp.inf, jnp.inf, jnp.inf),
    vec_mod=None,
    max_steps: int = 100000,
    trace_steps: int = 0,
    collect_en_sca: bool = False,
    scaspe_dirs=None,
    scaspe_g=None,
    scaspe_npix_hp=None,
    scaspe_lam_idx=None,
    scaspe_accum=None,
    nav=None,
    use_walls: bool = False,
):
    """Drop-in replacement for march.march (same returns); see march.py for
    the argument contract."""
    NR = rays.n
    L = kext_norm.shape[0]
    fdtype = rays.lum.dtype
    csize_lv_np = grid.csize_levels()
    n_fine = grid.n_fine
    max_lvl = grid.max_lvl
    b1, b2 = grid.base
    spl_np = np.asarray(grid.fine_per_level())
    half = jnp.asarray(grid.modelsize / 2.0, dtype=fdtype)
    fine_size = grid.modelsize / grid.n_fine  # python float (exact per level)
    csize_lv = jnp.asarray(csize_lv_np, dtype=fdtype)

    dens_ref = dens_ref.astype(fdtype)
    kext_norm = kext_norm.astype(fdtype)

    # --- per-ray constants -------------------------------------------------
    st_ = jnp.sin(rays.theta)
    dx = (st_ * jnp.cos(rays.phi)).astype(fdtype)
    dy = (st_ * jnp.sin(rays.phi)).astype(fdtype)
    dz = jnp.cos(rays.theta).astype(fdtype)

    def _inc(c):
        return jnp.clip((c / GLEPSILON).astype(jnp.int32), -1, 1)

    incx, incy, incz = _inc(dx), _inc(dy), _inc(dz)

    def _inv(c, i):
        return jnp.where(i != 0, 1.0 / jnp.where(c == 0, 1.0, c), jnp.inf)

    invx, invy, invz = _inv(dx, incx), _inv(dy, incy), _inv(dz, incz)

    sx = rays.src_pos[:, 0].astype(fdtype)
    sy = rays.src_pos[:, 1].astype(fdtype)
    sz = rays.src_pos[:, 2].astype(fdtype)
    nc = rays.src_cell
    csize_nc = grid.csize[nc].astype(fdtype)
    lvl_nc = grid.lvl[nc]
    area_i = csize_nc**2
    csize_i = csize_nc
    intensity0 = rays.lum / (4.0 * jnp.pi * csize_nc**2)[:, None]

    if beam_i is None:
        beam_i = jnp.asarray(4.0 * jnp.pi / 12.0, dtype=fdtype)
    beam_i = jnp.broadcast_to(jnp.asarray(beam_i, dtype=fdtype), (NR,))
    can_merge = jnp.broadcast_to(jnp.asarray(allow_block, dtype=bool), (NR,))

    # --- starting cell (find_cc_new2, rt_routines.f90:1962-2066) -----------
    prev0 = rays.prev.astype(fdtype)
    px0 = sx + prev0 * dx
    py0 = sy + prev0 * dy
    pz0 = sz + prev0 * dz
    outside = (
        (jnp.abs(px0) > half) | (jnp.abs(py0) > half) | (jnp.abs(pz0) > half)
    )

    def _refloor(px, py, pz):
        fx = jnp.zeros(px.shape, dtype=jnp.int32)
        fy = jnp.zeros(px.shape, dtype=jnp.int32)
        fz = jnp.zeros(px.shape, dtype=jnp.int32)
        for l in range(1, max_lvl + 1):
            b = b1 if l == 1 else b2
            s_l = int(spl_np[l])
            inv_c = 1.0 / csize_lv[l]
            gx = jnp.clip(jnp.floor(px * inv_c).astype(jnp.int32), 0, b - 1)
            gy = jnp.clip(jnp.floor(py * inv_c).astype(jnp.int32), 0, b - 1)
            gz = jnp.clip(jnp.floor(pz * inv_c).astype(jnp.int32), 0, b - 1)
            px = px - gx.astype(fdtype) * csize_lv[l]
            py = py - gy.astype(fdtype) * csize_lv[l]
            pz = pz - gz.astype(fdtype) * csize_lv[l]
            fx = fx + gx * s_l
            fy = fy + gy * s_l
            fz = fz + gz * s_l
        return fx, fy, fz

    fx0, fy0, fz0 = _refloor(px0 + half, py0 + half, pz0 + half)
    cc0, clvl0 = _descend(grid, fx0, fy0, fz0)
    cc_init = jnp.where(rays.fresh, nc, cc0)
    clvl_init = jnp.where(rays.fresh, lvl_nc, clvl0)

    active0 = rays.active & ~outside
    status0 = jnp.where(rays.active & outside, ST_GONE, ST_ACTIVE)
    status0 = jnp.where(~rays.active, ST_GONE, status0).astype(jnp.int32)

    wall_lo = tuple(jnp.asarray(w, dtype=fdtype) for w in wall_lo)
    wall_hi = tuple(jnp.asarray(w, dtype=fdtype) for w in wall_hi)

    if vec_mod is None:
        vec_mod = jnp.full((NR,), jnp.inf, dtype=fdtype)
    else:
        vec_mod = jnp.asarray(vec_mod, dtype=fdtype)

    iobs_mode = mode >= MODE_IOBS
    deposit_mode = mode <= MODE_DIRECT
    ps_own = point_source and deposit_mode
    K = max_steps
    do_trace = trace_steps > 0

    state = dict(
        cc=cc_init.astype(jnp.int32),
        clvl=clvl_init.astype(jnp.int32),
        fx=fx0,
        fy=fy0,
        fz=fz0,
        prev=prev0,
        isel_old=rays.isel_old.astype(jnp.int32),
        seen_other=jnp.asarray(rays.seen_other, dtype=bool),
        active=active0,
        status=status0,
        blk_prev=jnp.zeros((NR,), dtype=fdtype),
        blk_cc=jnp.zeros((NR,), dtype=jnp.int32),
        blk_isel=jnp.zeros((NR,), dtype=jnp.int32),
        blk_dplane=jnp.zeros((NR,), dtype=fdtype),
        n_it=jnp.zeros((NR,), dtype=jnp.int32),
        n_steps=jnp.zeros(
            (), dtype=jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
        ),
        it=jnp.zeros((), dtype=jnp.int32),
    )
    if deposit_mode:
        # dense per-iteration traces, transposed (step-major) so each write
        # is one row update
        state["tr_cc"] = jnp.full((K, NR), -1, dtype=jnp.int32)
        state["tr_len"] = jnp.zeros((K, NR), dtype=fdtype)
        # terminal-step record for the deferred ray-precision kill test
        state["term_len"] = jnp.zeros((NR,), dtype=fdtype)
        state["term_beamf"] = jnp.zeros((NR,), dtype=fdtype)
        state["term_wall"] = jnp.zeros((NR,), dtype=bool)
    else:
        # iobs: accumulate reference optical depth on the fly (no traces)
        state["acc_tau"] = jnp.zeros((NR,), dtype=fdtype)
        state["own_passed"] = jnp.zeros((NR,), dtype=bool)
        state["corr_x"] = jnp.zeros((NR,), dtype=fdtype)  # internal-observer
        state["hit_flag"] = jnp.zeros((NR,), dtype=bool)
        state["exited"] = jnp.zeros((NR,), dtype=bool)
    if do_trace:
        state["trace_cells"] = jnp.zeros((NR, trace_steps), dtype=jnp.int32)
        state["trace_lengths"] = jnp.zeros((NR, trace_steps), dtype=fdtype)
        state["trace_count"] = jnp.zeros((NR,), dtype=jnp.int32)

    start_cell = cc_init

    def cond(s):
        return jnp.any(s["active"]) & (s["it"] < max_steps)

    def body(s):
        cc, clvl = s["cc"], s["clvl"]
        fx, fy, fz = s["fx"], s["fy"], s["fz"]
        act = s["active"]
        ccs = jnp.clip(cc, 0, grid.n_cells - 1)

        seen_other = s["seen_other"] | (act & (cc != nc) & (cc != start_cell))
        flag_beam = ~seen_other

        # cell center and size straight from the fine coordinates — no
        # per-cell gather needed in the hot loop
        sz_c = _level_select(clvl, spl_np, jnp.int32)
        csize_c = _level_select(clvl, csize_lv_np, fdtype)
        hcs = 0.5 * csize_c
        fs = jnp.asarray(fine_size, dtype=fdtype)
        gx_c = ((fx // sz_c) * sz_c).astype(fdtype) * fs + hcs - half
        gy_c = ((fy // sz_c) * sz_c).astype(fdtype) * fs + hcs - half
        gz_c = ((fz // sz_c) * sz_c).astype(fdtype) * fs + hcs - half

        # ---- calc_psel ----
        px = jnp.where(incx != 0, (gx_c - sx + incx.astype(fdtype) * hcs) * invx, jnp.inf)
        py = jnp.where(incy != 0, (gy_c - sy + incy.astype(fdtype) * hcs) * invy, jnp.inf)
        pz = jnp.where(incz != 0, (gz_c - sz + incz.astype(fdtype) * hcs) * invz, jnp.inf)
        psel = jnp.minimum(jnp.minimum(px, py), pz)
        isel = jnp.where(px == psel, 0, jnp.where(py == psel, 1, 2)).astype(jnp.int32)

        length = psel - s["prev"]
        length = jnp.where(jnp.abs(length) < 1e-5 * csize_c, 0.0, length)
        length = jnp.maximum(length, 0.0)
        has_len = length > 0

        area_f = csize_c**2
        beam_f = area_f / jnp.maximum(psel, 1e-300) ** 2
        too_sparse = (beam_f / bm_par <= beam_i) & ~flag_beam
        in_window = beam_f / bm_par_max < beam_i
        dep_ok = in_window | flag_beam | ~can_merge

        if mode == MODE_PRECALC:
            beyond = has_len & (psel > rad_lim_dist)
            go_high = has_len & ~beyond & too_sparse
            dep = ~beyond & ~(has_len & too_sparse) & (dep_ok | ~has_len)
            go_low = has_len & ~beyond & ~too_sparse & ~dep_ok
            gone = beyond
            sparse_term = jnp.zeros((NR,), dtype=bool)
        elif mode == MODE_DIRECT:
            # terminal low-density block: the per-lambda ray-precision kill
            # (go_high vs gone) is lambda-dependent and deferred to phase 2
            sparse_term = has_len & too_sparse
            go_high = jnp.zeros((NR,), dtype=bool)
            gone = jnp.zeros((NR,), dtype=bool)
            go_low = has_len & ~too_sparse & ~dep_ok
            dep = ~sparse_term & (dep_ok | ~has_len)
        else:
            go_high = go_low = gone = sparse_term = jnp.zeros((NR,), dtype=bool)
            dep = jnp.ones((NR,), dtype=bool)

        if mode == MODE_IOBS_IN:
            hit_obs = act & (vec_mod >= s["prev"]) & (vec_mod <= psel)
        else:
            hit_obs = jnp.zeros((NR,), dtype=bool)

        new_state = dict(s)
        rec = act & has_len & (dep if deposit_mode else jnp.ones((NR,), bool))
        if deposit_mode:
            it = s["it"]
            if "notrace" not in _ABLATE:
                new_state["tr_cc"] = s["tr_cc"].at[it].set(jnp.where(rec, cc, -1))
                new_state["tr_len"] = s["tr_len"].at[it].set(
                    jnp.where(rec, length, 0.0)
                )
            if use_walls:
                wall_hit = (
                    (gx_c < wall_lo[0]) | (gx_c > wall_hi[0])
                    | (gy_c < wall_lo[1]) | (gy_c > wall_hi[1])
                    | (gz_c < wall_lo[2]) | (gz_c > wall_hi[2])
                )
            else:
                wall_hit = jnp.zeros((NR,), dtype=bool)
            new_state["term_len"] = jnp.where(sparse_term & act, length, s["term_len"])
            new_state["term_beamf"] = jnp.where(sparse_term & act, beam_f, s["term_beamf"])
            new_state["term_wall"] = jnp.where(sparse_term & act, wall_hit, s["term_wall"])
        else:
            dref_c = dens_ref[ccs]
            is_own = cc == nc
            dtau = jnp.where(rec & ~is_own, dref_c * length, 0.0)
            new_state["acc_tau"] = s["acc_tau"] + dtau
            new_state["own_passed"] = s["own_passed"] | (rec & is_own)
            if mode == MODE_IOBS_IN:
                new_state["corr_x"] = jnp.where(
                    hit_obs, dref_c * (psel - vec_mod), s["corr_x"]
                )
                new_state["hit_flag"] = s["hit_flag"] | hit_obs
        if do_trace:
            tc = jnp.clip(s["trace_count"], 0, trace_steps - 1)
            rows = jnp.arange(NR)
            new_state["trace_cells"] = s["trace_cells"].at[rows, tc].set(
                jnp.where(rec, cc, s["trace_cells"][rows, tc])
            )
            new_state["trace_lengths"] = s["trace_lengths"].at[rows, tc].set(
                jnp.where(rec, length, s["trace_lengths"][rows, tc])
            )
            new_state["trace_count"] = s["trace_count"] + rec.astype(jnp.int32)

        # ---- advance to the next cell ----
        fsel = _sel3(isel, fx, fy, fz)
        inc_sel = _sel3(isel, incx, incy, incz)
        blk = fsel // sz_c
        fnew_sel = jnp.where(inc_sel > 0, (blk + 1) * sz_c, blk * sz_c - 1)

        rx, ry, rz = _refloor(
            psel * dx + sx + half, psel * dy + sy + half, psel * dz + sz + half
        )

        def _mono(r, f, i):
            return jnp.where(i > 0, jnp.maximum(r, f),
                             jnp.where(i < 0, jnp.minimum(r, f), r))

        mx = _mono(rx, fx, incx)
        my = _mono(ry, fy, incy)
        mz = _mono(rz, fz, incz)
        fx_n = jnp.where(isel == 0, fnew_sel, mx)
        fy_n = jnp.where(isel == 1, fnew_sel, my)
        fz_n = jnp.where(isel == 2, fnew_sel, mz)

        if nav is not None:
            face = isel * 2 + (inc_sel > 0).astype(jnp.int32)
            nrow = nav[jnp.clip(ccs * 6 + face, 0, nav.shape[0] - 1)]
            nbr = nrow[:, 0]
            cbase = nrow[:, 1]
            nlvl = nrow[:, 2]
            out_grid = nbr < 0
            is_leaf = cbase < 0
            splc = _level_select(
                jnp.clip(nlvl + 1, 0, max_lvl), spl_np, jnp.int32
            )

            def _dig(f, o):
                return jnp.clip((f - o) // splc, 0, b2 - 1)

            dgx = _dig(fx_n, nrow[:, 3])
            dgy = _dig(fy_n, nrow[:, 4])
            dgz = _dig(fz_n, nrow[:, 5])
            kidx = (dgz * b2 + dgy) * b2 + dgx
            cc_next = jnp.where(is_leaf, nbr, cbase + kidx)
            clvl_next = jnp.where(is_leaf, nlvl, nlvl + 1).astype(jnp.int32)
            span_n = _level_select(clvl_next, spl_np, jnp.int32)
            ox = jnp.where(is_leaf, nrow[:, 3], nrow[:, 3] + dgx * splc)
            oy = jnp.where(is_leaf, nrow[:, 4], nrow[:, 4] + dgy * splc)
            oz = jnp.where(is_leaf, nrow[:, 5], nrow[:, 5] + dgz * splc)
            fx_n = jnp.clip(fx_n, ox, ox + span_n - 1)
            fy_n = jnp.clip(fy_n, oy, oy + span_n - 1)
            fz_n = jnp.clip(fz_n, oz, oz + span_n - 1)
        else:
            out_grid = (fnew_sel < 0) | (fnew_sel >= n_fine)
            cc_next, clvl_next = _descend(grid, fx_n, fy_n, fz_n)

        # ---- status resolution ----
        blocked = act & (go_high | go_low | sparse_term)
        exited = act & out_grid & ~blocked & ~gone & ~hit_obs

        status = s["status"]
        status = jnp.where(act & go_high, ST_HIGH, status)
        status = jnp.where(act & go_low, ST_LOW, status)
        status = jnp.where(act & sparse_term, ST_SPARSE, status)
        status = jnp.where(act & gone, ST_GONE, status)
        status = jnp.where(exited | hit_obs, ST_GONE, status)

        rec_blk = blocked
        blk_prev = jnp.where(rec_blk, s["prev"], s["blk_prev"])
        blk_cc = jnp.where(rec_blk, cc, s["blk_cc"])
        blk_isel = jnp.where(rec_blk, s["isel_old"], s["blk_isel"])
        iold = jnp.clip(s["isel_old"], 0, 2)
        dsel = _sel3(iold, dx, dy, dz)
        dplane_now = jnp.where(s["isel_old"] >= 0, s["prev"] * dsel, 0.0)
        blk_dplane = jnp.where(rec_blk, dplane_now, s["blk_dplane"])

        still_active = act & ~blocked & ~gone & ~exited & ~hit_obs
        if not deposit_mode:
            new_state["exited"] = s["exited"] | exited

        new_state.update(
            cc=jnp.where(still_active, cc_next, cc),
            clvl=jnp.where(still_active, clvl_next, clvl),
            fx=jnp.where(still_active, fx_n, fx),
            fy=jnp.where(still_active, fy_n, fy),
            fz=jnp.where(still_active, fz_n, fz),
            prev=jnp.where(still_active, psel, s["prev"]),
            isel_old=jnp.where(still_active, isel, s["isel_old"]),
            seen_other=seen_other,
            active=still_active,
            status=status,
            blk_prev=blk_prev,
            blk_cc=blk_cc,
            blk_isel=blk_isel,
            blk_dplane=blk_dplane,
            n_it=s["n_it"] + act.astype(jnp.int32),
            n_steps=s["n_steps"] + jnp.sum(act).astype(s["n_steps"].dtype),
            it=s["it"] + 1,
        )
        return new_state

    out = jax.lax.while_loop(cond, body, state)

    # ======================================================================
    # phase 2: closed-form attenuation, deposits, kill resolution
    # ======================================================================
    status = out["status"]
    u = u_accum
    scaspe = scaspe_accum
    lum_lost = jnp.zeros((L,), dtype=fdtype)
    i_obs = jnp.zeros((NR, L), dtype=fdtype)

    # source-cell attenuation factor F_own(ray, lambda)
    dens_nc = dens_ref[jnp.clip(nc, 0, grid.n_cells - 1)]

    def _guarded(expr_small, expr, small):
        return jnp.where(small, expr_small, expr)

    if deposit_mode:
        tr_cc = out["tr_cc"]  # (K, NR)
        tr_len = out["tr_len"]
        ccs_tr = jnp.clip(tr_cc, 0, grid.n_cells - 1)
        valid_tr = tr_len > 0
        if "noprep" in _ABLATE:
            x_tr = tr_len
        else:
            x_tr = jnp.where(valid_tr, dens_ref[ccs_tr] * tr_len, 0.0)  # (K, NR)
        is_own_tr = valid_tr & (tr_cc == nc[None, :])
        x_eff = jnp.where(is_own_tr, 0.0, x_tr)
        A_tr = jnp.cumsum(x_eff, axis=0) - x_eff  # exclusive
        ob_tr = (jnp.cumsum(is_own_tr.astype(jnp.int32), axis=0)
                 - is_own_tr.astype(jnp.int32)) > 0
        x_own = jnp.sum(jnp.where(is_own_tr, x_tr, 0.0), axis=0)  # (NR,)
        own_any = jnp.any(is_own_tr, axis=0)
        A_tot = jnp.sum(x_eff, axis=0)

        if ps_own:
            y_own = kext_norm[None, :] * x_own[:, None]  # (NR, L)
        else:
            y_own = kext_norm[None, :] * (dens_nc * csize_i)[:, None]
        sm_own = y_own < 1e-8
        y_safe = jnp.where(sm_own, 1.0, y_own)
        F_own = jnp.where(
            own_any[:, None],
            _guarded(1.0, (1.0 - jnp.exp(-y_own)) / y_safe, sm_own),
            1.0,
        )  # attenuation through the source cell (I_new_own, rt:2545-2551)

        I_exit = intensity0 * jnp.exp(-kext_norm[None, :] * A_tot[:, None]) * F_own

        # --- deferred ray-precision kill (deposit rt_routines.f90:2473-2491)
        if mode == MODE_DIRECT and "nokill" not in _ABLATE:
            sp = status == ST_SPARSE
            bcc = jnp.clip(out["blk_cc"], 0, grid.n_cells - 1)
            ufest_rows = u_fest[bcc].astype(fdtype)  # (NR, L)
            tau_t = kext_norm[None, :] * (dens_ref[bcc] * out["term_len"])[:, None]
            sm_t = tau_t < 1e-8
            tau_t_safe = jnp.where(sm_t, 1.0, tau_t)
            i_av_t = jnp.where(
                sm_t | (I_exit == 0), I_exit,
                I_exit / tau_t_safe * (1.0 - jnp.exp(-tau_t)),
            )
            lvl_t = grid.lvl[bcc]
            csize_t = _level_select(lvl_t, csize_lv_np, fdtype)
            u_beam = i_av_t * (
                csize_t / cs / csize_t**3 * area_i * out["term_beamf"]
            )[:, None]
            kill = u_beam < en_lim * ufest_rows
            killed_now = sp[:, None] & kill & (I_exit > 0)
            lum_lost = jnp.sum(
                jnp.where(killed_now, i_av_t * (beam_i * csize_i**2)[:, None], 0.0),
                axis=0,
            )
            I_final = jnp.where(killed_now, 0.0, I_exit)
            any_left = jnp.any(I_final > 0, axis=-1)
            status = jnp.where(
                sp, jnp.where(any_left & ~out["term_wall"], ST_HIGH, ST_GONE),
                status,
            )
        else:
            I_final = I_exit

        # --- flat compacted deposit ---------------------------------------
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(out["n_it"], dtype=jnp.int32)]
        )
        E = offsets[-1]
        C = DEP_CHUNK_SCA if collect_en_sca else DEP_CHUNK
        nchunks = (E + C - 1) // C

        flat_cc = ccs_tr.T.reshape(-1)  # (NR*K,) ray-major
        flat_len = tr_len.T.reshape(-1)
        flat_x = x_tr.T.reshape(-1)
        flat_A = A_tr.T.reshape(-1)
        flat_ob = ob_tr.T.reshape(-1)
        flat_own = is_own_tr.T.reshape(-1)

        dep_const = (1.0 / cs) * area_i * beam_i  # (NR,)

        if collect_en_sca:
            # HG weights per bucket, as in the legacy kernel (calc_ffn_arr)
            ffn = []
            for dirs_k, g_k, nhp_k in zip(scaspe_dirs, scaspe_g, scaspe_npix_hp):
                if nhp_k <= 1:
                    ffn.append(
                        jnp.ones((NR, dirs_k.shape[0], g_k.shape[0]), dtype=fdtype)
                    )
                    continue
                dk = dirs_k.astype(fdtype)
                ads = (dx[:, None] * dk[None, :, 0] + dy[:, None] * dk[None, :, 1]
                       + dz[:, None] * dk[None, :, 2])
                g = g_k.astype(fdtype)[None, None, :]
                w = (1.0 - g**2) / nhp_k * (
                    1.0 + g**2 - 2.0 * g * ads[:, :, None]
                ) ** (-1.5)
                tot = jnp.sum(w[:, :nhp_k, :], axis=1, keepdims=True)
                ffn.append(w / jnp.maximum(tot, 1e-300))
            ffn = tuple(ffn)
            albedo_f = albedo.astype(fdtype)

        def chunk_body(i, carry):
            u_c = carry[0] if collect_en_sca else carry
            e = i * C + jnp.arange(C, dtype=jnp.int32)
            in_range = e < E
            ee = jnp.clip(e, 0, NR * K - 1)
            r = jnp.clip(
                jnp.searchsorted(offsets, ee, side="right").astype(jnp.int32) - 1,
                0, NR - 1,
            )
            k = ee - offsets[r]
            fe = jnp.clip(r * K + k, 0, NR * K - 1)
            cc_e = flat_cc[fe]
            len_e = flat_len[fe]
            x_e = flat_x[fe]
            A_e = flat_A[fe]
            ob_e = flat_ob[fe]
            own_e = flat_own[fe]
            ok = in_range & (len_e > 0)

            I0_e = intensity0[r]  # (C, L)
            F_e = jnp.where(ob_e[:, None], F_own[r], 1.0)
            I_e = I0_e * jnp.exp(-kext_norm[None, :] * A_e[:, None]) * F_e

            tau_e = kext_norm[None, :] * x_e[:, None]
            sm_e = tau_e < 1e-8
            tau_se = jnp.where(sm_e, 1.0, tau_e)
            i_av_ext = jnp.where(
                sm_e | (I_e == 0), I_e, I_e / tau_se * (1.0 - jnp.exp(-tau_e))
            )
            if ps_own:
                i_av = i_av_ext  # own-cell formula coincides (tau_own = tau)
            else:
                yo = y_own[r]
                sm_o = yo < 1e-8
                yo_s = jnp.where(sm_o, 1.0, yo)
                i_av_own = jnp.where(
                    sm_o | (I_e == 0), I_e,
                    I_e / yo_s**2 * (jnp.exp(-yo) + yo - 1.0),
                )
                i_av = jnp.where(own_e[:, None], i_av_own, i_av_ext)

            lvl_e = grid.lvl[cc_e]
            csz_e = _level_select(lvl_e, csize_lv_np, fdtype)
            du = i_av * (len_e / csz_e**3 * dep_const[r])[:, None]
            du = jnp.where(ok[:, None], du, 0.0)
            u_c = u_c.at[cc_e].add(du)

            if collect_en_sca:
                en_ext = jnp.where(
                    sm_e, I_e * tau_e, I_e * (1.0 - jnp.exp(-tau_e))
                )
                if ps_own:
                    en_own = jnp.where(
                        sm_e, I_e * tau_e / 2.0,
                        I_e / tau_se * (jnp.exp(-tau_e) + tau_e - 1.0),
                    )
                else:
                    yo = y_own[r]
                    sm_o = yo < 1e-8
                    yo_s = jnp.where(sm_o, 1.0, yo)
                    en_own = jnp.where(
                        sm_o, I_e * yo / 2.0,
                        I_e / yo_s * (jnp.exp(-yo) + yo - 1.0),
                    )
                en_sca = jnp.where(own_e[:, None], en_own, en_ext)
                en_sca = en_sca * albedo_f[None, :] * (area_i[r] * beam_i[r])[:, None]
                en_sca = jnp.where(ok[:, None], en_sca, 0.0)
                sc_new = tuple(
                    sk.at[cc_e].add(
                        ffn_k[r] * jnp.take(en_sca, idx_k, axis=1)[:, None, :]
                    )
                    for sk, ffn_k, idx_k in zip(carry[1], ffn, scaspe_lam_idx)
                )
                return (u_c, sc_new)
            return u_c

        if "nodep" not in _ABLATE:
            if collect_en_sca:
                u, scaspe = jax.lax.fori_loop(0, nchunks, chunk_body, (u, scaspe))
            else:
                u = jax.lax.fori_loop(0, nchunks, chunk_body, u)

    else:
        # iobs modes: closed-form attenuation
        y_own = kext_norm[None, :] * (dens_nc * csize_i)[:, None]
        sm_own = y_own < 1e-8
        y_safe = jnp.where(sm_own, 1.0, y_own)
        F_own = jnp.where(
            out["own_passed"][:, None],
            _guarded(1.0, (1.0 - jnp.exp(-y_own)) / y_safe, sm_own),
            1.0,
        )
        I_final = intensity0 * jnp.exp(
            -kext_norm[None, :] * out["acc_tau"][:, None]
        ) * F_own
        if mode == MODE_IOBS_IN:
            # partial-cell correction rolls the full-cell attenuation of the
            # hit cell back to the observer position (rt_routines.f90:1762-1770)
            corr = jnp.exp(kext_norm[None, :] * out["corr_x"][:, None])
            i_obs = jnp.where(out["hit_flag"][:, None], I_final * corr, i_obs)
        else:
            i_obs = jnp.where(out["exited"][:, None], I_final, i_obs)

    lum_out = I_final * (4.0 * jnp.pi * csize_nc**2)[:, None]

    MP = max(NR, L)

    def _padrow(v, dt):
        return jnp.zeros((MP,), dtype=dt).at[: v.shape[0]].set(v)

    packed_i = jnp.stack([
        _padrow(status, jnp.int32),
        _padrow(out["blk_cc"], jnp.int32),
        _padrow(out["blk_isel"], jnp.int32),
        _padrow(out["cc"], jnp.int32),
        _padrow(out["isel_old"], jnp.int32),
        _padrow(out["seen_other"].astype(jnp.int32), jnp.int32),
        jnp.broadcast_to(out["n_steps"].astype(jnp.int32), (MP,)),
    ])
    packed_f = jnp.stack([
        _padrow(out["prev"], fdtype), _padrow(out["blk_dplane"], fdtype),
        _padrow(lum_lost, fdtype),
    ])
    packed_all = (
        jnp.concatenate(
            [packed_i, jax.lax.bitcast_convert_type(packed_f, jnp.int32)]
        )
        if fdtype == jnp.float32
        else None
    )
    res = MarchResult(
        status=status,
        lum=lum_out,
        prev=out["prev"],
        cc=out["blk_cc"],
        isel_old=out["blk_isel"],
        dplane=out["blk_dplane"],
        lum_lost=lum_lost,
        i_obs=i_obs,
        n_steps=out["n_steps"],
        cc_cur=out["cc"],
        isel_cur=out["isel_old"],
        seen_other=out["seen_other"],
        trace_cells=out.get("trace_cells"),
        trace_lengths=out.get("trace_lengths"),
        trace_count=out.get("trace_count"),
        packed_i=packed_i,
        packed_f=packed_f,
        packed_all=packed_all,
    )
    if collect_en_sca:
        return u, res, scaspe
    return u, res
