"""Persistent-pool ray march: the device-resident hot loop.

Third-generation kernel for the field stages (precalc/direct), replacing
the round-trip-per-nside-level structure of rays.run_rounds + march_fast
with ONE device-resident loop (the round-2 verdict's top item: a
"fully device-resident, compaction-free kernel" for
rt_routines.f90:1618-1857, 2362-2557 + the ray ladder of main_dir_loop
rt:1343-1467 / ray_list.f90).

Design:

* a fixed pool of NR lanes marches one cell-intersection per iteration;
  lanes whose ray finishes are REFILLED in-loop from a device-resident
  FIFO of pending rays, so utilization stays ~100% regardless of the
  per-ray path-length spread (the lock-step kernels pay for the slowest
  ray of every batch);
* rays are "records" in a ring buffer consumed in creation order
  (the FIFO is implicit: qhead..rptr are the pending ids); blocked-high
  rays spawn their 4 children ON DEVICE (HEALPix child pixels + pix2ang
  at 2x nside — define_next_level rt:2745, create_high_ray_list
  ray_list.f90:71) — no host round trip per ladder level;
* the per-wavelength ray-precision kill (deposit rt:2473-2491) runs
  in-loop from the separable intensity I(lambda) = I0(lambda)
  e^{-kext_norm(lambda) A} F_own — the loop carries only the SCALAR
  reference-depth accumulator A per lane;
* deposits are recorded as flat (cell, length, x, A, record) entries —
  compacted by construction, sized by real intersections — and evaluated
  in closed form after the loop (march_fast's phase-2 math);
* blocked-low rays (merge candidates, ray_list.f90:210-296) are exported
  to a bounded buffer; the (rare) 4->1 merge grouping stays on the host
  between kernel calls (rays.merge_low).

One kernel call runs up to K_MAX iterations or until a buffer fills; the
host driver (run_pool_stage) loops on a single scalar readback, so a
stage is O(entries/E_CAP) host syncs instead of O(ladder levels x
continuation rounds).
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..grid.octree import Grid
from .. import healpix as hp
from .march import (
    GLEPSILON,
    MODE_PRECALC,
    MODE_DIRECT,
    _descend,
    _level_select,
    _sel3,
)
from .rays import NSIDE_MIN

NR_DEFAULT = 16384  # pool lanes (RUNS/ROUND3_NOTES.md fix #2)
K_MAX = 512  # loop iterations per kernel call
E_CAP_FACTOR = 64  # entry buffer = E_CAP_FACTOR * NR
B_CAP_MIN = 1 << 14  # blocked-low export rows per call (>= 2*NR)


# record float rows (rec_f) / int rows (rec_i): ONE scatter per push/spawn
# instead of one per field (XLA TPU scatters carry fixed per-op cost — the
# unpacked layout spent ~9 ms/iteration on 68 tiny scatters)
RF_TH, RF_PH, RF_SX, RF_SY, RF_SZ, RF_BEAM, RF_CSN, RF_PREV0, RF_OWNB, \
    RF_XOWN = range(10)
NF = 10
RI_NC, RI_IPIX, RI_NSIDE, RI_ISEL, RI_FLAGS, RI_SRC = range(6)
NI = 6
F_FRESH, F_SEEN, F_NOMERGE = 1, 2, 4


def make_state(grid: Grid, L: int, NR: int = NR_DEFAULT, R: int = 1 << 16,
               fdtype=jnp.float32):
    """Fresh device state: empty record ring, empty lanes, empty buffers."""
    E = E_CAP_FACTOR * NR
    z = lambda shape, dt: jnp.zeros(shape, dtype=dt)
    state = dict(
        # record ring
        qhead=jnp.zeros((), jnp.int32),
        rptr=jnp.zeros((), jnp.int32),
        # lanes
        slot=jnp.full((NR,), -1, jnp.int32),
        cc=z((NR,), jnp.int32), clvl=z((NR,), jnp.int32),
        fx=z((NR,), jnp.int32), fy=z((NR,), jnp.int32), fz=z((NR,), jnp.int32),
        prev=z((NR,), fdtype), isel_old=jnp.full((NR,), -1, jnp.int32),
        seen=z((NR,), bool), A=z((NR,), fdtype), own_any=z((NR,), bool),
        dx=z((NR,), fdtype), dy=z((NR,), fdtype), dz=z((NR,), fdtype),
        invx=z((NR,), fdtype), invy=z((NR,), fdtype), invz=z((NR,), fdtype),
        incx=z((NR,), jnp.int32), incy=z((NR,), jnp.int32), incz=z((NR,), jnp.int32),
        lsx=z((NR,), fdtype), lsy=z((NR,), fdtype), lsz=z((NR,), fdtype),
        lnc=z((NR,), jnp.int32), lcsn=z((NR,), fdtype), lbeam=z((NR,), fdtype),
        lI0=z((NR, L), fdtype), lxown=z((NR,), fdtype), lownb=z((NR,), fdtype),
        lcm=z((NR,), bool), lsc=z((NR,), jnp.int32),
        # entry buffers (rows: len, x, A | cc, rec | own, ob)
        e_f=z((3, E), fdtype), e_i=z((2, E), jnp.int32),
        e_b=z((2, E), bool),
        e_ptr=jnp.zeros((), jnp.int32),
        # blocked-low export (rows: prev, dpl | rec, cc, isel)
        bl_fm=z((2, max(B_CAP_MIN, 2 * NR)), fdtype),
        # rows: rec, cc, isel, is_high (blocked-HIGH rays divert here when
        # the record ring has no spawn room; the host splits them)
        bl_im=z((4, max(B_CAP_MIN, 2 * NR)), jnp.int32),
        bl_I=z((max(B_CAP_MIN, 2 * NR), L), fdtype),
        bl_ptr=jnp.zeros((), jnp.int32),
        # stats
        n_steps=jnp.zeros((), jnp.int32),
        lum_lost=z((L,), fdtype),
    )
    state["rec_f"] = z((NF, R), fdtype)
    state["rec_i"] = z((NI, R), jnp.int32)
    state["rec_I0"] = z((R, L), fdtype)
    # own-cell reference-depth accumulator, SEPARATE from rec_f: chaining
    # a row-indexed .at[].add with a column .at[].set on the same array in
    # one loop iteration miscompiles in XLA for update widths >= 4*8192
    # (identical silent corruption on CPU and TPU; RUNS/r4 round-4 notes)
    state["rec_xo"] = z((R,), fdtype)
    return state


@partial(jax.jit, donate_argnums=(0,))
def push_records(state, new_f, new_i, new_I0, n_new):
    """Append n_new records (host-assembled slabs, padded to a fixed
    width) at rptr.  new_f: (NF, W) float rows (RF_* order); new_i:
    (NI, W) int rows (RI_* order); new_I0: (W, L)."""
    R = state["rec_f"].shape[1]
    W = new_I0.shape[0]
    ids = (state["rptr"] + jnp.arange(W, dtype=jnp.int32))
    pos = jnp.where(jnp.arange(W) < n_new, ids % R, R)  # drop padding
    state["rec_f"] = state["rec_f"].at[:, pos].set(
        new_f.astype(state["rec_f"].dtype), mode="drop")
    state["rec_i"] = state["rec_i"].at[:, pos].set(new_i, mode="drop")
    state["rec_I0"] = state["rec_I0"].at[pos].set(
        new_I0.astype(state["rec_I0"].dtype), mode="drop")
    state["rec_xo"] = state["rec_xo"].at[pos].set(0.0, mode="drop")
    state["rptr"] = state["rptr"] + n_new.astype(jnp.int32)
    return state


@jax.jit
def _gather_bl(state):
    """Device-side gather of the blocked-low export rows + their record
    fields (one small transfer instead of pulling whole record arrays)."""
    R = state["rec_f"].shape[1]
    rid = state["bl_im"][0] % R
    gf = state["rec_f"][:, rid]
    gi = state["rec_i"][:, rid]
    return dict(
        sx=gf[RF_SX], sy=gf[RF_SY], sz=gf[RF_SZ], nc=gi[RI_NC],
        src=gi[RI_SRC], ipix=gi[RI_IPIX], th=gf[RF_TH], ph=gf[RF_PH],
        nside=gi[RI_NSIDE], csn=gf[RF_CSN],
        lum=state["bl_I"] * (4.0 * jnp.pi * gf[RF_CSN] ** 2)[:, None],
        prev=state["bl_fm"][0], cc=state["bl_im"][1],
        isel=state["bl_im"][2], dpl=state["bl_fm"][1],
        high=state["bl_im"][3],
    )


def _min_live(state):
    slot = state["slot"]
    live = jnp.where(slot >= 0, slot, jnp.iinfo(jnp.int32).max)
    return jnp.minimum(jnp.min(live), state["qhead"])


@jax.jit
def _status(state):
    """Packed driver status: ONE device->host transfer per driver loop
    (each separate scalar readback costs a full tunnel round trip)."""
    n_act = jnp.sum((state["slot"] >= 0).astype(jnp.int32))
    return jnp.stack([
        state["rptr"], state["qhead"], state["bl_ptr"], n_act,
        _min_live(state), state["n_steps"],
    ])


@partial(
    jax.jit,
    static_argnames=("mode", "point_source", "use_walls", "k_max",
                     "scaspe_npix_hp"),
    donate_argnums=(5, 6),
)
def pool_march(
    grid: Grid,
    dens_ref,
    kext_norm,
    albedo,
    u_fest,
    u_accum,
    state,
    *,
    mode: int,
    point_source: bool = False,
    en_lim=0.0,
    rad_lim_dist=jnp.inf,
    bm_par=10.0,
    bm_par_max=200.0,
    cs=1.0,
    wall_lo=(-jnp.inf,) * 3,
    wall_hi=(jnp.inf,) * 3,
    nav=None,
    use_walls: bool = False,
    k_max: int = K_MAX,
    scaspe_accum=None,  # tuple of FLAT (ncell, P_k*L_k) accumulators
    scaspe_dirs=None,  # tuple of (P_k, 3) direction unit vectors
    scaspe_g=None,  # tuple of (L_k,) HG asymmetry per bucket
    scaspe_npix_hp=None,  # STATIC tuple of ints
    scaspe_lam_idx=None,  # tuple of (L_k,) int32 wavelength indices
):
    """One kernel call: march until K_MAX iterations / a buffer fills /
    all work drains, then evaluate every recorded deposit.  Returns
    (u_accum', state')."""
    NR = state["slot"].shape[0]
    L = kext_norm.shape[0]
    fdtype = state["prev"].dtype
    R = state["rec_f"].shape[1]
    E = state["e_f"].shape[1]
    B_CAP = state["bl_fm"].shape[1]
    csize_lv_np = grid.csize_levels()
    n_fine = grid.n_fine
    max_lvl = grid.max_lvl
    b1, b2 = grid.base
    spl_np = np.asarray(grid.fine_per_level())
    half = jnp.asarray(grid.modelsize / 2.0, dtype=fdtype)
    fine_size = grid.modelsize / grid.n_fine
    csize_lv = jnp.asarray(csize_lv_np, dtype=fdtype)

    dens_ref = dens_ref.astype(fdtype)
    kext_norm = kext_norm.astype(fdtype)
    wall_lo = tuple(jnp.asarray(w, dtype=fdtype) for w in wall_lo)
    wall_hi = tuple(jnp.asarray(w, dtype=fdtype) for w in wall_hi)
    en_lim = jnp.asarray(en_lim, dtype=fdtype)
    iarange = jnp.arange(NR, dtype=jnp.int32)

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

    def refill(s):
        """Pop pending records into free lanes and initialize them."""
        free = s["slot"] < 0
        n_free = jnp.sum(free.astype(jnp.int32))
        n_pend = s["rptr"] - s["qhead"]
        n_take = jnp.minimum(n_free, n_pend).astype(jnp.int32)
        rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        take = free & (rank < n_take)
        rid = (s["qhead"] + rank) % R  # physical slot
        rid_log = s["qhead"] + rank  # logical id (stored in lane)
        ridm = jnp.where(take, rid, 0)
        gf = s["rec_f"][:, ridm]  # (NF, NR)
        gi = s["rec_i"][:, ridm]  # (NI, NR)

        th, ph = gf[RF_TH], gf[RF_PH]
        st_ = jnp.sin(th)
        dx = (st_ * jnp.cos(ph)).astype(fdtype)
        dy = (st_ * jnp.sin(ph)).astype(fdtype)
        dz = jnp.cos(th).astype(fdtype)

        def _inc(c):
            return jnp.clip((c / GLEPSILON).astype(jnp.int32), -1, 1)

        incx, incy, incz = _inc(dx), _inc(dy), _inc(dz)

        def _inv(c, i):
            return jnp.where(i != 0, 1.0 / jnp.where(c == 0, 1.0, c), jnp.inf)

        invx, invy, invz = _inv(dx, incx), _inv(dy, incy), _inv(dz, incz)
        sx, sy, sz = gf[RF_SX], gf[RF_SY], gf[RF_SZ]
        prev0 = gf[RF_PREV0]
        flags = gi[RI_FLAGS]
        fresh = (flags & F_FRESH) != 0
        px0 = sx + prev0 * dx
        py0 = sy + prev0 * dy
        pz0 = sz + prev0 * dz
        outside = (
            (jnp.abs(px0) > half) | (jnp.abs(py0) > half) | (jnp.abs(pz0) > half)
        )
        fx0, fy0, fz0 = _refloor(px0 + half, py0 + half, pz0 + half)
        cc0, clvl0 = _descend(grid, fx0, fy0, fz0)
        nc = gi[RI_NC]
        lvl_nc = grid.lvl[jnp.clip(nc, 0, grid.n_cells - 1)]
        cc_i = jnp.where(fresh, nc, cc0)
        clvl_i = jnp.where(fresh, lvl_nc, clvl0)
        ok = take & ~outside  # rays starting outside just vanish

        def u(cur, new, m=None):
            return jnp.where(take if m is None else m, new, cur)

        s2 = dict(s)
        s2.update(
            slot=jnp.where(ok, rid_log, jnp.where(take, -1, s["slot"])),
            cc=u(s["cc"], cc_i), clvl=u(s["clvl"], clvl_i),
            fx=u(s["fx"], fx0), fy=u(s["fy"], fy0), fz=u(s["fz"], fz0),
            prev=u(s["prev"], prev0),
            isel_old=u(s["isel_old"], gi[RI_ISEL]),
            seen=u(s["seen"], (flags & F_SEEN) != 0),
            A=u(s["A"], jnp.zeros_like(prev0)),
            own_any=u(s["own_any"], jnp.zeros_like(take)),
            dx=u(s["dx"], dx), dy=u(s["dy"], dy), dz=u(s["dz"], dz),
            invx=u(s["invx"], invx), invy=u(s["invy"], invy), invz=u(s["invz"], invz),
            incx=u(s["incx"], incx), incy=u(s["incy"], incy), incz=u(s["incz"], incz),
            lsx=u(s["lsx"], sx), lsy=u(s["lsy"], sy), lsz=u(s["lsz"], sz),
            lnc=u(s["lnc"], nc), lcsn=u(s["lcsn"], gf[RF_CSN]),
            lbeam=u(s["lbeam"], gf[RF_BEAM]),
            lI0=jnp.where(take[:, None], s["rec_I0"][ridm], s["lI0"]),
            lxown=u(s["lxown"], jnp.zeros_like(prev0)),
            lownb=u(s["lownb"], gf[RF_OWNB]),
            # rays at nside <= 2*nside_min never block low (deposit
            # rt_routines.f90:2494; rays._to_batch can_merge bit); reco
            # leftovers that failed a full merge pass deposit instead of
            # re-blocking at the same plane forever (the reference's ladder
            # reaches the nside floor and stops blocking, rt:2494)
            lcm=u(s["lcm"], (gi[RI_NSIDE] > 2 * NSIDE_MIN)
                  & ((flags & F_NOMERGE) == 0)),
            lsc=u(s["lsc"], cc_i),  # start cell: flag_beam holds until left
            qhead=(s["qhead"] + n_take).astype(jnp.int32),
        )
        return s2

    deposit_mode = True  # this kernel only serves the deposit modes

    def _live_min(s):
        # ring-liveness bound: a record stays live while an active lane, an
        # un-evaluated deposit entry (phase 2 reads rec_I0/rec_f) or a
        # blocked export row (host _gather_bl reads it after the call)
        # still references it — not just the pending window qhead..rptr
        return jnp.minimum(
            jnp.minimum(_min_live(s), s["e_min"]), s["bl_min"]
        )

    def cond(s):
        has_work = jnp.any(s["slot"] >= 0) | (s["qhead"] < s["rptr"])
        room_e = s["e_ptr"] <= E - NR
        # no room_r term: when the ring lacks spawn room, blocked-high
        # rays divert to the host export instead (guaranteed drain)
        room_b = s["bl_ptr"] <= B_CAP - NR
        return has_work & room_e & room_b & (s["it"] < k_max)

    def body(s):
        s = jax.lax.cond(
            (s["qhead"] < s["rptr"]) & jnp.any(s["slot"] < 0),
            refill, lambda x: x, s,
        )
        act = s["slot"] >= 0
        cc, clvl = s["cc"], s["clvl"]
        fx, fy, fz = s["fx"], s["fy"], s["fz"]
        ccs = jnp.clip(cc, 0, grid.n_cells - 1)
        nc = s["lnc"]

        seen_other = s["seen"] | (act & (cc != nc) & (cc != s["lsc"]))
        flag_beam = ~seen_other

        sz_c = _level_select(clvl, spl_np, jnp.int32)
        csize_c = _level_select(clvl, csize_lv_np, fdtype)
        hcs = 0.5 * csize_c
        fs = jnp.asarray(fine_size, dtype=fdtype)
        gx_c = ((fx // sz_c) * sz_c).astype(fdtype) * fs + hcs - half
        gy_c = ((fy // sz_c) * sz_c).astype(fdtype) * fs + hcs - half
        gz_c = ((fz // sz_c) * sz_c).astype(fdtype) * fs + hcs - half

        sx, sy, sz = s["lsx"], s["lsy"], s["lsz"]
        incx, incy, incz = s["incx"], s["incy"], s["incz"]
        px = jnp.where(incx != 0, (gx_c - sx + incx.astype(fdtype) * hcs) * s["invx"], jnp.inf)
        py = jnp.where(incy != 0, (gy_c - sy + incy.astype(fdtype) * hcs) * s["invy"], jnp.inf)
        pz = jnp.where(incz != 0, (gz_c - sz + incz.astype(fdtype) * hcs) * s["invz"], jnp.inf)
        psel = jnp.minimum(jnp.minimum(px, py), pz)
        isel = jnp.where(px == psel, 0, jnp.where(py == psel, 1, 2)).astype(jnp.int32)

        length = psel - s["prev"]
        length = jnp.where(jnp.abs(length) < 1e-5 * csize_c, 0.0, length)
        length = jnp.maximum(length, 0.0)
        has_len = length > 0

        beam_i = s["lbeam"]
        area_f = csize_c**2
        beam_f = area_f / jnp.maximum(psel, 1e-300) ** 2
        too_sparse = (beam_f / bm_par <= beam_i) & ~flag_beam
        in_window = beam_f / bm_par_max < beam_i
        dep_ok = in_window | flag_beam | ~s["lcm"]

        if mode == MODE_PRECALC:
            beyond = has_len & (psel > rad_lim_dist)
            go_high = has_len & ~beyond & too_sparse
            dep = ~beyond & ~(has_len & too_sparse) & (dep_ok | ~has_len)
            go_low = has_len & ~beyond & ~too_sparse & ~dep_ok
            gone = beyond
            sparse_term = go_high  # same event: split (no kill in precalc)
        else:
            sparse_term = has_len & too_sparse
            go_high = jnp.zeros((NR,), dtype=bool)
            gone = jnp.zeros((NR,), dtype=bool)
            go_low = has_len & ~too_sparse & ~dep_ok
            dep = ~sparse_term & (dep_ok | ~has_len)

        dens_c = dens_ref[ccs]
        x_e = dens_c * length
        is_own = cc == nc

        # --- record the deposit entry ---------------------------------
        rec = act & has_len & dep
        rank = jnp.cumsum(rec.astype(jnp.int32)) - 1
        pos = jnp.where(rec, s["e_ptr"] + rank, E)
        s_new = dict(s)
        s_new["e_f"] = s["e_f"].at[:, pos].set(
            jnp.stack([length, x_e, s["A"]]), mode="drop")
        s_new["e_i"] = s["e_i"].at[:, pos].set(
            jnp.stack([cc, s["slot"]]), mode="drop")
        s_new["e_b"] = s["e_b"].at[:, pos].set(
            jnp.stack([is_own, s["own_any"]]), mode="drop")
        s_new["e_ptr"] = (s["e_ptr"]
                          + jnp.sum(rec.astype(jnp.int32))).astype(jnp.int32)
        imax = jnp.iinfo(jnp.int32).max
        s_new["e_min"] = jnp.minimum(
            s["e_min"], jnp.min(jnp.where(rec, s["slot"], imax)))

        # separable-intensity accumulators
        A_new = s["A"] + jnp.where(rec & ~is_own, x_e, 0.0)
        xown_new = s["lxown"] + jnp.where(rec & is_own, x_e, 0.0)
        own_new = s["own_any"] | (rec & is_own)
        # persist x_own into the record (phase 2 reads it per record)
        ridp = jnp.where(rec & is_own, s["slot"] % R, R)
        # persist x_own into rec_xo with ONE combined scatter-add: the
        # own-cell contributions plus a "reset to zero" of the slots about
        # to hold spawned children (ring reuse leaves stale values there;
        # the index sets are disjoint — children ids are fresh, own-adds
        # target live lanes' records).  Deferred below once cidf is known.

        if use_walls:
            wall_hit = (
                (gx_c < wall_lo[0]) | (gx_c > wall_hi[0])
                | (gy_c < wall_lo[1]) | (gy_c > wall_hi[1])
                | (gz_c < wall_lo[2]) | (gz_c > wall_hi[2])
            )
        else:
            wall_hit = jnp.zeros((NR,), dtype=bool)

        # --- blocked-high: in-loop kill + split -----------------------
        blockish = act & (sparse_term | go_low)
        y_own = kext_norm[None, :] * jnp.where(
            point_source, xown_new, s["lownb"]
        )[:, None]
        sm_o = y_own < 1e-8
        y_safe = jnp.where(sm_o, 1.0, y_own)
        F_own = jnp.where(
            own_new[:, None],
            jnp.where(sm_o, 1.0, (1.0 - jnp.exp(-y_own)) / y_safe),
            1.0,
        )
        I_exit = s["lI0"] * jnp.exp(-kext_norm[None, :] * A_new[:, None]) * F_own

        if mode == MODE_DIRECT:
            tau_t = kext_norm[None, :] * (dens_c * length)[:, None]
            sm_t = tau_t < 1e-8
            tau_ts = jnp.where(sm_t, 1.0, tau_t)
            i_av_t = jnp.where(
                sm_t | (I_exit == 0), I_exit,
                I_exit / tau_ts * (1.0 - jnp.exp(-tau_t)),
            )
            ufest_rows = u_fest[ccs].astype(fdtype)
            u_beam = i_av_t * (
                csize_c / cs / csize_c**3 * s["lcsn"]**2 * beam_f
            )[:, None]
            kill = u_beam < en_lim * ufest_rows
            killed_now = (act & sparse_term)[:, None] & kill & (I_exit > 0)
            s_new["lum_lost"] = s["lum_lost"] + jnp.sum(
                jnp.where(killed_now,
                          i_av_t * (beam_i * s["lcsn"]**2)[:, None], 0.0),
                axis=0,
            )
            I_child = jnp.where(killed_now, 0.0, I_exit)
            split_req = act & sparse_term & jnp.any(I_child > 0, axis=-1) & ~wall_hit
            gone = gone | (act & sparse_term & ~split_req)
        else:
            I_child = I_exit
            split_req = act & go_high

        # on-device spawn only while the ring has room for a worst-case
        # iteration (4*NR children); otherwise the blocked-high rays are
        # exported and the HOST spawns the children (rays.split_high) —
        # the loop never deadlocks on a full ring
        spawn_ok = (s["rptr"] + 4 * NR - _live_min(s)) < R
        split_now = split_req & spawn_ok
        divert_hi = split_req & ~spawn_ok

        # spawn 4 children per split lane: ONE batched (4*NR) scatter per
        # record matrix instead of 17 per child.  The whole spawn block is
        # under lax.cond — most iterations have zero splits and skip the
        # pix2ang + three wide scatters entirely.
        n_h = jnp.sum(split_now.astype(jnp.int32))
        iold = jnp.clip(s["isel_old"], 0, 2)
        dsel = _sel3(iold, s["dx"], s["dy"], s["dz"])
        dplane_now = jnp.where(s["isel_old"] >= 0, s["prev"] * dsel, 0.0)

        def _spawn(ops):
            rec_f_c, rec_i_c, rec_I0_c, rec_xo_c = ops
            hrank = jnp.cumsum(split_now.astype(jnp.int32)) - 1
            base = s["rptr"] + 4 * hrank
            pslot = jnp.where(split_now, s["slot"] % R, 0)
            child_nside = 2 * s["rec_i"][RI_NSIDE, pslot]
            parent_ipix = s["rec_i"][RI_IPIX, pslot]
            k4 = jnp.arange(4, dtype=jnp.int32)[:, None]  # (4, 1)
            cid = jnp.where(split_now[None, :], (base[None, :] + k4) % R, R)
            cpix = 4 * parent_ipix[None, :] + k4  # (4, NR)
            ns4 = jnp.broadcast_to(child_nside[None, :], (4, NR))
            cth, cph = hp._pix2ang_nest_impl(
                jnp.maximum(ns4.reshape(-1), 1), cpix.reshape(-1)
            )
            B4 = lambda a: jnp.broadcast_to(a[None, :], (4, NR)).reshape(-1)
            child_f = jnp.stack([
                cth.astype(fdtype), cph.astype(fdtype),
                B4(s["lsx"]), B4(s["lsy"]), B4(s["lsz"]),
                (4.0 * jnp.pi / (12.0 * ns4.astype(fdtype) ** 2)).reshape(-1),
                B4(s["lcsn"]), B4(s["prev"]), B4(s["lownb"]),
                jnp.zeros((4 * NR,), fdtype),
            ])  # (NF, 4*NR) in RF_* order
            child_i = jnp.stack([
                B4(nc), cpix.reshape(-1), ns4.reshape(-1), B4(s["isel_old"]),
                jnp.zeros((4 * NR,), jnp.int32),
                B4(s["rec_i"][RI_SRC, pslot]),
            ])  # (NI, 4*NR) in RI_* order
            cidf = cid.reshape(-1)
            rec_f_c = rec_f_c.at[:, cidf].set(child_f, mode="drop")
            rec_i_c = rec_i_c.at[:, cidf].set(child_i, mode="drop")
            rec_I0_c = rec_I0_c.at[cidf].set(
                jnp.broadcast_to(I_child[None], (4, NR, L)).reshape(-1, L),
                mode="drop")
            # the one rec_xo scatter-add: own-cell accumulation + child
            # reset (reset expressed as add(-old) so the array sees a
            # single scatter op per iteration — see make_state note)
            cid_cl = jnp.clip(cidf, 0, R - 1)
            xo_idx = jnp.concatenate([ridp, cidf])
            xo_val = jnp.concatenate([
                jnp.where(rec & is_own, x_e, 0.0),
                jnp.where(cidf < R, -rec_xo_c[cid_cl], 0.0),
            ])
            rec_xo_c = rec_xo_c.at[xo_idx].add(xo_val, mode="drop")
            return rec_f_c, rec_i_c, rec_I0_c, rec_xo_c

        def _no_spawn(ops):
            rec_f_c, rec_i_c, rec_I0_c, rec_xo_c = ops
            rec_xo_c = rec_xo_c.at[ridp].add(
                jnp.where(rec & is_own, x_e, 0.0), mode="drop")
            return rec_f_c, rec_i_c, rec_I0_c, rec_xo_c

        (s_new["rec_f"], s_new["rec_i"], s_new["rec_I0"],
         s_new["rec_xo"]) = jax.lax.cond(
            n_h > 0, _spawn, _no_spawn,
            (s_new["rec_f"], s_new["rec_i"], s_new["rec_I0"], s["rec_xo"]),
        )
        s_new["rptr"] = (s["rptr"] + 4 * n_h).astype(jnp.int32)

        # --- blocked export: merge candidates + diverted highs --------
        low_now = act & go_low
        exp_now = low_now | divert_hi
        lrank = jnp.cumsum(exp_now.astype(jnp.int32)) - 1
        lpos = jnp.where(exp_now, s["bl_ptr"] + lrank, B_CAP)
        s_new["bl_fm"] = s["bl_fm"].at[:, lpos].set(
            jnp.stack([s["prev"], dplane_now]), mode="drop")
        s_new["bl_im"] = s["bl_im"].at[:, lpos].set(
            jnp.stack([s["slot"], cc, s["isel_old"],
                       divert_hi.astype(jnp.int32)]), mode="drop")
        s_new["bl_I"] = s["bl_I"].at[lpos].set(
            jnp.where(divert_hi[:, None], I_child, I_exit), mode="drop")
        s_new["bl_ptr"] = (s["bl_ptr"]
                           + jnp.sum(exp_now.astype(jnp.int32))).astype(jnp.int32)
        s_new["bl_min"] = jnp.minimum(
            s["bl_min"], jnp.min(jnp.where(exp_now, s["slot"], imax)))

        # --- advance to the next cell ---------------------------------
        fsel = _sel3(isel, fx, fy, fz)
        inc_sel = _sel3(isel, incx, incy, incz)
        blk = fsel // sz_c
        fnew_sel = jnp.where(inc_sel > 0, (blk + 1) * sz_c, blk * sz_c - 1)
        rx, ry, rz = _refloor(
            psel * s["dx"] + sx + half, psel * s["dy"] + sy + half,
            psel * s["dz"] + sz + half,
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

        finished = act & (split_now | divert_hi | low_now | gone
                          | (out_grid & ~split_req & ~low_now & ~gone))
        still = act & ~finished

        s_new.update(
            slot=jnp.where(finished, -1, s["slot"]),
            cc=jnp.where(still, cc_next, cc),
            clvl=jnp.where(still, clvl_next, clvl),
            fx=jnp.where(still, fx_n, fx),
            fy=jnp.where(still, fy_n, fy),
            fz=jnp.where(still, fz_n, fz),
            prev=jnp.where(still, psel, s["prev"]),
            isel_old=jnp.where(still, isel, s["isel_old"]),
            seen=seen_other,
            A=A_new,
            own_any=own_new,
            lxown=xown_new,
            n_steps=(s["n_steps"]
                     + jnp.sum(act.astype(jnp.int32))).astype(jnp.int32),
            it=(s["it"] + 1).astype(jnp.int32),
        )
        return s_new

    imax32 = jnp.iinfo(jnp.int32).max
    state = dict(
        state, it=jnp.zeros((), jnp.int32),
        e_min=jnp.asarray(imax32, jnp.int32),
        bl_min=jnp.asarray(imax32, jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, state)
    out.pop("it")
    out.pop("e_min")
    out.pop("bl_min")

    # ====================================================================
    # phase 2: closed-form deposits over the recorded flat entries
    # ====================================================================
    E_used = out["e_ptr"]
    C = 1 << 14
    nchunks = (E_used + C - 1) // C
    inv4pi = 1.0 / (4.0 * jnp.pi)
    with_scaspe = scaspe_accum is not None

    def chunk_body(i, carry):
        u_c, scaspe_c = carry
        e = i * C + jnp.arange(C, dtype=jnp.int32)
        ok = e < E_used
        ee = jnp.clip(e, 0, E - 1)
        ef = out["e_f"][:, ee]
        ei = out["e_i"][:, ee]
        eb = out["e_b"][:, ee]
        cc_e = jnp.clip(ei[0], 0, grid.n_cells - 1)
        len_e, x_e, A_e = ef[0], ef[1], ef[2]
        rec_e = ei[1] % R
        own_e, ob_e = eb[0], eb[1]
        ok = ok & (len_e > 0)

        I0_e = out["rec_I0"][rec_e]  # (C, L)
        rf_e = out["rec_f"][:, rec_e]
        csn_e = rf_e[RF_CSN]
        beam_e = rf_e[RF_BEAM]
        xo_e = out["rec_xo"][rec_e] if point_source else rf_e[RF_OWNB]
        y_own = kext_norm[None, :] * xo_e[:, None]
        sm_o = y_own < 1e-8
        y_safe = jnp.where(sm_o, 1.0, y_own)
        F_full = jnp.where(sm_o, 1.0, (1.0 - jnp.exp(-y_own)) / y_safe)
        F_e = jnp.where(ob_e[:, None], F_full, 1.0)
        I_e = I0_e * jnp.exp(-kext_norm[None, :] * A_e[:, None]) * F_e

        tau_e = kext_norm[None, :] * x_e[:, None]
        sm_e = tau_e < 1e-8
        tau_se = jnp.where(sm_e, 1.0, tau_e)
        i_av_ext = jnp.where(
            sm_e | (I_e == 0), I_e, I_e / tau_se * (1.0 - jnp.exp(-tau_e))
        )
        if point_source:
            i_av = i_av_ext  # own-cell formula coincides
        else:
            i_av_own = jnp.where(
                sm_o | (I_e == 0), I_e,
                I_e / y_safe**2 * (jnp.exp(-y_own) + y_own - 1.0),
            )
            i_av = jnp.where(own_e[:, None], i_av_own, i_av_ext)

        lvl_e = grid.lvl[cc_e]
        csz_e = _level_select(lvl_e, csize_lv_np, fdtype)
        du = i_av * (len_e / csz_e**3 / cs * csn_e**2 * beam_e)[:, None]
        du = jnp.where(ok[:, None], du, 0.0)
        u_c = u_c.at[cc_e].add(du)

        if with_scaspe:
            # scattered energy of the intersection (process_scatt_rad,
            # rt_routines.f90:2638-2726; same formulas as march_legacy's
            # collect_en_sca path) deposited with per-RECORD HG weights —
            # the ray direction is constant along a record, so ffn comes
            # from the record's (theta, phi) per entry chunk
            en_ext = jnp.where(sm_e, I_e * tau_e,
                               I_e * (1.0 - jnp.exp(-tau_e)))
            if point_source:
                y_o = kext_norm[None, :] * x_e[:, None]
            else:
                y_o = kext_norm[None, :] * rf_e[RF_OWNB][:, None]
            sm_o2 = y_o < 1e-8
            y_o_safe = jnp.where(sm_o2, 1.0, y_o)
            en_own = jnp.where(
                sm_o2, I_e * y_o / 2.0,
                I_e / y_o_safe * (jnp.exp(-y_o) + y_o - 1.0),
            )
            en = jnp.where(own_e[:, None], en_own, en_ext)
            en = en * albedo.astype(fdtype)[None, :] * (
                csn_e**2 * beam_e
            )[:, None]
            en = jnp.where(ok[:, None], en, 0.0)
            th_e, ph_e = rf_e[RF_TH], rf_e[RF_PH]
            st_e = jnp.sin(th_e)
            dx_e = st_e * jnp.cos(ph_e)
            dy_e = st_e * jnp.sin(ph_e)
            dz_e = jnp.cos(th_e)
            sc_out = []
            for kb, (sk, dirs_k, g_k, nhp_k, idx_k) in enumerate(zip(
                scaspe_c, scaspe_dirs, scaspe_g, scaspe_npix_hp,
                scaspe_lam_idx,
            )):
                Pk = dirs_k.shape[0]
                Lk = g_k.shape[0]
                if nhp_k <= 1:
                    w = jnp.ones((C, Pk, Lk), dtype=fdtype)
                else:
                    dk = dirs_k.astype(fdtype)
                    ads = (dx_e[:, None] * dk[None, :, 0]
                           + dy_e[:, None] * dk[None, :, 1]
                           + dz_e[:, None] * dk[None, :, 2])  # (C, Pk)
                    g = g_k.astype(fdtype)[None, None, :]
                    w = (1.0 - g**2) / nhp_k * (
                        1.0 + g**2 - 2.0 * g * ads[:, :, None]
                    ) ** (-1.5)
                    tot = jnp.sum(w[:, :nhp_k, :], axis=1, keepdims=True)
                    w = w / jnp.maximum(tot, 1e-300)
                val = w * jnp.take(en, idx_k, axis=1)[:, None, :]
                sc_out.append(sk.at[cc_e].add(val.reshape(C, Pk * Lk)))
            scaspe_c = tuple(sc_out)
        return (u_c, scaspe_c)

    u_accum, scaspe_accum = jax.lax.fori_loop(
        0, nchunks, chunk_body,
        (u_accum, tuple(scaspe_accum) if with_scaspe else ()),
    )
    out["e_ptr"] = jnp.zeros((), jnp.int32)
    if with_scaspe:
        return u_accum, out, scaspe_accum
    return u_accum, out


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------

PUSH_W = 1 << 14  # static pad width of a push slab


def _records_from_dict(d, dens_ref_np, csize_np, L, fdtype):
    """Launch dict (rays.fresh_launch / merge outputs) -> (new_f, new_i,
    new_I0, n) slabs for push_records."""
    n = len(d["src_cell"])
    nc = np.asarray(d["src_cell"], dtype=np.int64)
    csn = csize_np[nc]
    nside = np.asarray(d["nside"], dtype=np.int64)
    beam = 4.0 * np.pi / (12.0 * nside.astype(np.float64) ** 2)
    lum = np.asarray(d["lum"], dtype=np.float64)
    I0 = lum / (4.0 * np.pi * csn**2)[:, None]
    ownb = dens_ref_np[nc] * csn
    sp = np.asarray(d["src_pos"], dtype=np.float64)
    flags = (
        np.asarray(d["fresh"], dtype=np.int64) * F_FRESH
        + np.asarray(d.get("seen_other", np.zeros(n, bool)),
                     dtype=np.int64) * F_SEEN
        + np.asarray(d.get("nomerge", np.zeros(n, bool)),
                     dtype=np.int64) * F_NOMERGE
    )
    fmat = np.stack([
        np.asarray(d["theta"], dtype=np.float64),
        np.asarray(d["phi"], dtype=np.float64),
        sp[:, 0], sp[:, 1], sp[:, 2],
        beam, csn,
        np.asarray(d["prev"], dtype=np.float64),
        ownb, np.zeros(n),
    ])
    imat = np.stack([
        nc,
        np.asarray(d["ipix"], dtype=np.int64),
        nside,
        np.asarray(d["isel_old"], dtype=np.int64),
        flags,
        np.asarray(d["src_idx"], dtype=np.int64),
    ]).astype(np.int32)
    return fmat, imat, I0, n


def run_pool_stage(
    grid: Grid,
    phys,
    sources,
    *,
    mode: int,
    u_fest=None,
    u_init=None,
    en_lim: float = 0.0,
    rad_lim: float = 0.1,
    bm_par: float = 10.0,
    bm_par_max: float = 200.0,
    wall_lo=(-np.inf,) * 3,
    wall_hi=(np.inf,) * 3,
    chunk: int = None,
    fdtype=None,
    stats: dict = None,
    nr: int = NR_DEFAULT,
    rcap: int = None,
    scaspe_cfg=None,  # scattering.ScaspeConfig: enables scaspe deposits
    scaspe_init=None,  # tuple of (ncell, P_k, L_k) accumulators
    src_lum_fn=None,  # (launch_dict, nside) -> (n, L) luminosity override
):
    """Field stage (precalc/direct) on the persistent pool.

    Drop-in equivalent of engine.run_field_stage: same sources/physics
    contract, same deposits, same ladder semantics (in-loop splits; host
    merges via rays.merge_low between kernel calls).  With scaspe_cfg the
    phase-2 pass also deposits the HG-weighted scattered energy
    (process_scatt_rad) into flat per-bucket accumulators, and src_lum_fn
    supplies the launch luminosities (the scattering stage's
    assign_src_lum reads of the previous scaspe).
    """
    from . import rays as R_
    from .engine import StageResult, grid_nav

    if fdtype is None:
        fdtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    L = phys.kext_norm.shape[0]
    if stats is None:
        stats = {}
    dens_ref = jnp.asarray(grid.dens_ref, dtype=fdtype)
    dens_np = np.asarray(grid.dens_ref, dtype=np.float64)
    csize_np = np.asarray(grid.csize, dtype=np.float64)
    kext_norm = jnp.asarray(phys.kext_norm, dtype=fdtype)
    albedo = jnp.asarray(phys.albedo, dtype=fdtype)
    # pool_march donates its accumulator: copy so the caller's u_init
    # buffer survives (pipeline reuses it for the symmetrize base)
    u = (jnp.zeros((grid.n_cells, L), dtype=fdtype) if u_init is None
         else jnp.array(u_init, dtype=fdtype, copy=True))
    if u_fest is None:
        u_fest = jnp.zeros((grid.n_cells, L), dtype=fdtype)
    else:
        u_fest = jnp.asarray(u_fest, dtype=fdtype)
    rad_lim_dist = rad_lim * grid.modelsize if mode == MODE_PRECALC else np.inf
    use_walls = mode == MODE_DIRECT and (
        any(np.isfinite(float(w)) for w in wall_lo)
        or any(np.isfinite(float(w)) for w in wall_hi)
    )
    if rcap is None:
        # the ring must hold the live window (pending + active records);
        # the widest nside level of a big stage can reach several 100k
        rcap = 1 << 19
    state = make_state(grid, L, NR=nr, R=rcap, fdtype=fdtype)

    npix0 = 12 * R_.NSIDE_MIN * R_.NSIDE_MIN
    # the ring bounds memory, so launch packets can be large regardless of
    # the caller's round-driver chunk (each push costs a dispatch round
    # trip; bigger packets = fewer pushes)
    chunk = max(chunk or 1, (rcap // 4) // npix0)

    rptr_host = 0  # mirror of state["rptr"], kept current across pushes

    def push(d):
        nonlocal state, rptr_host
        n = len(d["src_cell"])
        if n == 0:
            return
        if "nside" not in d:
            d = dict(d, nside=np.full(n, R_.NSIDE_MIN, dtype=np.int64))
        fmat, imat, I0, _ = _records_from_dict(d, dens_np, csize_np, L, fdtype)
        for c0 in range(0, n, PUSH_W):
            c1 = min(c0 + PUSH_W, n)
            w = c1 - c0
            fpad = np.zeros((fmat.shape[0], PUSH_W))
            fpad[:, :w] = fmat[:, c0:c1]
            ipad = np.zeros((imat.shape[0], PUSH_W), dtype=np.int32)
            ipad[:, :w] = imat[:, c0:c1]
            Ipad = np.zeros((PUSH_W, L))
            Ipad[:w] = I0[c0:c1]
            state = push_records(
                state, jnp.asarray(fpad, dtype=fdtype),
                jnp.asarray(ipad), jnp.asarray(Ipad, dtype=fdtype),
                jnp.asarray(w, dtype=jnp.int32),
            )
        rptr_host += n

    kw = dict(
        mode=mode, point_source=sources.point, en_lim=float(en_lim),
        rad_lim_dist=float(rad_lim_dist), bm_par=float(bm_par),
        bm_par_max=float(bm_par_max), cs=phys.cs,
        wall_lo=tuple(float(w) for w in wall_lo),
        wall_hi=tuple(float(w) for w in wall_hi),
        nav=grid_nav(grid), use_walls=use_walls,
    )
    scaspe = None
    if scaspe_cfg is not None:
        # flat (ncell, P_k*L_k) accumulators (2-D row scatters)
        src0 = (scaspe_init if scaspe_init is not None
                else scaspe_cfg.zeros(grid.n_cells, fdtype))
        scaspe = tuple(
            jnp.asarray(s, dtype=fdtype).reshape(grid.n_cells, -1)
            for s in src0
        )
        kw.update(
            scaspe_dirs=tuple(jnp.asarray(b.dirs, dtype=fdtype)
                              for b in scaspe_cfg.buckets),
            scaspe_g=tuple(
                jnp.asarray(np.asarray(phys.gsca)[b.lam_idx], dtype=fdtype)
                for b in scaspe_cfg.buckets
            ),
            scaspe_npix_hp=tuple(b.npix_hp for b in scaspe_cfg.buckets),
            scaspe_lam_idx=scaspe_cfg.lam_idx_tuple(),
        )

    def launches():
        for c0 in range(0, sources.n, chunk):
            hi = min(c0 + chunk, sources.n)
            d = R_.fresh_launch(
                sources.pos[c0:hi], sources.cell[c0:hi],
                np.arange(c0, hi), sources.lum[c0:hi],
            )
            if src_lum_fn is not None:
                d = dict(d, nside=np.full(len(d["src_cell"]), R_.NSIDE_MIN,
                                          dtype=np.int64))
                d["lum"] = np.asarray(src_lum_fn(d, d["nside"]))
            yield d

    import os as _os
    import time as _time

    _dbg = _os.environ.get("DARTRAY_POOL_DEBUG")
    _t0 = _time.time()
    gen = iter(launches())
    pending_launch = next(gen, None)
    guard = 0
    last_progress = (-1, -1)
    bl_stash: list = []
    bl_nsides: list = []
    host_queue: list = []  # gated re-push work (split children/merged/reco)
    min_live = 0  # logical id of the oldest record any live lane references

    def _dslice(d, a, b):
        return {k: v[a:b] for k, v in d.items()}

    def top_up():
        """Push queued/launch packets while the ring has room.  EVERY push
        is gated on the live window + the kernel's 4*NR spawn margin:
        ungated pushes wrap the ring over pending records and silently
        drop work (found as a ~2/3 energy deficit in the scattering
        equivalence run, RUNS/r4)."""
        nonlocal pending_launch
        pushed = 0
        while True:
            free = rcap - (rptr_host - min_live) - 5 * nr
            if host_queue:
                d = host_queue[-1]
                n_l = len(d["src_cell"])
                if n_l <= free:
                    push(host_queue.pop())
                elif free >= PUSH_W:
                    push(_dslice(d, 0, free))
                    host_queue[-1] = _dslice(d, free, n_l)
                else:
                    break
            elif pending_launch is not None:
                if len(pending_launch["src_cell"]) * 2 > free:
                    break
                push(pending_launch)
                pending_launch = next(gen, None)
            else:
                break
            pushed += 1
        return pushed

    while True:
        top_up()

        if scaspe is not None:
            u, state, scaspe = pool_march(
                grid, dens_ref, kext_norm, albedo, u_fest, u, state,
                scaspe_accum=scaspe, **kw
            )
        else:
            u, state = pool_march(
                grid, dens_ref, kext_norm, albedo, u_fest, u, state, **kw
            )
        st = np.asarray(_status(state))
        rptr_host = int(st[0])
        n_bl = int(st[2])
        if n_bl:
            # gather the export; HIGH rows (ring-full diverted splits) are
            # re-spawned on the host immediately, LOW rows stash until the
            # drain point so every sibling of a merge quad is present
            # (run_rounds' global batching has the same property)
            g = {k: np.asarray(v)[:n_bl] for k, v in _gather_bl(state).items()}
            state["bl_ptr"] = jnp.zeros((), jnp.int32)
            hi = g.pop("high").astype(bool)
            nsides_g = g.pop("nside")
            blk_all = R_.Blocked(
                src_pos=np.stack([g["sx"], g["sy"], g["sz"]], axis=1),
                src_cell=g["nc"], src_idx=g["src"], ipix=g["ipix"],
                theta=g["th"], phi=g["ph"], lum=g["lum"],
                prev=g["prev"], cc_old=g["cc"], isel_old=g["isel"],
                dplane=g["dpl"],
            )

            def _sub(mask):
                return R_.Blocked(**{
                    f.name: getattr(blk_all, f.name)[mask]
                    for f in dataclasses.fields(R_.Blocked)
                })

            if hi.any():
                for ns in np.unique(nsides_g[hi]):
                    m = hi & (nsides_g == ns)
                    ch = R_.split_high(_sub(m), int(ns))
                    host_queue.append(dict(ch, nside=np.full(
                        4 * int(m.sum()), 2 * ns, dtype=np.int64)))
                    stats["host_splits"] = stats.get("host_splits", 0) + int(
                        m.sum())
            if (~hi).any():
                bl_stash.append(_sub(~hi))
                bl_nsides.append(nsides_g[~hi])

        pend = rptr_host - int(st[1])
        n_act = int(st[3])
        min_live = int(st[4])
        idle = pend == 0 and n_act == 0 and not host_queue
        if idle and bl_stash and pending_launch is None:
            # drain point: merge the accumulated blocked-low rays; the
            # unmergeable leftovers re-launch as no-merge recos
            blocked = R_.Blocked.concat(bl_stash)
            nsides = np.concatenate(bl_nsides)
            bl_stash, bl_nsides = [], []
            for ns in np.unique(nsides):
                m = nsides == ns
                sub = R_.Blocked(**{
                    f.name: getattr(blocked, f.name)[m]
                    for f in dataclasses.fields(R_.Blocked)
                })
                merged, reco = R_.merge_low(sub, int(ns))
                if merged is not None:
                    host_queue.append(dict(merged, nside=np.full(
                        len(merged["src_cell"]), ns // 2, dtype=np.int64)))
                    stats["merged"] = stats.get("merged", 0) + len(
                        merged["src_cell"])
                if reco is not None:
                    nr_ = len(reco["src_cell"])
                    host_queue.append(
                        dict(reco, nside=np.full(nr_, ns, dtype=np.int64),
                             nomerge=np.ones(nr_, dtype=bool)))
                    stats["reco"] = stats.get("reco", 0) + nr_
            idle = not host_queue
        if idle and pending_launch is None:
            break
        progress = (int(st[1]), int(st[5]), rptr_host)
        if _dbg:
            print(f"# pool {guard}: t={_time.time()-_t0:.1f}s qh={progress[0]} "
                  f"rptr={rptr_host} act={n_act} steps={progress[1]} "
                  f"bl={n_bl} hq={sum(len(d['src_cell']) for d in host_queue)}",
                  flush=True)
        if progress == last_progress and n_bl == 0:
            raise RuntimeError(
                f"pool stage stalled: {pend} pending, {n_act} active, "
                f"{len(host_queue)} queued packets — ring {rcap} too small "
                "for the live window; raise rcap (run_pool_stage(rcap=...))"
            )
        last_progress = progress
        guard += 1
        if guard > 100000:
            raise RuntimeError("pool stage did not converge (driver guard)")

    stats["steps"] = stats.get("steps", 0) + int(state["n_steps"])
    # every record is one ray segment (fresh, child, merged or reco),
    # matching run_rounds' ray accounting
    stats["rays"] = stats.get("rays", 0) + int(state["rptr"])
    lum_lost = np.asarray(state["lum_lost"], dtype=np.float64)
    if scaspe is not None:
        scaspe = tuple(
            s.reshape(grid.n_cells, b.npix_tot, len(b.lam_idx))
            for s, b in zip(scaspe, scaspe_cfg.buckets)
        )
    return StageResult(u=u, lum_lost=lum_lost, stats=stats, scaspe=scaspe)
