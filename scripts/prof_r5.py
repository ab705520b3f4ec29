"""Round-5 decision microbench: the while-loop deposit penalty.

Round 4 measured the exact scaspe deposit (a flat (65536, 753) scatter-add
into a (180201, 753) accumulator) at 0.107 ms standalone but 9.8 ms inside
the march while_loop, and hypothesized that XLA copies while-carried
scatter targets every iteration (RUNS/ROUND4_NOTES.md).  The end-of-round
confirmation was swamped by tunnel variance, so round 5 starts HERE:

* every number is the median of >= 5 repeats (all repeats printed);
* in-loop per-iteration costs come from ONE device execution of a
  multi-iteration loop (dispatch noise / iters, not dispatch noise / 1);
* the candidate fix (two-level loop: inner scan records (cell, value)
  entries, outer body flushes the scatters once per K steps) is measured
  on the same data AND checked bit-for-bit against the in-loop reference
  (the round-4 pool kernel miscompile makes chained-scatter correctness a
  first-class concern, see RUNS/ROUND4_NOTES.md).

Shapes are the TRUST benchmark's: NR=65536 rays, NCELL=180201 cells,
753 scaspe values per intersection, L=26 wavelengths.
"""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

try:
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(ROOT, "RUNS", "jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

NR = 65536
NCELL = 180201
W = 753  # scaspe row width (sum of P_k * L_k, TRUST stellar buckets)
L = 26
ITERS = 32  # loop length for in-loop measurements
K = 8  # inner segment length of the two-level candidate
REPEATS = int(os.environ.get("PROF_REPEATS", "5"))


def measure(name, fn, *args, repeats=REPEATS, per_iter=1):
    """Median-of-N timing with the result FORCED.

    CAUTION (the round-5 lesson, RUNS/ROUND5_NOTES.md §1): summing a
    scatter result does NOT force the scatter — XLA rewrites
    sum(scatter_add(a, c, v)) to sum(a) + sum(v), so sections A-D here
    still under-measure.  The honest shape is a chain of scatters with
    DISTINCT index sets (scripts/prof_r5c.py); these sections are kept
    as the documented example of the artifact."""
    out = jax.block_until_ready(fn(*args))  # compile + warm
    ts = []
    for _ in range(repeats):
        t = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append((time.perf_counter() - t) / per_iter)
    med = float(np.median(ts))
    alls = " ".join(f"{t*1e3:8.3f}" for t in ts)
    first = np.ravel(np.asarray(jax.tree_util.tree_leaves(out)[0]))[0]
    print(f"{name:58s} med {med*1e3:9.3f} ms   [{alls}]  (v0={first:.3g})",
          flush=True)
    return out, med


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev}  repeats={REPEATS} ITERS={ITERS} K={K}",
          flush=True)
    rng = np.random.default_rng(0)
    cells = jnp.asarray(rng.integers(0, NCELL, NR), dtype=jnp.int32)
    # per-iteration distinct cell ids (the march advances every step)
    cells_it = jnp.asarray(
        rng.integers(0, NCELL, (ITERS, NR)), dtype=jnp.int32
    )
    vals = jnp.asarray(rng.random((NR, W)), dtype=jnp.float32)
    vals_u = jnp.asarray(rng.random((NR, L)), dtype=jnp.float32)
    en = jnp.asarray(rng.random((NR, L)), dtype=jnp.float32)
    ffn = jnp.asarray(rng.random((NR, W // L * L)), dtype=jnp.float32)
    acc = jnp.zeros((NCELL, W), dtype=jnp.float32)
    acc_u = jnp.zeros((NCELL, L), dtype=jnp.float32)

    # ---- standalone rates (pipelined x8 to amortize dispatch) ----------
    # every variant returns jnp.sum(result) so the scatters cannot be
    # elided (they were, in the first version of this script — the
    # timings that misled round 4; ROUND5_NOTES.md §1)
    @jax.jit
    def sc8(a, c, v):
        for _ in range(8):
            a = a.at[c].add(v)
        return jnp.sum(a)

    measure("A. scatter (NR,753) standalone x8-chained", sc8, acc, cells,
            vals, per_iter=8)

    @jax.jit
    def scu8(a, c, v):
        for _ in range(8):
            a = a.at[c].add(v)
        return jnp.sum(a)

    measure("B. scatter (NR,26) standalone x8-chained", scu8, acc_u, cells,
            vals_u, per_iter=8)

    # ---- the smoking gun: same scatter inside a while_loop -------------
    def while_scatter(acc0, cit, v):
        def cond(s):
            return s[0] < ITERS

        def body(s):
            i, a = s
            a = a.at[cit[i]].add(v)
            return i + 1, a

        return jnp.sum(
            jax.lax.while_loop(cond, body, (jnp.int32(0), acc0))[1]
        )

    ref_sc, _ = measure("C. scatter (NR,753) in while_loop, per-iter",
                        jax.jit(while_scatter), acc, cells_it, vals,
                        per_iter=ITERS)

    def while_scatter_u(acc0, cit, v):
        def cond(s):
            return s[0] < ITERS

        def body(s):
            i, a = s
            a = a.at[cit[i]].add(v)
            return i + 1, a

        return jnp.sum(
            jax.lax.while_loop(cond, body, (jnp.int32(0), acc0))[1]
        )

    measure("D. scatter (NR,26) in while_loop, per-iter",
            jax.jit(while_scatter_u), acc_u, cells_it, vals_u,
            per_iter=ITERS)

    # ---- gather reference (the unavoidable in-loop cost) ---------------
    fdat = jnp.asarray(rng.random((NCELL, 4 + L)), dtype=jnp.float32)

    def while_gather(cit):
        def cond(s):
            return s[0] < ITERS

        def body(s):
            i, tot = s
            row = fdat[cit[i]]
            return i + 1, tot + jnp.sum(row, axis=1)

        return jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((NR,), jnp.float32))
        )[1]

    measure("E. gather (NR,30)-row in while_loop, per-iter",
            jax.jit(while_gather), cells_it, per_iter=ITERS)

    # ---- candidate: two-level loop, flush every K steps ----------------
    # inner scan records (cell, en) per step; outer body expands
    # en -> (NR, W) rows (the ffn product) and scatters.  Values are
    # arranged so the result must equal C's reference bit pattern is NOT
    # expected (different data), but against its own single-scatter
    # replay it must match exactly.
    ffn_w = jnp.asarray(rng.random((NR, W)), dtype=jnp.float32)
    en_it = jnp.asarray(
        rng.random((ITERS, NR, L)), dtype=jnp.float32
    )

    def twolevel_unrolled(acc0, cit, eit):
        def outer_cond(s):
            return s[0] < ITERS // K

        def outer_body(s):
            seg, a = s

            def inner(carry, j):
                idx = seg * K + j
                return carry, (cit[idx], eit[idx])

            _, (cs, es) = jax.lax.scan(
                inner, jnp.int32(0), jnp.arange(K, dtype=jnp.int32)
            )
            for j in range(K):
                rows = (ffn_w * jnp.tile(es[j], (1, W // L + 1))[:, :W])
                a = a.at[cs[j]].add(rows)
            return seg + 1, a

        return jax.lax.while_loop(outer_cond, outer_body,
                                  (jnp.int32(0), acc0))[1]

    two, _ = measure("F. two-level: inner scan K + K chained flushes, per-step",
                     jax.jit(twolevel_unrolled), acc, cells_it, en_it,
                     per_iter=ITERS)

    # correctness: replay the same deposits as ITERS standalone scatters
    @jax.jit
    def replay(acc0, cit, eit):
        a = acc0
        for i in range(ITERS):
            rows = (ffn_w * jnp.tile(eit[i], (1, W // L + 1))[:, :W])
            a = a.at[cit[i]].add(rows)
        return a

    ref = jax.block_until_ready(replay(acc, cells_it, en_it))

    def relerr(a, b):
        # f32 scatter summation order differs legitimately between
        # layouts; the round-4 miscompile class (whole matrices silently
        # unwritten) shows up as O(1) relative error, not O(eps)
        d = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(b))) or 1.0
        return d / s

    e = relerr(two, ref)
    print(f"#  F vs straight-line replay: rel err = {e:.2e} "
          f"({'OK' if e < 1e-4 else 'MISMATCH — chained-scatter hazard'})",
          flush=True)
    # independent magnitude check: every deposit is positive, so the
    # grand total must match the closed-form sum of all value rows
    tot_ref = float(jnp.sum(ref.astype(jnp.float64))) if jax.config.jax_enable_x64 \
        else float(jnp.sum(ref))
    tot_two = float(jnp.sum(two))
    print(f"#  totals: replay {tot_ref:.6e}  two-level {tot_two:.6e}",
          flush=True)

    # single concatenated flush (one scatter of K*NR rows) for K=4
    K2 = 4

    def twolevel_concat(acc0, cit, eit):
        def outer_cond(s):
            return s[0] < ITERS // K2

        def outer_body(s):
            seg, a = s

            def inner(carry, j):
                idx = seg * K2 + j
                return carry, (cit[idx], eit[idx])

            _, (cs, es) = jax.lax.scan(
                inner, jnp.int32(0), jnp.arange(K2, dtype=jnp.int32)
            )
            rows = (
                ffn_w[None] * jnp.tile(es, (1, 1, W // L + 1))[:, :, :W]
            ).reshape(K2 * NR, W)
            a = a.at[cs.reshape(-1)].add(rows)
            return seg + 1, a

        return jax.lax.while_loop(outer_cond, outer_body,
                                  (jnp.int32(0), acc0))[1]

    two2, _ = measure("G. two-level: one concatenated flush (K=4), per-step",
                      jax.jit(twolevel_concat), acc, cells_it, en_it,
                      per_iter=ITERS)
    e2 = relerr(two2, ref)
    print(f"#  G vs straight-line replay: rel err = {e2:.2e} "
          f"({'OK' if e2 < 1e-4 else 'MISMATCH'})", flush=True)

    # the ffn expansion alone (outer-body elementwise cost per step)
    @jax.jit
    def expand8(e):
        out = jnp.zeros((NR, W), jnp.float32)
        for _ in range(8):
            out = out + ffn_w * jnp.tile(e, (1, W // L + 1))[:, :W]
        return out

    measure("H. ffn-expand (NR,753) elementwise x8-chained", expand8, en,
            per_iter=8)

    # scan-ys recording cost alone (inner loop without any flush)
    def record_only(cit, eit):
        def outer_cond(s):
            return s[0] < ITERS // K

        def outer_body(s):
            seg, tot = s

            def inner(carry, j):
                idx = seg * K + j
                return carry, (cit[idx], eit[idx])

            _, (cs, es) = jax.lax.scan(
                inner, jnp.int32(0), jnp.arange(K, dtype=jnp.int32)
            )
            return seg + 1, tot + jnp.sum(es) + jnp.sum(cs)

        return jax.lax.while_loop(outer_cond, outer_body,
                                  (jnp.int32(0), jnp.float32(0)))[1]

    measure("I. inner-scan record only (no flush), per-step",
            jax.jit(record_only), cells_it, en_it, per_iter=ITERS)


if __name__ == "__main__":
    main()
