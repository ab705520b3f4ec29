"""Round-5c: TRUE standalone scatter rates (unfoldable, result-forced).

Every case reduces with sum(x*x): a LINEAR reduction of a scatter-add
result is algebraically rewritten away (sum(scatter_add(a,c,v)) ->
sum(a)+sum(v)), so only a nonlinear consumer forces the scatter.

prof_r5.py's A/B chained 8 IDENTICAL scatters, which XLA can fold into
one (scatter-add is linear), so the per-op division understated the
cost.  Here every scatter in a chain uses DIFFERENT indices, results
are sum-forced, and each repeat uses fresh data — the numbers these
produce decide whether a post-loop deposit flush can beat the measured
~5 ms/iteration in-loop scatter (RUNS/r5_prof2.log C).
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
except Exception:
    pass

NR = 65536
NCELL = 180201
W = 753
L = 26
REPEATS = 5


def measure(name, fn, *args, per_iter=1):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(REPEATS):
        t = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append((time.perf_counter() - t) / per_iter)
    med = float(np.median(ts))
    alls = " ".join(f"{t*1e3:8.3f}" for t in ts)
    print(f"{name:58s} med {med*1e3:9.3f} ms   [{alls}]  (v={float(out):.3g})",
          flush=True)
    return med


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(1)
    cells8 = jnp.asarray(rng.integers(0, NCELL, (8, NR)), dtype=jnp.int32)
    vals = jnp.asarray(rng.random((NR, W)), dtype=jnp.float32)
    vals_u = jnp.asarray(rng.random((NR, L)), dtype=jnp.float32)
    acc = jnp.zeros((NCELL, W), dtype=jnp.float32)
    acc_u = jnp.zeros((NCELL, L), dtype=jnp.float32)

    @jax.jit
    def one_wide(a, c8, v):
        out = a.at[c8[0]].add(v)
        return jnp.sum(out * out)

    measure("1. ONE scatter (NR,753), sum-forced", one_wide, acc, cells8,
            vals)

    @jax.jit
    def chain8_wide(a, c8, v):
        for j in range(8):
            a = a.at[c8[j]].add(v)  # different indices: unfoldable
        return jnp.sum(a * a)

    measure("2. 8 chained DISTINCT-index scatters (NR,753), per-op",
            chain8_wide, acc, cells8, vals, per_iter=8)

    @jax.jit
    def one_narrow(a, c8, v):
        out = a.at[c8[0]].add(v)
        return jnp.sum(out * out)

    measure("3. ONE scatter (NR,26), sum-forced", one_narrow, acc_u, cells8,
            vals_u)

    @jax.jit
    def chain8_narrow(a, c8, v):
        for j in range(8):
            a = a.at[c8[j]].add(v)
        return jnp.sum(a * a)

    measure("4. 8 chained DISTINCT-index scatters (NR,26), per-op",
            chain8_narrow, acc_u, cells8, vals_u, per_iter=8)

    # flush shapes: one big scatter covering K steps' rows at once
    for K in (8, 32):
        cK = jnp.asarray(rng.integers(0, NCELL, (K * NR,)), dtype=jnp.int32)
        vK = jnp.asarray(rng.random((K * NR, L)), dtype=jnp.float32)

        @jax.jit
        def bigu(a, c, v):
            out = a.at[c].add(v)
            return jnp.sum(out * out)

        measure(f"5. ONE ({K}*NR,26) scatter (u flush of {K} steps), per-step",
                bigu, acc_u, cK, vK, per_iter=K)

    # the post-loop scaspe flush: expand + scatter per step, chained over
    # 8 steps with distinct cells — exactly the proposed epilogue
    ffn_w = jnp.asarray(rng.random((NR, W)), dtype=jnp.float32)
    en8 = jnp.asarray(rng.random((8, NR, L)), dtype=jnp.float32)

    @jax.jit
    def epilogue(a, c8, e8):
        for j in range(8):
            rows = ffn_w * jnp.tile(e8[j], (1, W // L + 1))[:, :W]
            a = a.at[c8[j]].add(rows)
        return jnp.sum(a * a)

    measure("6. post-loop epilogue: expand+scatter (NR,753) x8, per-step",
            epilogue, acc, cells8, en8, per_iter=8)


if __name__ == "__main__":
    main()
