"""Focused rerun: isolate the scatter/gather anomalies.

Times each op as a standalone jit (no fori_loop) with explicit donate to
avoid copy effects, several repeats printed individually.
"""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

NR = 65536
NCELL = 180201
L = 32


def timeit(name, fn, *args, n=8):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append((time.perf_counter() - t) * 1e3)
    ts = np.array(ts)
    print(f"{name:46s} med {np.median(ts):8.3f} ms  min {ts.min():8.3f}  max {ts.max():8.3f}",
          flush=True)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    idx_f = jnp.asarray(rng.integers(0, NCELL, NR), dtype=jnp.int32)
    idx_h = jnp.asarray(rng.integers(0, NCELL, NR // 2), dtype=jnp.int32)
    idx_dup = jnp.asarray(rng.integers(0, 8192, NR), dtype=jnp.int32)
    val_f = jnp.asarray(rng.random((NR, L)), dtype=jnp.float32)
    val_h = val_f[: NR // 2]
    u = jnp.zeros((NCELL, L), dtype=jnp.float32)
    dens = jnp.asarray(rng.random(NCELL), dtype=jnp.float32)
    dens2d = jnp.asarray(rng.random((NCELL, 8)), dtype=jnp.float32)
    cchild = jnp.asarray(rng.integers(0, NCELL, NCELL), dtype=jnp.int32)

    # noop baseline: dispatch latency
    nop = jax.jit(lambda x: x + 1.0)
    timeit("noop (NR,L) add", nop, val_f)

    sc = jax.jit(lambda u, i, v: u.at[i].add(v))
    timeit("scatter-add full (NR,L)", sc, u, idx_f, val_f)
    timeit("scatter-add half (NR/2,L)", sc, u, idx_h, val_h)
    timeit("scatter-add dup-heavy (NR->8192 rows)", sc, u, idx_dup, val_f)

    g1 = jax.jit(lambda d, i: d[i])
    timeit("gather 1D (NR,) from (NCELL,)", g1, dens, idx_f)

    g2 = jax.jit(lambda d, i: d[i])
    timeit("gather rows (NR,8) from (NCELL,8)", g2, dens2d, idx_f)

    gu = jax.jit(lambda u, i: u[i])
    timeit("gather rows (NR,32) from (NCELL,32)", gu, u, idx_f)

    gi = jax.jit(lambda c, i: c[i])
    timeit("gather 1D int (NR,) from (NCELL,)", gi, cchild, idx_f)

    def chain(c, i):
        x = i
        for _ in range(4):
            x = c[jnp.clip(x, 0, NCELL - 1)]
        return x
    timeit("descend chain 4x 1D gathers", jax.jit(chain), cchild, idx_f)

    # fori_loop of 12 scatters (mirror of prof_prims #1)
    def loop12(u, i, v):
        def body(k, c):
            return c.at[i].add(v + k)
        return jax.lax.fori_loop(0, 12, body, u)
    timeit("fori 12x scatter-add full", jax.jit(loop12), u, idx_f, val_f)

    def loop12h(u, i, v):
        def body(k, c):
            return c.at[i].add(v + k)
        return jax.lax.fori_loop(0, 12, body, u)
    timeit("fori 12x scatter-add half", jax.jit(loop12h), u, idx_h, val_h)


if __name__ == "__main__":
    main()
