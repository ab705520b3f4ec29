"""Isolate the in-loop scaspe-deposit penalty (9.8 ms/iter vs 0.107 ms
standalone for the same scatter).  Variants of a while_loop carrying a
(NCELL, 753) accumulator scattered with (NR, 753) rows per iteration:

  v1: scatter a CONSTANT value array (captured, not carried)
  v2: scatter a product of two captured arrays (fresh temp per iter)
  v3: like v2 but the temp depends on a carried per-ray state (as in the
      march: en_sca depends on the evolving intensity)
  v4: v3 with the accumulator as a 3-tuple of column slices (the real
      bucket layout)

Run on the TPU: python scripts/prof_whilescatter.py
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
W = 753
IT = 24


def timeit(name, fn, *args, n=4):
    jax.block_until_ready(fn(*args))
    t = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t) / n
    print(f"{name:46s} {dt*1e3:9.2f} ms total  {dt/IT*1e3:8.3f} ms/iter",
          flush=True)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    cells = jnp.asarray(rng.integers(0, NCELL, NR), dtype=jnp.int32)
    vals = jnp.asarray(rng.random((NR, W)), dtype=jnp.float32)
    ffn = jnp.asarray(rng.random((NR, W)), dtype=jnp.float32)
    acc = jnp.zeros((NCELL, W), dtype=jnp.float32)
    x = jnp.asarray(rng.random((NR,)), dtype=jnp.float32)

    def v1(a, c):
        def cond(s):
            return s[0] < IT
        def body(s):
            i, aa = s
            return (i + 1, aa.at[c].add(vals))
        return jax.lax.while_loop(cond, body, (jnp.int32(0), a))[1]

    def v2(a, c):
        def cond(s):
            return s[0] < IT
        def body(s):
            i, aa = s
            return (i + 1, aa.at[c].add(vals * ffn))
        return jax.lax.while_loop(cond, body, (jnp.int32(0), a))[1]

    def v3(a, c, xx):
        def cond(s):
            return s[0] < IT
        def body(s):
            i, aa, x_ = s
            v = ffn * (x_[:, None] * 0.5 + 0.1)
            x_ = x_ * 0.999 + 1e-4
            return (i + 1, aa.at[c].add(v), x_)
        return jax.lax.while_loop(cond, body, (jnp.int32(0), a, xx))[1]

    def v4(a3, c, xx):
        w1 = 9
        w2 = 120
        def cond(s):
            return s[0] < IT
        def body(s):
            i, (a_, b_, c_), x_ = s
            v = ffn * (x_[:, None] * 0.5 + 0.1)
            x_ = x_ * 0.999 + 1e-4
            a_ = a_.at[c].add(v[:, :w1])
            b_ = b_.at[c].add(v[:, w1:w1 + w2])
            c_ = c_.at[c].add(v[:, w1 + w2:])
            return (i + 1, (a_, b_, c_), x_)
        return jax.lax.while_loop(cond, body, (jnp.int32(0), a3, xx))[1]

    timeit("v1 const-value scatter", jax.jit(v1), acc, cells)
    timeit("v2 product-value scatter", jax.jit(v2), acc, cells)
    timeit("v3 carried-state value", jax.jit(v3), acc, cells, x)
    a3 = (acc[:, :9] * 1.0, acc[:, 9:129] * 1.0, acc[:, 129:] * 1.0)
    timeit("v4 3-bucket tuple", jax.jit(v4), a3, cells, x)


if __name__ == "__main__":
    main()
