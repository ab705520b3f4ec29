"""Loop-construct and NR-scaling experiments for the march hot loop.

Round-4 finding: a gather that costs ~0.1 ms standalone costs ~1.0 ms per
iteration inside lax.while_loop (RUNS/r4/measure1.log).  This measures
whether the penalty is the loop construct (while vs fori vs scan), the
index dtype, or fixed per-op overhead (in which case throughput scales
with NR for free).
"""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

NCELL = 180201
L = 32
IT = 48


def timeit(name, fn, *args, n=5, it=IT):
    jax.block_until_ready(fn(*args))
    t = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t) / n
    print(f"{name:52s} {dt*1e3:9.3f} ms total  {dt/it*1e3:8.4f} ms/iter",
          flush=True)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    dens = jnp.asarray(rng.random(NCELL), dtype=jnp.float32)
    fdat = jnp.asarray(rng.random((NCELL, 36)), dtype=jnp.float32)

    for NR in (65536, 262144):
        idx = jnp.asarray(rng.integers(0, NCELL, NR), dtype=jnp.int32)
        x = jnp.zeros((NR,), dtype=jnp.float32)

        def wl_gather(idx, x):
            def cond(s):
                return s[0] < IT
            def b(s):
                i, ix, xx = s
                v = dens[ix]
                ix = (ix + v.astype(jnp.int32) + 1) % NCELL
                return (i + 1, ix, xx + v)
            return jax.lax.while_loop(cond, b, (jnp.int32(0), idx, x))[2]

        def fori_gather(idx, x):
            def b(i, s):
                ix, xx = s
                v = dens[ix]
                ix = (ix + v.astype(jnp.int32) + 1) % NCELL
                return (ix, xx + v)
            return jax.lax.fori_loop(0, IT, b, (idx, x))[1]

        def scan_gather(idx, x):
            def b(s, _):
                ix, xx = s
                v = dens[ix]
                ix = (ix + v.astype(jnp.int32) + 1) % NCELL
                return (ix, xx + v), None
            return jax.lax.scan(b, (idx, x), None, length=IT)[0][1]

        def wl_row_gather(idx, x):
            def cond(s):
                return s[0] < IT
            def b(s):
                i, ix, xx = s
                v = fdat[ix]  # (NR, 36)
                ix = (ix + v[:, 3].astype(jnp.int32) + 1) % NCELL
                return (i + 1, ix, xx + v[:, 0])
            return jax.lax.while_loop(cond, b, (jnp.int32(0), idx, x))[2]

        def wl_exp(idx, x):
            xl = jnp.zeros((NR, L), dtype=jnp.float32)
            def cond(s):
                return s[0] < IT
            def b(s):
                i, xx = s
                xx = jnp.exp(-jnp.abs(xx) - 0.1) + 0.5 * xx
                return (i + 1, xx)
            return jax.lax.while_loop(cond, b, (jnp.int32(0), xl + x[:, None]))[1]

        for name, fn in [
            (f"NR={NR} while 1 gather", jax.jit(wl_gather)),
            (f"NR={NR} fori  1 gather", jax.jit(fori_gather)),
            (f"NR={NR} scan  1 gather", jax.jit(scan_gather)),
            (f"NR={NR} while row gather (36)", jax.jit(wl_row_gather)),
            (f"NR={NR} while 1 exp (NR,L)", jax.jit(wl_exp)),
        ]:
            timeit(name, fn, idx, x)


if __name__ == "__main__":
    main()
