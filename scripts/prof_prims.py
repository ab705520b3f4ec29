"""Time the march-body primitives in isolation on the real TPU.

Each candidate cost (scatter-add deposit, u_fest gather, octree descend
gather chain, exp evaluations) is wrapped in a 12-iteration fori_loop to
amortize dispatch latency, mirroring one step-chunk of the march while_loop.
Run:  python scripts/prof_prims.py
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
ITERS = 12


def bench(name, fn, *args):
    out = jax.block_until_ready(fn(*args))  # compile
    t = time.perf_counter()
    n = 5
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t) / n
    print(f"{name:42s} {dt*1e3/ITERS:8.3f} ms/iter  ({dt*1e3:8.2f} ms / {ITERS} iters)",
          flush=True)
    return out


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, NCELL, NR), dtype=jnp.int32)
    idx_sorted = jnp.sort(idx)
    val = jnp.asarray(rng.random((NR, L)), dtype=jnp.float32)
    u = jnp.zeros((NCELL, L), dtype=jnp.float32)
    dens = jnp.asarray(rng.random(NCELL), dtype=jnp.float32)
    cchild = jnp.asarray(rng.integers(0, NCELL, NCELL), dtype=jnp.int32)

    def loop(body):
        def fn(u, idx, val):
            def it(i, c):
                return body(c, idx, val, i)
            return jax.lax.fori_loop(0, ITERS, it, u)
        return jax.jit(fn)

    # 1. scatter-add (NR, L) -> (NCELL, L)
    bench("scatter-add u.at[idx].add(val)",
          loop(lambda u, idx, val, i: u.at[idx].add(val + i)), u, idx, val)

    # 2. scatter-add with pre-sorted indices
    bench("scatter-add sorted idx",
          loop(lambda u, idx, val, i: u.at[idx].add(val + i)), u, idx_sorted, val)

    # 3. segment_sum then one add (dense (NCELL,L) temp)
    def seg(u, idx, val, i):
        return u + jax.ops.segment_sum(val + i, idx, num_segments=NCELL)
    bench("segment_sum + dense add", loop(seg), u, idx, val)

    # 4. gather (NCELL,L) -> (NR,L)
    def gat(u, idx, val, i):
        return u.at[0, 0].add(jnp.sum(u[idx] * (val + i)))
    bench("gather u[idx] (NR,L)", loop(gat), u, idx, val)

    # 5. four dependent scalar gathers (descend chain)
    def desc(u, idx, val, i):
        c = idx
        for _ in range(4):
            c = cchild[jnp.clip(c + i, 0, NCELL - 1)]
        return u.at[0, 0].add(jnp.sum(c.astype(jnp.float32)))
    bench("descend: 4 dependent int gathers (NR,)", loop(desc), u, idx, val)

    # 6. scalar gathers: dens_ref/ccoord style, 4x (NR,)
    def sg(u, idx, val, i):
        s = dens[idx] + dens[jnp.clip(idx + i, 0, NCELL - 1)]
        s = s + dens[jnp.clip(idx + 2 * i, 0, NCELL - 1)] + dens[jnp.clip(idx + 3, 0, NCELL - 1)]
        return u.at[0, 0].add(jnp.sum(s))
    bench("4 independent (NR,) gathers", loop(sg), u, idx, val)

    # 7. elementwise: 2x exp + ~20 ops on (NR, L)
    def ew(u, idx, val, i):
        t = val * (1.0 + i)
        e1 = jnp.exp(-t)
        e2 = jnp.exp(-2.0 * t)
        r = jnp.where(t < 1e-8, val, val / jnp.maximum(t, 1e-30) * (1 - e1))
        r = r * e2 + jnp.where(t > 1, r, e1)
        return u.at[0, 0].add(jnp.sum(r))
    bench("elementwise 2exp + ops (NR,L)", loop(ew), u, idx, val)

    # 8. scatter-add at half rays
    idx_h = idx[: NR // 2]
    val_h = val[: NR // 2]
    bench("scatter-add NR/2",
          loop(lambda u, idx, val, i: u.at[idx].add(val + i)), u, idx_h, val_h)

    # 9. scatter-add (NR,) single lambda column
    def s1(u, idx, val, i):
        return u.at[idx, 0].add(val[:, 0] + i)
    bench("scatter-add (NR,) single col", loop(s1), u, idx, val)

    # 10. scatter into a small (8192, L) tile (VMEM-resident size)
    u_small = jnp.zeros((8192, L), dtype=jnp.float32)
    idx_small = jnp.asarray(rng.integers(0, 8192, NR), dtype=jnp.int32)
    bench("scatter-add into (8192,L)",
          loop(lambda u, idx, val, i: u.at[idx].add(val + i)), u_small, idx_small, val)


if __name__ == "__main__":
    main()
