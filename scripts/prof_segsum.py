"""Round-5 de-risk: cost of sorted segment-sum scaspe deposits.

The scaspe deposit floor is 9.8 ms/iteration at NR=65536 (one flat 2-D
scatter-add of (NR, 753) rows).  Candidate replacement: sort the step's
cell ids, segment-sum the value rows (duplicates collapse), scatter the
unique rows with indices_are_sorted.  Measures each stage standalone on
the TPU so round 5 knows whether the rewrite can pay.
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
W = 753  # sum of P_k * L_k over the TRUST stellar buckets


def timeit(name, fn, *args, n=6):
    jax.block_until_ready(fn(*args))
    t = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t) / n
    print(f"{name:52s} {dt*1e3:9.3f} ms", flush=True)
    return out


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    # realistic duplicate structure: rays cluster around source cells
    cells = jnp.asarray(
        rng.integers(0, NCELL, NR) // 7 * 7 % NCELL, dtype=jnp.int32
    )
    vals = jnp.asarray(rng.random((NR, W)), dtype=jnp.float32)
    acc = jnp.zeros((NCELL, W), dtype=jnp.float32)

    timeit("baseline: scatter-add (NR, 753)",
           jax.jit(lambda a, c, v: a.at[c].add(v)), acc, cells, vals)

    timeit("sort keys (NR,)",
           jax.jit(lambda c: jnp.sort(c)), cells)

    def sort_and_seg(a, c, v):
        order = jnp.argsort(c)
        cs = c[order]
        vs = v[order]
        # segment boundaries -> exclusive prefix ids
        seg = jnp.cumsum(jnp.concatenate([jnp.zeros(1, jnp.int32),
                                          (cs[1:] != cs[:-1]).astype(jnp.int32)]))
        summed = jax.ops.segment_sum(vs, seg, num_segments=NR)
        # representative cell per segment
        first = jnp.zeros((NR,), jnp.int32).at[seg].max(cs)
        return a.at[first].add(summed, indices_are_sorted=True)

    timeit("argsort + segment_sum + sorted scatter",
           jax.jit(sort_and_seg), acc, cells, vals)

    def seg_only(a, c, v):
        return a.at[c].add(v, indices_are_sorted=True)

    cells_sorted = jnp.sort(cells)
    timeit("scatter-add with indices_are_sorted (pre-sorted)",
           jax.jit(seg_only), acc, cells_sorted, vals)

    # the elementwise value materialization alone (ffn * en_sca shape)
    ffn = jnp.asarray(rng.random((NR, W)), dtype=jnp.float32)
    timeit("elementwise (NR,753) product only",
           jax.jit(lambda a, b: a * b), vals, ffn)


if __name__ == "__main__":
    main()
