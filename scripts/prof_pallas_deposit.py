"""Measured Pallas data point for the deposit-path assessment (notes §6).

The march's deposit primitive is a random-row read-modify-write:
A[idx[r], :] += V[r, :] over NR rays into an (NCELL, W) HBM accumulator.
XLA lowers it as a scatter-add measured at ~8x over pure HBM bandwidth
(ROUND5_NOTES.md §1).  Round 5's §6 argued from engineering arithmetic
that a Pallas kernel cannot beat it because per-row DMA RMW is
latency-bound (~1 us x 65536 rows); this script MEASURES that claim on
the real chip:

  A. XLA scatter-add, chained over K DISTINCT index sets (the honest
     microbench shape — a linear consumer of a single scatter is
     algebraically rewritten away, §1).
  B. Pallas serial per-row DMA RMW (grid=(1,), fori_loop over rows:
     DMA row in, add, DMA row out) — the naive kernel.
  C. Pallas software-pipelined variant (double-buffered reads: row i+1's
     DMAs issued while row i computes).  Index sets are built without
     duplicates inside the pipeline window, mirroring the real deposit's
     commutativity rather than racing on it.

All three run interleaved in ONE process (within-session contrast).
"""
import functools
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

NCELL = 180224  # TRUST-scale cell count, padded
NR = 65536
W = 128  # accumulator row width (f32 lane tile); real scaspe rows are 753
K = 8  # chained distinct index sets per timed call


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    rng = np.random.default_rng(0)
    # K distinct index sets; each is a slice of a permutation so rows are
    # unique WITHIN a set (no pipeline-window hazard in variant C; XLA's
    # scatter-add cost does not depend on duplicates at this density)
    idx_np = np.stack([
        rng.permutation(NCELL)[:NR].astype(np.int32) for _ in range(K)
    ])
    idx_sets = jnp.asarray(idx_np)
    V = jnp.asarray(rng.random((NR, W), dtype=np.float32))
    A0 = jnp.zeros((NCELL, W), jnp.float32)

    # ---- A. XLA chained scatter-add --------------------------------------
    @jax.jit
    def xla_chain(A, idxs, V):
        def body(A, idx):
            return A.at[idx].add(V), None
        A, _ = jax.lax.scan(body, A, idxs)
        return A

    # ---- B/C. Pallas row-RMW ---------------------------------------------
    def rmw_kernel(idx_ref, A_in, V_ref, A_out, s_a, s_v, sems):
        # A_in/A_out alias the same HBM buffer; serial grid + serial row
        # loop => no write hazards
        def row(i, carry):
            idx = idx_ref[i]
            ra = pltpu.make_async_copy(
                A_out.at[pl.ds(idx, 1), :], s_a.at[pl.ds(0, 1), :],
                sems.at[0])
            rv = pltpu.make_async_copy(
                V_ref.at[pl.ds(i, 1), :], s_v.at[pl.ds(0, 1), :], sems.at[1])
            ra.start()
            rv.start()
            ra.wait()
            rv.wait()
            s_a[0, :] = s_a[0, :] + s_v[0, :]
            wb = pltpu.make_async_copy(
                s_a.at[pl.ds(0, 1), :], A_out.at[pl.ds(idx, 1), :],
                sems.at[2])
            wb.start()
            wb.wait()
            return carry

        jax.lax.fori_loop(0, NR, row, 0)

    def rmw_pipe_kernel(idx_ref, A_in, V_ref, A_out, s_a, s_v, sems):
        # double-buffered: issue row i+1's reads while row i computes;
        # index sets are duplicate-free so the lookahead read can never
        # observe a pending write of the same row
        def start_reads(i, slot):
            idx = idx_ref[i]
            pltpu.make_async_copy(
                A_out.at[pl.ds(idx, 1), :], s_a.at[pl.ds(slot, 1), :],
                sems.at[2 * slot]).start()
            pltpu.make_async_copy(
                V_ref.at[pl.ds(i, 1), :], s_v.at[pl.ds(slot, 1), :],
                sems.at[2 * slot + 1]).start()

        start_reads(0, 0)

        def row(i, carry):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < NR)
            def _():
                start_reads(i + 1, nxt)

            idx = idx_ref[i]
            pltpu.make_async_copy(
                A_out.at[pl.ds(idx, 1), :], s_a.at[pl.ds(slot, 1), :],
                sems.at[2 * slot]).wait()
            pltpu.make_async_copy(
                V_ref.at[pl.ds(i, 1), :], s_v.at[pl.ds(slot, 1), :],
                sems.at[2 * slot + 1]).wait()
            s_a[slot, :] = s_a[slot, :] + s_v[slot, :]
            wb = pltpu.make_async_copy(
                s_a.at[pl.ds(slot, 1), :], A_out.at[pl.ds(idx, 1), :],
                sems.at[4])
            wb.start()
            wb.wait()
            return carry

        jax.lax.fori_loop(0, NR, row, 0)

    def make_pallas(kernel, n_sems):
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),  # A (HBM)
                    pl.BlockSpec(memory_space=pl.ANY),  # V (HBM)
                ],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                    pltpu.VMEM((2, W), jnp.float32),
                    pltpu.VMEM((2, W), jnp.float32),
                    pltpu.SemaphoreType.DMA((n_sems,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((NCELL, W), jnp.float32),
            input_output_aliases={1: 0},  # A aliases the output
        )

        @jax.jit
        def chain(A, idxs, V):
            for k in range(K):
                A = call(idxs[k], A, V)
            return A

        return chain

    pallas_serial = make_pallas(rmw_kernel, 3)
    pallas_pipe = make_pallas(rmw_pipe_kernel, 5)

    # correctness: one distinct-index set, compare against XLA
    ref = np.zeros((NCELL, W), np.float32)
    np.add.at(ref, idx_np[0], np.asarray(V))
    same = jnp.tile(idx_sets[0][None], (K, 1))
    got = np.asarray(pallas_serial(A0, same, V))
    # chain applied the SAME set K times
    np.testing.assert_allclose(got, ref * K, rtol=1e-5)
    print("# pallas serial correctness OK", file=sys.stderr)

    variants = {
        "xla_scatter": lambda: xla_chain(A0, idx_sets, V),
        "pallas_serial": lambda: pallas_serial(A0, idx_sets, V),
        "pallas_pipe": lambda: pallas_pipe(A0, idx_sets, V),
    }
    for name, fn in variants.items():  # warm / compile
        t = time.time()
        jax.block_until_ready(fn())
        print(f"# warm {name}: {time.time() - t:.3f}s", file=sys.stderr)
    reps = int(os.environ.get("DARTRAY_PROF_REPS", "5"))
    times = {n: [] for n in variants}
    for i in range(reps):
        for name, fn in variants.items():
            t = time.time()
            jax.block_until_ready(fn())
            times[name].append((time.time() - t) / K * 1e3)  # ms per op
    out = {
        "shape": f"({NR},{W})->({NCELL},{W})", "chain": K,
        "per_op_ms": {
            n: round(float(np.median(v)), 3) for n, v in times.items()},
        "runs_ms": {n: [round(t, 2) for t in v] for n, v in times.items()},
        "device": str(dev),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
