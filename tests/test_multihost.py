"""Multi-host execution (P8): two cooperating processes, 4 virtual CPU
devices each, march one sharded field stage over the 8-device global mesh
and must agree with the single-process result.

The TPU-native analog of the reference's MPI environment (initialize_mpi
io_routines.f90:3610-3656): every process runs the same program;
jax.distributed connects them (parallel/distributed.py).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_field_stage(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"p{i}.npz" for i in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count (4)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), str(outs[i])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        logs.append(out.decode())
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    # single-process reference (this test process: 8 virtual devices)
    import jax.numpy as jnp
    from dartray_tpu.models import trustI
    from dartray_tpu.rt import engine as E, march as M, rays as R

    grid = trustI.build_trustI_grid(
        tau_z=1.0, base=(6, 2), max_lvl=2, min_lvl=1, max_ncell=100_000
    )
    L = 2
    psrc = E.point_source_set(grid, trustI.STAR_POS[None, :], np.ones((1, L)))
    launch = R.fresh_launch(psrc.pos, psrc.cell, np.array([0]), psrc.lum)
    n = len(launch["src_cell"])
    batch, _, _ = R._to_batch(launch, L, pad_to=n + (-n % 8))
    u0 = jnp.zeros((grid.n_cells, L))
    u_ref, _ = M.march(
        grid, jnp.asarray(np.asarray(grid.dens_ref)),
        jnp.asarray(np.array([2.0, 1.0])), jnp.zeros(L), u0, u0, batch,
        beam_i=float(4 * np.pi / (12 * 16)),
        mode=M.MODE_PRECALC, point_source=True, rad_lim_dist=1e9,
        bm_par=1e9, bm_par_max=1e12, allow_block=False, cs=1.0,
        max_steps=10000,
    )
    u_ref = np.asarray(u_ref)

    for o in outs:
        d = np.load(o)
        np.testing.assert_allclose(
            d["u"], u_ref, rtol=1e-10, atol=u_ref.max() * 1e-13
        )
    # both processes computed the identical replicated result
    np.testing.assert_array_equal(np.load(outs[0])["u"], np.load(outs[1])["u"])
