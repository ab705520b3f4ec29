"""Worker for tests/test_multihost.py: one of two cooperating processes
(2 x 4 virtual CPU devices) running a sharded field-stage march over the
global mesh (P8, initialize_mpi io_routines.f90:3610-3656).

Usage: python multihost_worker.py <port> <process_id> <out.npz>
"""
import os
import sys

port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# platform selection must go through jax.config (the env-var route is
# preempted by this environment's axon plugin registration; conftest.py
# uses the same pattern)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from dartray_tpu.parallel import distributed as DIST

DIST.initialize(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dartray_tpu.models import trustI
from dartray_tpu.rt import engine as E, march as M, rays as R
from dartray_tpu.parallel import mesh as PM

grid = trustI.build_trustI_grid(
    tau_z=1.0, base=(6, 2), max_lvl=2, min_lvl=1, max_ncell=100_000
)
L = 2
kext_norm = np.array([2.0, 1.0])
albedo = np.zeros(L)
psrc = E.point_source_set(grid, trustI.STAR_POS[None, :], np.ones((1, L)))
launch = R.fresh_launch(psrc.pos, psrc.cell, np.array([0]), psrc.lum)
NRAYS = len(launch["src_cell"])
pad = -NRAYS % 8
batch_host, beam_host, _ = R._to_batch(launch, L, pad_to=NRAYS + pad)

mesh = DIST.global_ray_mesh()
assert mesh.shape["rays"] == 8

# global sharded batch: every process holds identical host data and feeds
# the shards its local devices own
import dataclasses

specs = PM._BATCH_SPECS
batch = M.RayBatch(**{
    f.name: DIST.host_local_batch(
        mesh, getattr(specs, f.name), np.asarray(getattr(batch_host, f.name))
    )
    for f in dataclasses.fields(M.RayBatch)
})

u, lost = PM.sharded_march_u(
    mesh, grid, jnp.asarray(np.asarray(grid.dens_ref)),
    jnp.asarray(kext_norm), jnp.asarray(albedo), batch,
    beam_i=float(4 * np.pi / (12 * 16)),  # nside=4, scalar: replicable
    mode=M.MODE_PRECALC, point_source=True, rad_lim_dist=1e9,
    bm_par=1e9, bm_par_max=1e12, allow_block=False, cs=1.0,
    max_steps=10000,
)
# the psum result is replicated: every process can read it whole
np.savez(out_path, u=np.asarray(u), lost=np.asarray(lost))
print(f"# process {pid}: ok, u_max={float(np.asarray(u).max()):.6e}",
      flush=True)
