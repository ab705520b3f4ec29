"""Device-mesh sharding of the RT computation.

TPU-native replacement for the reference's MPI decomposition (SURVEY.md
§2.2): the grid and field accumulators are replicated, rays are sharded
across the mesh "rays" axis (P1 source-data parallelism), wavelengths can
be sharded across a second "wave" axis (P3 wavelength sharding), and the
per-stage reductions (P6/P7: reduce_u_fest_arr / reduce_u_final_arr,
io_routines.f90:3667-3986) become jax.lax.psum over the mesh — no
fine-grained en_sca messaging (P4/P5) is needed because deposits are
scatter-adds followed by a single all-reduce.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..grid.octree import Grid
from ..rt import march as M
from ..rt import replay as REP


def make_mesh(n_rays: int, n_wave: int = 1):
    devs = np.array(jax.devices()[: n_rays * n_wave]).reshape(n_rays, n_wave)
    return Mesh(devs, ("rays", "wave"))


def sharded_march_u(mesh: Mesh, grid: Grid, dens_ref, kext_norm, albedo, batch, **kw):
    """Data-parallel march: each device traces its shard of the ray batch
    into a local field accumulator; one psum over the 'rays' axis replaces
    the reference's reduce_u_*_arr collectives."""
    L = kext_norm.shape[0]
    fdtype = batch.lum.dtype
    u0 = jnp.zeros((grid.n_cells, L), dtype=fdtype)
    ufest = kw.pop("u_fest", u0)

    ray_specs = M.RayBatch(
        src_pos=P("rays"), src_cell=P("rays"), theta=P("rays"), phi=P("rays"),
        ipix=P("rays"), lum=P("rays", None), prev=P("rays"), cc_old=P("rays"),
        isel_old=P("rays"), fresh=P("rays"), seen_other=P("rays"),
        active=P("rays"),
    )

    def local(dens_ref, kext_norm, albedo, ufest, u0, b):
        u, res = M.march(grid, dens_ref, kext_norm, albedo, ufest, u0, b, **kw)
        u = jax.lax.psum(u, "rays")
        lost = jax.lax.psum(res.lum_lost, "rays")
        return u, lost

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), ray_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(f)(dens_ref, kext_norm, albedo, ufest, u0, batch)


def sharded_train_step(mesh: Mesh, grid: Grid, cs: float):
    """A full sharded 'training step': replayed field deposits +
    gradient of a field-matching loss w.r.t. the dust density, with rays
    sharded over the 'rays' axis and wavelengths over 'wave'.

    The gradient all-reduce (psum over 'rays') is the TPU equivalent of the
    reference's parameter-reduction collectives.
    Returns a jitted function
        step(dens_ref, kext_norm, lum, cells, lengths, count, src_cell,
             csize_nc, beam_i, u_target) -> (loss, grad_dens)
    """
    lvl = jnp.asarray(grid.lvl)
    cls = jnp.asarray(grid.csize_levels())

    def local(dens_ref, kext_norm, lum, cells, lengths, count, src_cell, csize_nc, beam_i, u_target):
        def loss_fn(dens):
            u = REP.replay_field(
                dens, kext_norm, lum, cells, lengths, count, src_cell,
                csize_nc, lvl, cls, beam_i, cs,
                n_cells=grid.n_cells, point_source=False,
            )
            # local shard loss; u_target is sharded over 'wave'
            return jnp.sum((u - u_target) ** 2)

        loss, grad = jax.value_and_grad(loss_fn)(dens_ref)
        # P7-equivalent reductions: sum loss/grad over both mesh axes
        loss = jax.lax.psum(loss, ("rays", "wave"))
        grad = jax.lax.psum(grad, ("rays", "wave"))
        return loss, grad

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(),  # dens_ref: replicated
            P("wave"),  # kext_norm: wavelength-sharded (P3)
            P("rays", "wave"),  # lum
            P("rays", None),  # trace cells
            P("rays", None),  # trace lengths
            P("rays"),  # count
            P("rays"),  # src_cell
            P("rays"),  # csize_nc
            P("rays"),  # beam_i
            P(None, "wave"),  # u_target
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(f)
