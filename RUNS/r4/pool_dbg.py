import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
if "x64" in sys.argv:
    jax.config.update("jax_enable_x64", True)
from dartray_tpu.models import trustI
from dartray_tpu.rt import engine as E, march as M, march_pool as MP

grid = trustI.build_trustI_grid(tau_z=1.0, base=(6, 2), max_lvl=2, min_lvl=1, max_ncell=100_000)
L = 2
phys = E.Physics(dens_ref=jnp.asarray(grid.dens_ref), kext_norm=jnp.asarray([2.0, 1.0]),
                 albedo=jnp.zeros(L), gsca=jnp.zeros(L), cs=1.0, lambda_um=np.array([0.3, 1.0]))
psrc = E.point_source_set(grid, trustI.STAR_POS[None, :], np.full((1, L), 1.0))
pre = E.run_field_stage(grid, phys, psrc, mode=M.MODE_PRECALC, rad_lim=0.3, bm_par=3.0, bm_par_max=30.0)
en_lim = E.set_en_lim(grid, 0.3, 1)
kw = dict(mode=M.MODE_DIRECT, u_fest=pre.u, en_lim=en_lim, bm_par=3.0, bm_par_max=30.0)
os.environ["DARTRAY_POOL_DEBUG"] = "1"
r_pool = MP.run_pool_stage(grid, phys, psrc, nr=512, rcap=1 << 14, **kw)
print("pool:", r_pool.stats)
r_ref = E.run_field_stage(grid, phys, psrc, **kw)
print("ref :", r_ref.stats)
u1, u2 = np.asarray(r_ref.u), np.asarray(r_pool.u)
print("max rel diff:", float(np.nanmax(np.abs(u2 - u1) / np.maximum(u1, u1.max() * 1e-9))))
