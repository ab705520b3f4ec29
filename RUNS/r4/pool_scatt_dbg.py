import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from dartray_tpu.models import trustI
from dartray_tpu.rt import engine as E, march as M, march_pool as MP
from dartray_tpu.rt import scattering as SC

grid = trustI.build_trustI_grid(tau_z=1.0, base=(10, 2), max_lvl=2, min_lvl=1, max_ncell=100_000)
L = 3
phys2 = E.Physics(
    dens_ref=jnp.asarray(grid.dens_ref), kext_norm=jnp.asarray([2.0, 1.0, 0.5]),
    albedo=jnp.asarray([0.5, 0.4, 0.3]), gsca=jnp.asarray([0.6, 0.3, 0.0]),
    cs=1.0, lambda_um=np.array([0.3, 1.0, 2.0]))
psrc = E.point_source_set(grid, trustI.STAR_POS[None, :], np.ones((1, L)))
scfg = SC.ScaspeConfig.make(1, np.asarray(phys2.gsca), None)
kw = dict(mode=M.MODE_DIRECT, en_lim=1e-12, bm_par=3.0, bm_par_max=30.0, scaspe_cfg=scfg)
direct = E.run_field_stage(grid, phys2, psrc, scaspe_init=scfg.zeros(grid.n_cells, jnp.float64), **kw)
skw = dict(conv_en_lim=0.05, en_lim=1e-12, bm_par_sca=2.0, bm_par_max=30.0, max_iterations=1, chunk=8)
s_ref = SC.run_scattering(grid, phys2, scfg, direct.scaspe, direct.u, **skw)
os.environ["DARTRAY_POOL"] = "1"
s_pool = SC.run_scattering(grid, phys2, scfg, direct.scaspe, direct.u, **skw)
os.environ.pop("DARTRAY_POOL")
print("ref  stats:", {k: v for k, v in s_ref.stats.items() if np.isscalar(v)})
print("pool stats:", {k: v for k, v in s_pool.stats.items() if np.isscalar(v)})
print("ref  lum_lost:", s_ref.lum_lost)
print("pool lum_lost:", s_pool.lum_lost)
u1 = np.asarray(s_ref.u_final); u2 = np.asarray(s_pool.u_final)
ud = np.asarray(direct.u)
print("delta-u sums ref :", (u1 - ud).sum(axis=0))
print("delta-u sums pool:", (u2 - ud).sum(axis=0))
for k, (a, b) in enumerate(zip(s_pool.scaspe_tot, s_ref.scaspe_tot)):
    a, b = np.asarray(a), np.asarray(b)
    print(f"scaspe[{k}] sums ref={b.sum():.6e} pool={a.sum():.6e}")
