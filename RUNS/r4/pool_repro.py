import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from dartray_tpu.wavelength import make_wavelength_grid, read_lambda_list
from dartray_tpu import dust as D
from dartray_tpu.models import trustI
from dartray_tpu import pipeline as P
from dartray_tpu.rt import engine as E, march as M, march_pool as MP

grid = trustI.build_trustI_grid(tau_z=0.01, base=(10, 2), max_lvl=3, min_lvl=1, max_ncell=500_000)
lam = read_lambda_list("data/TRUSTI_GRIDS/lambda_list_trustI_basic.dat")
wl = make_wavelength_grid(lam, max_lambda_stars=80.0, min_lambda_dust=1.0)
dustm = D.load_effective_dust_model("data/DUST_OPACITY/TRUST/ZDA_BARE_GR_S_Effective.dat", wl.lambda_um, lambda_ref=1.0)
tl, tf = trustI.read_planck_table("data/TRUSTI_GRIDS/BB_T10000_L100000.dat")
lum = trustI.source_luminosity(wl.lambda_um, tl, tf)[None, :]
sl = wl.stellar_slice
phys = P.make_physics(grid, dustm, sl)
src = E.point_source_set(grid, trustI.STAR_POS[None, :], lum[:, sl])
en_lim = E.set_en_lim(grid, 0.1, 1)
print("grid cells", grid.n_cells, "en_lim", en_lim)

kw = dict(mode=M.MODE_PRECALC, rad_lim=0.1, bm_par=10, bm_par_max=200, chunk=32)
pre = E.run_field_stage(grid, phys, src, **kw)
print("precalc rounds:", pre.stats)
kwd = dict(mode=M.MODE_DIRECT, u_fest=pre.u, en_lim=en_lim, bm_par=10, bm_par_max=200, chunk=32)
t=time.time(); r1 = E.run_field_stage(grid, phys, src, **kwd)
print("round driver:", r1.stats, f"{time.time()-t:.1f}s")
t=time.time(); r2 = MP.run_pool_stage(grid, phys, src, mode=M.MODE_DIRECT, u_fest=pre.u, en_lim=en_lim, bm_par=10, bm_par_max=200)
print("pool:", r2.stats, f"{time.time()-t:.1f}s")
u1, u2 = np.asarray(r1.u), np.asarray(r2.u)
print("u allclose:", np.allclose(u1, u2, rtol=1e-4, atol=u1.max()*1e-8),
      "max rel diff:", float(np.nanmax(np.abs(u2-u1)/np.maximum(u1, u1.max()*1e-12))))
