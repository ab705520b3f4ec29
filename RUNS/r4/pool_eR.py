import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
import dartray_tpu.rt.march_pool as MP
mode = sys.argv[1]
if mode == "ecap32":
    MP.E_CAP_FACTOR = 32   # E = 262144 != R
    nr, rcap = 8192, 1 << 19
elif mode == "r3":
    nr, rcap = 8192, 3 << 17  # R = 393216 != E = 524288
elif mode == "nr6144":
    nr, rcap = 6144, 1 << 19  # E = 393216 != R
import jax.numpy as jnp
from dartray_tpu.wavelength import make_wavelength_grid
from dartray_tpu import dust as D
from dartray_tpu.models import trustI
from dartray_tpu import pipeline as P
from dartray_tpu.rt import engine as E, march as M

grid = trustI.build_trustI_grid(tau_z=0.01, base=(6, 2), max_lvl=2, min_lvl=1, max_ncell=100_000)
lam = np.array([0.4, 1.0, 10.0])
wl = make_wavelength_grid(lam, max_lambda_stars=80.0)
dustm = D.load_effective_dust_model("data/DUST_OPACITY/TRUST/ZDA_BARE_GR_S_Effective.dat", wl.lambda_um, lambda_ref=1.0)
tl, tf = trustI.read_planck_table("data/TRUSTI_GRIDS/BB_T10000_L100000.dat")
lum = trustI.source_luminosity(wl.lambda_um, tl, tf)[None, :]
phys = P.make_physics(grid, dustm, wl.stellar_slice)
psrc = E.point_source_set(grid, trustI.STAR_POS[None, :], lum[:, wl.stellar_slice])
pre = E.run_field_stage(grid, phys, psrc, mode=M.MODE_PRECALC, rad_lim=0.1, bm_par=10.0, bm_par_max=200.0, chunk=32)
en_lim = E.set_en_lim(grid, 0.1, 1)
kw = dict(mode=M.MODE_DIRECT, u_fest=pre.u, en_lim=en_lim, bm_par=10.0, bm_par_max=200.0)
r_pool = MP.run_pool_stage(grid, phys, psrc, nr=nr, rcap=rcap, **kw)
print(f"mode={mode} pool:", r_pool.stats, flush=True)
