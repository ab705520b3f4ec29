import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from dartray_tpu.wavelength import make_wavelength_grid
from dartray_tpu import dust as D
from dartray_tpu.models import trustI
from dartray_tpu import pipeline as P
from dartray_tpu.rt import engine as E, march as M, march_pool as MP
from dartray_tpu.rt import rays as R

NR = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
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
L = 3
fdtype = jnp.float32
from dartray_tpu.rt.engine import grid_nav
state = MP.make_state(grid, L, NR=NR, R=1 << 19, fdtype=fdtype)
launch = R.fresh_launch(psrc.pos, psrc.cell, np.array([0]), np.asarray(psrc.lum))
fmat, imat, I0, n = MP._records_from_dict(
    dict(launch, nside=np.full(192, 4, np.int64)),
    np.asarray(grid.dens_ref, np.float64), np.asarray(grid.csize, np.float64), L, fdtype)
W = MP.PUSH_W
fp = np.zeros((fmat.shape[0], W)); fp[:, :n] = fmat
ip = np.zeros((imat.shape[0], W), np.int32); ip[:, :n] = imat
Ip = np.zeros((W, L)); Ip[:n] = I0
state = MP.push_records(state, jnp.asarray(fp, fdtype), jnp.asarray(ip), jnp.asarray(Ip, fdtype), jnp.asarray(n, jnp.int32))
u0 = jnp.zeros((grid.n_cells, L), fdtype)
kw = dict(mode=M.MODE_DIRECT, point_source=True, en_lim=float(en_lim),
          rad_lim_dist=float(np.inf), bm_par=10.0, bm_par_max=200.0,
          cs=phys.cs, nav=grid_nav(grid), use_walls=False, k_max=64)
dens_ref = jnp.asarray(grid.dens_ref, fdtype)
kext = jnp.asarray(phys.kext_norm, fdtype)
alb = jnp.asarray(phys.albedo, fdtype)
ufest = jnp.asarray(pre.u, fdtype)
for call in range(8):
    u0, state = MP.pool_march(grid, dens_ref, kext, alb, ufest, u0, state, **kw)
    st = np.asarray(MP._status(state))
    rptr, qhead, blp, nact, minlive, nst = st
    print(f"call {call}: rptr={rptr} qhead={qhead} bl={blp} act={nact} steps={nst}")
    rf = np.asarray(state["rec_f"]); ri = np.asarray(state["rec_i"]); rI = np.asarray(state["rec_I0"])
    if rptr > 192:
        ch = slice(192, rptr)
        th, ph = rf[MP.RF_TH, ch], rf[MP.RF_PH, ch]
        sx, sy, sz = rf[MP.RF_SX, ch], rf[MP.RF_SY, ch], rf[MP.RF_SZ, ch]
        prev0 = rf[MP.RF_PREV0, ch]
        ns = ri[MP.RI_NSIDE, ch]
        I0c = rI[ch]
        d = np.stack([np.sin(th)*np.cos(ph), np.sin(th)*np.sin(ph), np.cos(th)], -1)
        pos = np.stack([sx, sy, sz], -1) + prev0[:, None]*d
        out = np.any(np.abs(pos) > 5.0, axis=1)
        print(f"  children: n={rptr-192} nside_range={ns.min()}-{ns.max()} "
              f"prev0=[{prev0.min():.2f},{prev0.max():.2f}] outside={out.sum()} "
              f"I0_zero_rows={(I0c.max(axis=1)==0).sum()} th_bad={((th<0)|(th>np.pi)).sum()}")
    if nact == 0 and qhead == rptr:
        break
