"""Dev: compare march_fast vs march_legacy on small TRUST workloads."""
import os, sys
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from dartray_tpu.models import trustI
from dartray_tpu.rt import engine as E
from dartray_tpu.rt import march as M
from dartray_tpu.rt.march_fast import march_fast
from dartray_tpu.rt import rays as R

L = 5
grid = trustI.build_trustI_grid(tau_z=1.0, base=(10, 2), max_lvl=3,
                                min_lvl=1, max_ncell=100_000)
print("ncell", grid.n_cells)
nav = E.grid_nav(grid)
kext_norm = jnp.linspace(2.0, 0.5, L)
albedo = jnp.full((L,), 0.4)
dens_ref = jnp.asarray(grid.dens_ref)
u0 = jnp.zeros((grid.n_cells, L))

src = E.point_source_set(grid, trustI.STAR_POS[None, :], np.ones((1, L)))
launch = R.fresh_launch(src.pos, src.cell, np.array([0]), src.lum)
batch, beam_i, can_merge = R._to_batch(launch, L, pad_to=256, fdtype=jnp.float64)

# also cell sources
csrc_sel = np.flatnonzero(np.asarray(grid.leaf_mask()))[::97][:40]
pos_c = np.asarray(grid.ccoord)[csrc_sel]
lum_c = np.abs(np.random.default_rng(0).normal(1.0, 0.2, (len(csrc_sel), L)))
launch_c = R.fresh_launch(pos_c, csrc_sel, np.arange(len(csrc_sel)), lum_c)
batch_c, beam_c, merge_c = R._to_batch(
    launch_c, L, pad_to=R._bucket(len(csrc_sel) * 192), fdtype=jnp.float64)

# precompute a fake u_fest for the kill test
rng = np.random.default_rng(1)
ufest = jnp.asarray(np.abs(rng.normal(1e-9, 1e-9, (grid.n_cells, L))))


def compare(name, kw, b, bi, cm, ufest_in=None, scaspe=None):
    uf = ufest_in if ufest_in is not None else u0
    args = (grid, dens_ref, kext_norm, albedo, uf, u0, b)
    kw = dict(kw, beam_i=bi, allow_block=cm, nav=nav)
    if scaspe is not None:
        kw_s = dict(kw, collect_en_sca=True, **scaspe)
        u1, r1, s1 = M.march_legacy(*args, **kw_s)
        u2, r2, s2 = march_fast(*args, **kw_s)
    else:
        u1, r1 = M.march_legacy(*args, **kw)
        u2, r2 = march_fast(*args, **kw)
        s1 = s2 = None
    ok = True

    def chk(tag, a, b, tol=1e-10):
        nonlocal ok
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == bool or np.issubdtype(a.dtype, np.integer):
            good = np.array_equal(a, b)
            if not good:
                ii = np.flatnonzero(np.ravel(a != b))[:5]
                print(f"  MISMATCH {tag}: {ii} a={np.ravel(a)[ii]} b={np.ravel(b)[ii]}")
        else:
            good = np.allclose(a, b, rtol=tol, atol=1e-30)
            if not good:
                d = np.abs(a - b) / (np.abs(a) + 1e-30)
                ii = np.unravel_index(np.argmax(d), d.shape)
                print(f"  MISMATCH {tag}: maxrel={d.max():.3e} at {ii} a={a[ii]} b={b[ii]}")
        ok &= good

    chk("u", u1, u2)
    chk("status", r1.status, r2.status)
    chk("lum", r1.lum, r2.lum)
    chk("prev", r1.prev, r2.prev)
    chk("cc", r1.cc, r2.cc)
    chk("isel_old", r1.isel_old, r2.isel_old)
    chk("dplane", r1.dplane, r2.dplane)
    chk("lum_lost", r1.lum_lost, r2.lum_lost)
    chk("i_obs", r1.i_obs, r2.i_obs)
    chk("n_steps", int(r1.n_steps), int(r2.n_steps))
    if s1 is not None:
        for k, (a, b) in enumerate(zip(s1, s2)):
            chk(f"scaspe[{k}]", a, b)
    print(("PASS " if ok else "FAIL ") + name)
    return ok


allok = True
allok &= compare("precalc point", dict(
    mode=M.MODE_PRECALC, point_source=True, rad_lim_dist=0.3 * grid.modelsize,
    bm_par=10.0, bm_par_max=200.0, cs=1.0, max_steps=96), batch, beam_i, can_merge)
allok &= compare("direct point kill", dict(
    mode=M.MODE_DIRECT, point_source=True, en_lim=5e-4,
    bm_par=10.0, bm_par_max=200.0, cs=1.0, max_steps=96),
    batch, beam_i, can_merge, ufest_in=ufest)
allok &= compare("direct cells", dict(
    mode=M.MODE_DIRECT, point_source=False, en_lim=5e-4,
    bm_par=10.0, bm_par_max=200.0, cs=1.0, max_steps=64),
    batch_c, beam_c, merge_c, ufest_in=ufest)

# scaspe buckets
from dartray_tpu.rt import scattering as SC
cfg_s = SC.ScaspeConfig.make(1, np.asarray(jnp.linspace(0.1, 0.9, L)),
                             dir_out=np.array([[0.3, 1.2]]))
gsca = jnp.linspace(0.1, 0.9, L)
scaspe0 = tuple(
    jnp.zeros((grid.n_cells, b.dirs.shape[0], len(b.lam_idx)))
    for b in cfg_s.buckets
)
sca_kw = dict(
    scaspe_dirs=tuple(jnp.asarray(b.dirs) for b in cfg_s.buckets),
    scaspe_g=tuple(jnp.asarray(np.asarray(gsca)[b.lam_idx]) for b in cfg_s.buckets),
    scaspe_npix_hp=tuple(b.npix_hp for b in cfg_s.buckets),
    scaspe_lam_idx=cfg_s.lam_idx_tuple(),
    scaspe_accum=scaspe0,
)
allok &= compare("direct cells scaspe", dict(
    mode=M.MODE_DIRECT, point_source=False, en_lim=5e-4,
    bm_par=10.0, bm_par_max=200.0, cs=1.0, max_steps=64),
    batch_c, beam_c, merge_c, ufest_in=ufest, scaspe=sca_kw)

# iobs external
d = dict(
    src_pos=pos_c, src_cell=csrc_sel, src_idx=np.arange(len(csrc_sel)),
    ipix=np.zeros(len(csrc_sel), dtype=np.int64),
    theta=np.full(len(csrc_sel), 0.7), phi=np.full(len(csrc_sel), 2.1),
    lum=lum_c, prev=np.zeros(len(csrc_sel)), cc_old=csrc_sel,
    isel_old=np.full(len(csrc_sel), -1, dtype=np.int64),
    dplane=np.zeros(len(csrc_sel)), fresh=np.ones(len(csrc_sel), dtype=bool),
)
b_io, bi_io, cm_io = R._to_batch(d, L, pad_to=64, fdtype=jnp.float64)
allok &= compare("iobs ext", dict(mode=M.MODE_IOBS, point_source=False, cs=1.0),
                 b_io, bi_io, cm_io)

# iobs internal
obs = np.array([0.8, -1.1, 2.0])
vec = obs[None, :] - pos_c
vm = np.sqrt((vec**2).sum(1))
th = np.arccos(np.clip(vec[:, 2] / np.maximum(vm, 1e-300), -1, 1))
ph = np.arctan2(vec[:, 1], vec[:, 0]) % (2 * np.pi)
d2 = dict(d, theta=th, phi=ph)
b_in, bi_in, cm_in = R._to_batch(d2, L, pad_to=64, fdtype=jnp.float64)
vmj = jnp.zeros(64).at[: len(vm)].set(jnp.asarray(vm))
allok &= compare("iobs internal", dict(mode=M.MODE_IOBS_IN, point_source=False,
                                       cs=1.0, vec_mod=vmj),
                 b_in, bi_in, cm_in)

print("ALL OK" if allok else "FAILURES")
sys.exit(0 if allok else 1)
