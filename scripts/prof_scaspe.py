"""Profile the scattering-deposit march (collect_en_sca) per iteration.

The scattering stage deposits (NR, P_k, L_k) HG-weighted values into the
scaspe buckets every intersection (process_scatt_rad,
rt_routines.f90:2638-2726).  Measures the per-iteration cost vs the plain
direct march at several NR, to size the scaspe-stage pool.
Run on the real TPU:  python scripts/prof_scaspe.py
"""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

from dartray_tpu.wavelength import make_wavelength_grid, read_lambda_list
from dartray_tpu import dust as D
from dartray_tpu.models import trustI
from dartray_tpu import pipeline as P
from dartray_tpu.rt import engine as E
from dartray_tpu.rt import march as M
from dartray_tpu.rt import rays as R
from dartray_tpu.rt import scattering as SC


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    grid = trustI.build_trustI_grid(
        tau_z=0.01, base=(10, 2), max_lvl=4, min_lvl=1, max_ncell=4_000_000
    )
    lam = read_lambda_list(os.path.join(
        ROOT, "data/TRUSTI_GRIDS/lambda_list_trustI_basic.dat"))
    wl = make_wavelength_grid(lam, max_lambda_stars=80.0, min_lambda_dust=1.0)
    dustm = D.load_effective_dust_model(
        os.path.join(ROOT, "data/DUST_OPACITY/TRUST/ZDA_BARE_GR_S_Effective.dat"),
        wl.lambda_um, lambda_ref=1.0,
    )
    sl = wl.stellar_slice
    phys = P.make_physics(grid, dustm, sl)
    L = phys.kext_norm.shape[0]
    scfg = SC.ScaspeConfig.make(1, dustm.gsca[sl], None)
    print("# buckets:", [(b.kp, b.npix_tot, len(b.lam_idx)) for b in scfg.buckets],
          flush=True)
    fdtype = jnp.float32
    from dartray_tpu.grid.octree import build_nav_table
    nav = jnp.asarray(build_nav_table(grid), dtype=jnp.int32)
    dens_ref = jnp.asarray(grid.dens_ref, dtype=fdtype)
    kext_norm = jnp.asarray(phys.kext_norm, dtype=fdtype)
    albedo = jnp.asarray(phys.albedo, dtype=fdtype)
    u0 = jnp.zeros((grid.n_cells, L), dtype=fdtype)

    # sources: slab cells (like a scattering iteration)
    leaf = np.asarray(grid.leaf_mask())
    cc = np.asarray(grid.ccoord)
    slab = np.flatnonzero(leaf & (cc[:, 2] < -2) & (cc[:, 2] > -5))
    rng = np.random.default_rng(0)

    kw = dict(
        mode=M.MODE_DIRECT, point_source=False, en_lim=1e-12,
        rad_lim_dist=1e9, bm_par=5.0, bm_par_max=200.0, cs=phys.cs,
        nav=nav, collect_en_sca=True,
        scaspe_dirs=tuple(jnp.asarray(b.dirs, dtype=fdtype)
                          for b in scfg.buckets),
        scaspe_g=tuple(jnp.asarray(np.asarray(phys.gsca)[b.lam_idx],
                                   dtype=fdtype) for b in scfg.buckets),
        scaspe_npix_hp=tuple(b.npix_hp for b in scfg.buckets),
        scaspe_lam_idx=scfg.lam_idx_tuple(),
    )

    for NR in (16384, 65536):
        nsrc = NR // 192
        sel = rng.choice(slab, size=nsrc, replace=False)
        launch = R.fresh_launch(cc[sel], sel, np.arange(nsrc),
                                np.ones((nsrc, L)))
        batch, beam_i, _ = R._to_batch(launch, L, pad_to=NR, fdtype=fdtype)
        can_merge = jnp.zeros((batch.n,), dtype=bool)
        sca0 = scfg.zeros(grid.n_cells, fdtype)

        def run(ms):
            u, res, sca = M.march(
                grid, dens_ref, kext_norm, albedo, u0, u0, batch,
                beam_i=beam_i, allow_block=can_merge, max_steps=ms,
                scaspe_accum=sca0, **kw,
            )
            jax.block_until_ready(u)
            return res

        for ms in (96, 12):
            tc = time.perf_counter()
            res = run(ms)
            tcomp = time.perf_counter() - tc
            t = time.perf_counter()
            for _ in range(3):
                res = run(ms)
            dt = (time.perf_counter() - t) / 3
            steps = int(np.asarray(res.n_steps))
            print(f"NR={NR:6d} max_steps={ms:3d}: {dt*1e3:8.2f} ms "
                  f"({dt/ms*1e3:6.3f} ms/iter, steps={steps}, "
                  f"compile {tcomp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
