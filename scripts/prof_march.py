"""Profile the march kernel body on the TRUST I bench workload.

Times march() per while-loop iteration at several max_steps, then ablates
body pieces via march's module globals to find the dominant cost.
Run on the real TPU:  python scripts/prof_march.py
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


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    grid = trustI.build_trustI_grid(
        tau_z=0.01, base=(10, 2), max_lvl=4, min_lvl=1, max_ncell=4_000_000
    )
    lam = read_lambda_list(os.path.join(ROOT, "data/TRUSTI_GRIDS/lambda_list_trustI_basic.dat"))
    wl = make_wavelength_grid(lam, max_lambda_stars=80.0, min_lambda_dust=1.0)
    dustm = D.load_effective_dust_model(
        os.path.join(ROOT, "data/DUST_OPACITY/TRUST/ZDA_BARE_GR_S_Effective.dat"),
        wl.lambda_um, lambda_ref=1.0,
    )
    sl = wl.stellar_slice
    phys = P.make_physics(grid, dustm, sl)
    L = phys.kext_norm.shape[0]
    Lp = int(os.environ.get("PROF_L", L))
    if Lp != L:  # truncate or tile the wavelength axis for scaling tests
        reps = (Lp + L - 1) // L
        idx = np.tile(np.arange(L), reps)[:Lp]
        phys.kext_norm = np.asarray(phys.kext_norm)[idx]
        phys.albedo = np.asarray(phys.albedo)[idx]
        phys.gsca = np.asarray(phys.gsca)[idx]
        L = Lp
    NR = int(os.environ.get("PROF_NR", 65536))
    src = E.point_source_set(grid, trustI.STAR_POS[None, :], np.ones((1, L)))
    fdtype = jnp.float32

    # realistic batch: NR rays from the point source
    nside = 128
    while 12 * nside * nside < NR:
        nside *= 2
    pix = np.arange(12 * nside * nside)
    rng = np.random.default_rng(0)
    pix = rng.choice(pix, size=NR, replace=False)
    launch = R.fresh_launch(src.pos, src.cell, np.array([0]),
                            np.ones((1, L)), nside=nside, pix_subset=pix)
    batch, _, _ = R._to_batch(launch, L, pad_to=NR, fdtype=fdtype)

    from dartray_tpu.grid.octree import build_nav_table
    nav = (None if os.environ.get("PROF_NONAV") else
           jnp.asarray(build_nav_table(grid), dtype=jnp.int32))
    dens_ref = jnp.asarray(grid.dens_ref, dtype=fdtype)
    kext_norm = jnp.asarray(phys.kext_norm, dtype=fdtype)
    albedo = jnp.asarray(phys.albedo, dtype=fdtype)
    u0 = jnp.zeros((grid.n_cells, L), dtype=fdtype)
    beam_i = jnp.full((batch.n,), 4 * np.pi / (12 * nside**2), dtype=fdtype)
    can_merge = jnp.zeros((batch.n,), dtype=bool)

    def run(ms=96):
        u, res = M.march(
            grid, dens_ref, kext_norm, albedo, u0, u0, batch,
            mode=M.MODE_DIRECT, point_source=True, beam_i=beam_i,
            en_lim=1e-9, rad_lim_dist=1e9, bm_par=10.0, bm_par_max=200.0,
            allow_block=can_merge, cs=phys.cs, max_steps=ms, nav=nav,
        )
        jax.block_until_ready(u)
        return res

    for ms in (96, 12):
        tc = time.perf_counter()
        res = run(ms)  # compile
        tcomp = time.perf_counter() - tc
        t = time.perf_counter()
        for _ in range(3):
            res = run(ms)
        dt = (time.perf_counter() - t) / 3
        steps = int(np.asarray(res.n_steps))
        abl = os.environ.get("DARTRAY_ABLATE", "-")
        print(f"ablate={abl:32s} max_steps={ms:3d}: {dt*1e3:8.2f} ms "
              f"({dt/ms*1e3:6.3f} ms/iter, steps={steps}, compile {tcomp:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
