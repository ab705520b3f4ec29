"""Within-session A/B of an env knob on the TRUST scattering slice.

Round-5 protocol: any A/B that matters must be a within-run contrast
(RUNS/ROUND5_NOTES.md section 3).  This runs one TRUST scattering-slice
iteration alternately for each value of the knob in ONE process on one
device session, interleaved A/B/A/B so tunnel drift cannot masquerade as
a win.  Usage:

  DARTRAY_AB_KNOB=DARTRAY_STEP_CHUNK DARTRAY_AB_VALUES=0,24 \
  DARTRAY_BENCH_SCATT_EVERY=512 python scripts/ab_scatter.py

The knob is re-read per run_field_stage call, so toggling the env var
between iterations is a clean contrast (march variants compile per
distinct static configuration; the warm pass pays that once per value).
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(ROOT, "RUNS", "jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from dartray_tpu.config import RTConfig
    from dartray_tpu.wavelength import make_wavelength_grid, read_lambda_list
    from dartray_tpu import dust as D
    from dartray_tpu.models import trustI
    from dartray_tpu import pipeline as P
    from dartray_tpu.rt import engine as E
    from dartray_tpu.rt import march as M
    from dartray_tpu.rt import scattering as SC

    knob = os.environ.get("DARTRAY_AB_KNOB", "DARTRAY_STEP_CHUNK")
    values = os.environ.get("DARTRAY_AB_VALUES", "0,24").split(",")

    dev = jax.devices()[0]
    print(f"# device: {dev}  knob: {knob} in {values}", file=sys.stderr)
    grid = trustI.build_trustI_grid(
        tau_z=0.01, base=(10, 2), max_lvl=4, min_lvl=1, max_ncell=4_000_000
    )
    lam = read_lambda_list(
        os.path.join(ROOT, "data/TRUSTI_GRIDS/lambda_list_trustI_basic.dat"))
    wl = make_wavelength_grid(lam, max_lambda_stars=80.0, min_lambda_dust=1.0)
    dustm = D.load_effective_dust_model(
        os.path.join(ROOT, "data/DUST_OPACITY/TRUST/ZDA_BARE_GR_S_Effective.dat"),
        wl.lambda_um, lambda_ref=1.0,
    )
    tl, tf = trustI.read_planck_table(
        os.path.join(ROOT, "data/TRUSTI_GRIDS/BB_T10000_L100000.dat"))
    lum = trustI.source_luminosity(wl.lambda_um, tl, tf)[None, :]
    cfg = RTConfig(
        accuracy=0.1, bm_par=10, bm_par_sca=5, bm_par_max=200, rad_lim=0.1,
        kp_sca_max=1, use_p_src=True,
    ).validate()
    sl = wl.stellar_slice
    phys = P.make_physics(grid, dustm, sl)
    src = E.point_source_set(grid, trustI.STAR_POS[None, :], lum[:, sl])
    en_lim = E.set_en_lim(grid, cfg.accuracy, 1)
    print(f"# grid: {grid.n_cells} cells, L={wl.lnum_stars}", file=sys.stderr)

    pre = E.run_field_stage(
        grid, phys, src, mode=M.MODE_PRECALC, rad_lim=cfg.rad_lim,
        bm_par=cfg.bm_par, bm_par_max=cfg.bm_par_max, chunk=32,
    )
    jax.block_until_ready(pre.u)
    scfg = SC.ScaspeConfig.make(cfg.kp_sca_max, dustm.gsca[sl], None)
    rs = E.run_field_stage(
        grid, phys, src, mode=M.MODE_DIRECT, u_fest=pre.u,
        en_lim=en_lim, bm_par=cfg.bm_par, bm_par_max=cfg.bm_par_max,
        chunk=32, scaspe_cfg=scfg,
        scaspe_init=scfg.zeros(grid.n_cells, jnp.float32),
    )
    jax.block_until_ready(rs.u)
    print("# direct seed done", file=sys.stderr)

    every = int(os.environ.get("DARTRAY_BENCH_SCATT_EVERY", "512"))
    keep = (jnp.arange(grid.n_cells) % every == 0).astype(jnp.float32)
    sub = tuple(s * keep[:, None, None] for s in rs.scaspe)

    def one_iter():
        t = time.time()
        sres = SC.run_scattering(
            grid, phys, scfg, sub, rs.u,
            conv_en_lim=cfg.conv_en_lim, en_lim=en_lim,
            bm_par_sca=cfg.bm_par_sca, bm_par_max=cfg.bm_par_max,
            max_iterations=1, chunk=32,
        )
        jax.block_until_ready(sres.u_final)
        return time.time() - t, sres

    reps = int(os.environ.get("DARTRAY_AB_REPS", "3"))
    results = {v: [] for v in values}
    rays_by = {}
    for v in values:  # warm both variants (compile cost out of the contrast)
        os.environ[knob] = v
        t, sres = one_iter()
        rays_by[v] = sres.stats.get("scatt_rays", 0)
        print(f"# warm {knob}={v}: {t:.2f}s rays={rays_by[v]}", file=sys.stderr)
    for i in range(reps):
        for v in values:
            os.environ[knob] = v
            t, sres = one_iter()
            results[v].append(t)
            rays = sres.stats.get("scatt_rays", 0)
            print(f"# rep {i} {knob}={v}: {t:.2f}s ({rays / t:,.0f} rays/s)",
                  file=sys.stderr)
    out = {
        "knob": knob,
        "every": every,
        "runs_s": {v: [round(t, 2) for t in results[v]] for v in values},
        "median_s": {
            v: round(float(np.median(results[v])), 2) for v in values},
        "rays": rays_by,
        "device": str(dev),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
