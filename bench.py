"""Benchmark: rays/sec/chip on the TRUST I slab direct-light stage.

Runs the reference benchmark workload (TRUST I slab, tau_z=0.01, base=(10,2),
max_lvl=4, accuracy=0.1, bm_par=10, bm_par_max=200, rad_lim=0.1 — from
data/TRUSTI_GRIDS/input_trustI_tau0.01_LD.in) on the local accelerator and
prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

vs_baseline compares against data/bench_baseline.json (the first recorded
run of this framework; the reference publishes no numbers — BASELINE.md).
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
BASELINE_FILE = os.path.join(ROOT, "data", "bench_baseline.json")


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeat bench runs skip the ~60-75 s warm-up
    # (round-3 weak #6); harmless no-op if the backend doesn't support it
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

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    # benchmark workload (input_trustI_tau0.01_LD.in)
    grid = trustI.build_trustI_grid(
        tau_z=0.01, base=(10, 2), max_lvl=4, min_lvl=1, max_ncell=4_000_000
    )
    lam = read_lambda_list(os.path.join(ROOT, "data/TRUSTI_GRIDS/lambda_list_trustI_basic.dat"))
    wl = make_wavelength_grid(lam, max_lambda_stars=80.0, min_lambda_dust=1.0)
    dustm = D.load_effective_dust_model(
        os.path.join(ROOT, "data/DUST_OPACITY/TRUST/ZDA_BARE_GR_S_Effective.dat"),
        wl.lambda_um, lambda_ref=1.0,
    )
    tl, tf = trustI.read_planck_table(
        os.path.join(ROOT, "data/TRUSTI_GRIDS/BB_T10000_L100000.dat")
    )
    lum = trustI.source_luminosity(wl.lambda_um, tl, tf)[None, :]
    cfg = RTConfig(
        accuracy=0.1, bm_par=10, bm_par_sca=5, bm_par_max=200, rad_lim=0.1,
        kp_sca_max=1, use_p_src=True,
    ).validate()
    print(f"# grid: {grid.n_cells} cells, L={wl.lnum_stars}, setup {time.time()-t0:.1f}s",
          file=sys.stderr)

    sl = wl.stellar_slice
    phys = P.make_physics(grid, dustm, sl)
    src = E.point_source_set(grid, trustI.STAR_POS[None, :], lum[:, sl])
    en_lim = E.set_en_lim(grid, cfg.accuracy, 1)

    def run_direct(u_fest):
        t = time.time()
        r = E.run_field_stage(
            grid, phys, src, mode=M.MODE_DIRECT, u_fest=u_fest,
            en_lim=en_lim, bm_par=cfg.bm_par, bm_par_max=cfg.bm_par_max,
            chunk=32,
        )
        jax.block_until_ready(r.u)
        return r, time.time() - t

    # precalc (gives u_fest for the kill criterion)
    t = time.time()
    pre = E.run_field_stage(
        grid, phys, src, mode=M.MODE_PRECALC, rad_lim=cfg.rad_lim,
        bm_par=cfg.bm_par, bm_par_max=cfg.bm_par_max, chunk=32,
    )
    jax.block_until_ready(pre.u)
    t_pre = time.time() - t
    print(f"# precalc: {t_pre:.2f}s rays={pre.stats.get('rays')} steps={pre.stats.get('steps')}",
          file=sys.stderr)

    # warmup (compiles), then MEDIAN of >= 3 measured runs: the remote-TPU
    # tunnel's run-to-run spread reached +-40% in rounds 3-4 (BASELINE.md
    # round-5 protocol note), so a single measurement cannot adjudicate
    # an optimization
    r1, t1 = run_direct(pre.u)
    n_rep = max(1, int(os.environ.get("DARTRAY_BENCH_REPEATS", "5")))
    runs = []
    r2 = r1
    for _ in range(n_rep):
        r2, t_i = run_direct(pre.u)
        runs.append(t_i)
    t2 = float(np.median(runs))
    rays = r2.stats["rays"]
    steps = r2.stats["steps"]
    iters = r2.stats.get("iters", 0)
    rays_per_sec = rays / t2
    print(
        f"# direct: warm {t1:.2f}s, median {t2:.2f}s of "
        f"{[round(t, 2) for t in runs]}, rays={rays}, "
        f"steps={steps}, loop_iters={iters}, {rays_per_sec:,.0f} rays/s, "
        f"{steps/t2:,.0f} intersections/s",
        file=sys.stderr,
    )

    # wall-time per converged RT iteration (the BASELINE.json metric):
    # one scattering iteration on the TRUST I scaspe (kp_sca_max=1),
    # sources = every slab cell with scattered luminosity
    t_sca = sca_rate = sca_part = None
    if os.environ.get("DARTRAY_BENCH_SCATT", "1") != "0":
        # never let this section block the headline JSON line: hard-cap it
        import signal

        def _sca_timeout(signum, frame):
            raise TimeoutError

        signal.signal(signal.SIGALRM, _sca_timeout)
        cap = int(os.environ.get("DARTRAY_BENCH_SCATT_CAP", "420"))
        signal.alarm(cap + 300)  # generous bound incl. the scaspe-direct pass
        from dartray_tpu.rt import scattering as SC

        try:
            scfg = SC.ScaspeConfig.make(cfg.kp_sca_max, dustm.gsca[sl], None)
            rs = E.run_field_stage(
                grid, phys, src, mode=M.MODE_DIRECT, u_fest=pre.u,
                en_lim=en_lim, bm_par=cfg.bm_par, bm_par_max=cfg.bm_par_max,
                chunk=32, scaspe_cfg=scfg,
                scaspe_init=scfg.zeros(grid.n_cells, jnp.float32),
            )
            jax.block_until_ready(rs.u)
            signal.alarm(cap)  # re-arm: the cap budgets the iterations only

            def one_iter(scaspe):
                t = time.time()
                sres = SC.run_scattering(
                    grid, phys, scfg, scaspe, rs.u,
                    conv_en_lim=cfg.conv_en_lim, en_lim=en_lim,
                    bm_par_sca=cfg.bm_par_sca, bm_par_max=cfg.bm_par_max,
                    max_iterations=1, chunk=32,
                )
                jax.block_until_ready(sres.u_final)
                return time.time() - t, sres

            # (1) ALWAYS-measurable slice: 1/16 of the source cells (zero
            # out the rest of the scattering source function).  One TRUST
            # scattering iteration launches 153,600 cell sources (~100M+
            # rays with the split cascade — comparable to the reference's
            # hours-scale full runs), so the full iteration only fits
            # generous caps; the slice pins rays/s honestly every run.
            every = int(os.environ.get("DARTRAY_BENCH_SCATT_EVERY", "64"))
            keep = (jnp.arange(grid.n_cells) % every == 0).astype(jnp.float32)
            sub = tuple(s * keep[:, None, None] for s in rs.scaspe)
            t_part, sp = one_iter(sub)
            part_rays = sp.stats.get("scatt_rays", 0)
            sca_rate = part_rays / max(t_part, 1e-9)
            sca_part = t_part
            print(f"# scattering (1/{every} sources): {t_part:.2f}s, "
                  f"rays={part_rays}, {sca_rate:,.0f} rays/s",
                  file=sys.stderr)
            if os.environ.get("DARTRAY_BENCH_RECORD", "0") != "0":
                # persist this slice as the round's full-iteration anchor
                with open(os.path.join(ROOT, "RUNS", "scatt_record.json"),
                          "w") as f:
                    json.dump({
                        "every": every, "wall_s": round(t_part, 1),
                        "rays": int(part_rays),
                        "rays_per_sec": round(sca_rate, 1),
                        "full_iteration_est_s": round(t_part * every, 1),
                        "device": str(dev),
                    }, f)

            # (2) the full iteration, if the slice extrapolation says it
            # can fit the cap (the full TRUST iteration is ~1e9 rays:
            # the 1/16-source slice measured 65.0M rays in 1058 s —
            # ~6,770 rays per source cell from the split cascade)
            full_est = t_part * every
            if full_est <= 1.2 * cap:
                t_sca, sres = one_iter(rs.scaspe)
                sca_rays = sres.stats.get("scatt_rays", 0)
                sca_steps = sres.stats.get("scatt_steps", 0)
                sca_rate = sca_rays / max(t_sca, 1e-9)
                print(f"# scattering: 1 FULL iteration in {t_sca:.2f}s "
                      f"(rays={sca_rays}, steps={sca_steps}, "
                      f"{sca_rate:,.0f} rays/s)", file=sys.stderr)
            else:
                print(f"# full scattering iteration estimated ~{full_est:,.0f}s"
                      f" (> cap {cap}s); slice rate above is the recorded "
                      "throughput", file=sys.stderr)
        except TimeoutError:
            print("# full scattering iteration exceeded "
                  "DARTRAY_BENCH_SCATT_CAP (partial-slice rate above is "
                  "the recorded throughput)", file=sys.stderr)
        finally:
            signal.alarm(0)

    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f).get("rays_per_sec")
    vs = rays_per_sec / baseline if baseline else 1.0
    if baseline is None:
        os.makedirs(os.path.dirname(BASELINE_FILE), exist_ok=True)
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {"rays_per_sec": rays_per_sec, "device": str(dev),
                 "steps_per_sec": steps / t2, "wall_direct_s": t2}, f)

    out = {
        "metric": "trustI_direct_rays_per_sec_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 3),
        "value_runs": [round(rays / t, 1) for t in runs],
        "intersections_per_sec": round(steps / t2, 1),
    }
    if t_sca is not None:
        out["scatt_iteration_wall_s"] = round(t_sca, 3)
    if sca_rate is not None:
        out["scatt_rays_per_sec"] = round(sca_rate, 1)
    if sca_part is not None:
        out["scatt_partial_iteration_wall_s"] = round(sca_part, 3)
        out["scatt_slice_every"] = every
    # the largest slice measured end-to-end this round (run offline with
    # DARTRAY_BENCH_SCATT_EVERY=<n>; scripts record it here) anchors the
    # full-iteration estimate when the full ~1e9-ray iteration exceeds
    # the bench cap
    rec_path = os.path.join(ROOT, "RUNS", "scatt_record.json")
    if t_sca is None and os.path.exists(rec_path):
        try:
            with open(rec_path) as f:
                rec = json.load(f)
            # cross-session numbers only make sense from the SAME device
            # class (the protocol this bench enforces everywhere else)
            if rec.get("device") == str(dev):
                out["scatt_iteration_est_s"] = rec.get("full_iteration_est_s")
                out["scatt_largest_slice_every"] = rec.get("every")
                out["scatt_largest_slice_wall_s"] = rec.get("wall_s")
                out["scatt_largest_slice_rays"] = rec.get("rays")
        except Exception:
            pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
