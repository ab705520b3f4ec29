"""Command-line drivers.

Rebuild of the reference executables (L9, SURVEY.md §2.3):
  dartray_<model> <input.in>           -> python -m dartray_tpu.cli run <model> <input.in>
  create_adap_grid_<model> <input.in>  -> python -m dartray_tpu.cli create-grid <model> <input.in>

The input files are the reference's Fortran namelist files (dartray_input_*
plus per-model groups); paths inside are resolved relative to the current
working directory exactly like the reference.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np


def _load_inputs(path):
    from .config import load_config, parse_namelist_file

    cfg = load_config(path)
    raw = parse_namelist_file(path)
    return cfg, raw


def _read_observers(cfg, raw):
    dir_out = None
    pos_obs = None
    if cfg.use_dir_out and cfg.file_dir_out:
        dir_out = np.atleast_2d(
            np.loadtxt(os.path.join(cfg.dir_grid, cfg.file_dir_out), skiprows=1)
        )
    if cfg.use_pos_obs and cfg.file_pos_obs:
        pos_obs = np.atleast_2d(
            np.loadtxt(os.path.join(cfg.dir_grid, cfg.file_pos_obs), skiprows=1)
        )
    return dir_out, pos_obs


def _opacity_dir():
    """Resolve the DUST_OPACITY directory (the reference reads it relative
    to the working directory, load_opacity_param sed_routines.f90:1117)."""
    for cand in ("./data/DUST_OPACITY", "./DUST_OPACITY"):
        if os.path.isdir(cand):
            return cand
    return None


def _prepare_common(cfg, raw):
    from .wavelength import make_wavelength_grid, read_lambda_list
    from . import dust as D

    lam = read_lambda_list(os.path.join(cfg.dir_grid, cfg.file_lambda_list))
    wl = make_wavelength_grid(lam, cfg.max_lambda_stars, cfg.min_lambda_dust)
    dustm = D.prepare_dust_model(cfg, wl.lambda_um, _opacity_dir())
    return wl, dustm


def _model_sources(model, cfg, raw, grid, wl):
    """Per-model source setup (the set_<model> routines)."""
    p_src_pos = p_src_lum = None
    dens_stars = None
    if cfg.use_p_src and cfg.file_p_src:
        p_src_pos = np.atleast_2d(
            np.loadtxt(os.path.join(cfg.dir_grid, cfg.file_p_src), skiprows=1)
        )
    sl = wl.stellar_slice
    if model == "trustI":
        from .models import trustI

        if p_src_pos is not None:
            tl, tf = trustI.read_planck_table(
                os.path.join(cfg.dir_grid, "BB_T10000_L100000.dat")
            )
            lum = trustI.source_luminosity(wl.lambda_um[sl], tl, tf)
            p_src_lum = np.tile(lum[None, :], (len(p_src_pos), 1))
    elif model == "magtar":
        from .models import magtar

        if p_src_pos is not None:
            teff, lbol = magtar.read_param_src(
                os.path.join(cfg.dir_grid, cfg.file_param_src)
            )
            p_src_lum = magtar.source_luminosity(wl.lambda_um[sl], teff, lbol)
    else:
        raise SystemExit(f"unknown model {model!r} (available: trustI, magtar)")
    ds = np.asarray(grid.dens_stars_ref)
    if ds.sum() > 0:
        # cell emissivities from the grid file, scaled like the reference's
        # lambda grids would be; flat across lambda unless lambda grids are
        # used (not yet supported in the CLI)
        dens_stars = np.tile(ds[:, None], (1, wl.lnum_stars))
    return dens_stars, p_src_pos, p_src_lum


def cmd_run(model: str, input_file: str):
    from . import pipeline as P
    from .grid.io import read_grid
    from . import io_output as OUT

    cfg, raw = _load_inputs(input_file)
    wl, dustm = _prepare_common(cfg, raw)
    grid = read_grid(os.path.join(cfg.dir_grid, cfg.grid_file))
    dir_out, pos_obs = _read_observers(cfg, raw)
    dens_stars, p_src_pos, p_src_lum = _model_sources(model, cfg, raw, grid, wl)

    os.makedirs(cfg.dir_runs, exist_ok=True)
    files = OUT.OutputFiles(
        cfg.dir_runs, cfg.label_model_out, wl.lambda_um[wl.stellar_slice]
    )

    t0 = time.time()
    algo = cfg.rt_algorithm
    if algo == "projection":
        return cmd_projection(cfg, grid, wl, dustm, dens_stars, p_src_pos, p_src_lum,
                              dir_out, pos_obs, files)

    two_d = algo in ("2D", "dust_2D")
    print(f"# running {algo} RT: {grid.n_cells} cells, "
          f"L_stars={wl.lnum_stars}, L_dust={wl.lnum_dust}")
    res = P.run_main(
        grid, cfg, wl, dustm,
        dens_stars_arr=dens_stars, p_src_pos=p_src_pos, p_src_lum=p_src_lum,
        dir_out=dir_out, pos_obs=pos_obs, two_d=two_d,
    )
    print(f"# stellar RT done in {time.time()-t0:.1f}s, "
          f"{res.iterations} scattering iterations, converged={res.converged}")

    # outputs (make_output equivalents)
    if cfg.print_output_part2 or True:
        OUT.write_field_per_lambda(files, "ufield", res.u_final)
    if res.i_obs is not None:
        OUT.write_field_per_lambda(files, "i_obs", res.i_obs, ind=cfg.ind_i_obs)
    if res.i_obs_in is not None:
        OUT.write_field_per_lambda(files, "i_obs_in", res.i_obs_in, ind=cfg.ind_i_obs)
    if res.sed_tot is not None:
        OUT.write_sed(files, res.sed_tot)
        if res.direct.sed_direct is not None:
            OUT.write_sed(files, res.direct.sed_direct, part2=True)
    if res.maps_tot is not None:
        lam_idx = cfg.ind_out_maps or list(range(wl.lnum_stars))
        OUT.write_maps(files, res.maps_tot, wl.lambda_um[lam_idx])

    # dust emission RT
    if not cfg.no_dust_rt and not wl.no_dust_rt and cfg.dust_heating_type in (
            "eff", "equ", "sto", "sto_lib"):
        t1 = time.time()
        cal = None
        if cfg.dust_heating_type in ("sto", "sto_lib"):
            from . import dust as D
            odir = _opacity_dir()
            if odir is None or dustm.qabs_fa is None:
                raise SystemExit(
                    f"'{cfg.dust_heating_type}' heating requires a "
                    "grain-level dust model (input_av_opacities is "
                    "effective-only) and a DUST_OPACITY directory with "
                    "calorimetry tables (./data/DUST_OPACITY or "
                    "./DUST_OPACITY)")
            cal = D.load_calorimetry(odir, n_comp=dustm.qabs_fa.shape[0])
            cal = D.add_planck_avg_qabs(
                cal, dustm, wl.lambda_si, wl.delta_lambda_bin)
        dres = P.run_dust_rt(grid, cfg, wl, dustm, res.u_final,
                             dir_out=dir_out, pos_obs=pos_obs, cal=cal,
                             two_d=two_d)
        print(f"# dust RT done in {time.time()-t1:.1f}s, "
              f"{dres.iterations} heating iterations, converged={dres.converged}")
        dfiles = OUT.OutputFiles(
            cfg.dir_runs, cfg.label_model_out, wl.lambda_um[wl.dust_slice],
            chext=f"_dust_{cfg.dust_heating_type}",
        )
        OUT.write_field_per_lambda(dfiles, "ufield", dres.u_dust)
        if dres.sed_dust is not None:
            OUT.write_sed(dfiles, dres.sed_dust)
        if dres.maps_dust is not None:
            lam_idx = [i for i in (cfg.ind_out_maps or range(wl.lnum_tot))
                       if wl.i_lambda_dust[0] <= i <= wl.i_lambda_dust[1]]
            OUT.write_maps(dfiles, dres.maps_dust, wl.lambda_um[lam_idx])

    print(f"# all done in {time.time()-t0:.1f}s; outputs in {cfg.dir_runs}")
    return 0


def cmd_projection(cfg, grid, wl, dustm, dens_stars, p_src_pos, p_src_lum,
                   dir_out, pos_obs, files):
    """'projection' rt_algorithm: dust-free maps of the intrinsic stellar
    emission or of the optical depth (assign_i_obs_to_project,
    rt_routines.f90:5318-5367)."""
    from . import io_output as OUT
    from .vis import maps as MAPS
    from .rt import engine as E

    n_ps = len(p_src_pos) if p_src_pos is not None else 0
    nsid = grid.n_cells + n_ps
    L = wl.lnum_stars
    csize = np.asarray(grid.csize)
    i_obs = np.zeros((nsid, L))
    if cfg.param_to_project == "stellar_emission":
        if dens_stars is not None:
            i_obs[: grid.n_cells] = dens_stars * csize[:, None] / (4 * np.pi)
        if n_ps:
            psrc = E.point_source_set(grid, p_src_pos, p_src_lum)
            i_obs[grid.n_cells :] = p_src_lum / (csize[psrc.cell] ** 2)[:, None] / (4 * np.pi)
        chext = "_stars_em"
    elif cfg.param_to_project == "optical_depth":
        dens_arr = np.asarray(grid.dens_ref)[:, None] * (
            dustm.kext[wl.stellar_slice] / dustm.kext_ref
        )[None, :]
        i_obs[: grid.n_cells] = dens_arr * csize[:, None]
        chext = "_opt_depth"
    else:
        raise SystemExit(f"unknown param_to_project {cfg.param_to_project!r}")

    maps_out = []
    psrc = E.point_source_set(grid, p_src_pos, p_src_lum) if n_ps else None
    for th, ph in np.asarray(dir_out) if dir_out is not None else []:
        m = MAPS.make_map(
            grid, i_obs[:, None, :][:, 0, :], th, ph, cfg.npixel_maps,
            cfg.map_size_factor,
            src_pos=p_src_pos if n_ps else None,
            src_host=psrc.cell if n_ps else None,
        )
        maps_out.append(m)
    files = OUT.OutputFiles(cfg.dir_runs, cfg.label_model_out,
                            wl.lambda_um[wl.stellar_slice], chext=chext)
    if maps_out:
        OUT.write_maps(files, np.stack(maps_out), wl.lambda_um[wl.stellar_slice])
    print(f"# projection maps written to {cfg.dir_runs}")
    return 0


def cmd_create_grid(model: str, input_file: str):
    from .config import parse_namelist_file
    from .grid.io import write_grid

    raw = parse_namelist_file(input_file)
    base = tuple(int(b) for b in raw.get("base", [10, 2]))
    common = dict(
        base=base,
        max_lvl=int(raw.get("max_lvl", 4)),
        min_lvl=int(raw.get("min_lvl", 1)),
        modelsize=float(raw.get("modelsize", 10.0)),
        max_ncell=int(float(raw.get("max_ncell", 4e6))),
    )
    t0 = time.time()
    if model == "trustI":
        from .models import trustI

        grid = trustI.build_trustI_grid(
            tau_z=float(raw.get("tau_z", 0.01)),
            max_dtau=float(raw.get("max_dtau", 1e-4)),
            min_lvl_in=int(raw.get("min_lvl_in", 10)),
            **common,
        )
    elif model == "magtar":
        from .models import magtar

        grid = magtar.build_magtar_grid(
            dust_geometry=raw.get("dust_geometry", "shell"),
            tau_z=float(raw.get("tau_z", 0.48)),
            ax=float(raw.get("ax", 1.0)),
            by=float(raw.get("by", 1.0)),
            cz=float(raw.get("cz", 1.0)),
            elrad_width=float(raw.get("elrad_width", 0.1)),
            max_dtau=float(raw.get("max_dtau", 1e-2)),
            R_subd_lim=float(raw.get("R_subd_lim", 1e30)),
            **common,
        )
    else:
        raise SystemExit(f"unknown model {model!r}")
    out = os.path.join(raw.get("dir_grid", "."), raw.get("grid_file", "grid.h5"))
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    write_grid(out, grid)
    leaves = int(np.sum(np.asarray(grid.leaf_mask())))
    print(f"# grid created: {grid.n_cells} cells ({leaves} leaves) "
          f"in {time.time()-t0:.1f}s -> {out}")
    return 0


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__)
        return 2
    cmd = argv[0]
    if cmd == "run":
        return cmd_run(argv[1], argv[2])
    if cmd == "create-grid":
        return cmd_create_grid(argv[1], argv[2])
    # default: treat as `run <model> <input>`
    return cmd_run(argv[0], argv[1])


if __name__ == "__main__":
    raise SystemExit(main())
