"""High-level RT pipeline: the dartray_main state machine.

Ties together grid, dust model, wavelength grid, the march engine stages,
and the output products (fields, observer intensities, SEDs, maps) —
the rebuild of dartray_hub.f90:12-67 (dartray_main) and its rt_prepare
stage transitions.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .constants import CSPEED, PARSEC
from .grid.octree import Grid
from .rt import engine as E
from .rt import march as M
from .config import RTConfig
from .wavelength import WavelengthGrid
from .dust import DustModel
from . import sed as SED
from .vis import maps as MAPS


@dataclasses.dataclass
class DirectLightResult:
    u_fest: np.ndarray  # (ncell, L)
    u_final: np.ndarray  # (ncell, L)
    i_obs: Optional[np.ndarray]  # (nsid, ndir, L)
    i_obs_in: Optional[np.ndarray]
    sed_direct: Optional[np.ndarray]  # (ndir, L) [Jy]
    maps_direct: Optional[np.ndarray]  # (ndir, npix, npix, Lmaps) [MJy/sr]
    lum_lost: np.ndarray  # (L,)
    scaspe: Optional[object]  # scattering source function (if requested)
    stats: dict



def _lambda_slice(wl, lambda_range: str):
    """Validated range selection ('stars' | 'dust'); a typo must not fall
    through silently to the dust grid."""
    if lambda_range == "stars":
        return wl.stellar_slice, wl.lnum_stars
    if lambda_range == "dust":
        return wl.dust_slice, wl.lnum_dust
    raise ValueError(f"lambda_range must be 'stars' or 'dust', got {lambda_range!r}")

def make_physics(grid: Grid, dust: DustModel, lambda_slice,
                 dens_lambda=None) -> E.Physics:
    kext = dust.kext[lambda_slice]
    return E.Physics(
        dens_ref=jnp.asarray(grid.dens_ref),
        kext_norm=jnp.asarray(kext / dust.kext_ref),
        albedo=jnp.asarray(dust.albedo[lambda_slice]),
        gsca=jnp.asarray(dust.gsca[lambda_slice]),
        cs=CSPEED / PARSEC,  # [pc/s] (set_units rt_routines.f90:5190-5196)
        lambda_um=dust.lambda_um[lambda_slice],
        dens_lambda=(jnp.asarray(dens_lambda)
                     if dens_lambda is not None else None),
    )


def run_direct_light(
    grid: Grid,
    cfg: RTConfig,
    wl: WavelengthGrid,
    dust: DustModel,
    dens_stars_arr=None,  # (ncell, L_stars) cell emissivity
    p_src_pos=None,  # (nps, 3)
    p_src_lum=None,  # (nps, L_stars)
    dir_out=None,  # (ndir, 2)
    pos_obs=None,  # (nobs, 3)
    make_maps: bool = None,
    chunk: int = 32,
    collect_scaspe: bool = False,
    scaspe_cfg=None,
    lambda_range: str = "stars",
    bm_par: float = None,
    u_init=None,
    two_d: bool = False,
    sym=None,  # rt.symmetry.SymmetryMaps (built here when two_d and absent)
    dens_lambda=None,  # (ncell, L) per-lambda extinction (lambda grids)
    files=None,  # io_output.OutputFiles: write part1/part2 checkpoints
    u_fest_restore=None,  # (ncell, L): restored precalc field (skip precalc)
    mesh=None,  # jax.sharding.Mesh: shard the field stages over 'rays'
) -> DirectLightResult:
    """Direct light on the stellar or dust wavelength range:
    precalc -> direct -> i_obs -> SED/maps.

    With two_d=True, cell sources are processed with the 2D octant-symmetry
    algorithm (rt_loop_2D + fix_symmetry, rt_routines.f90:1061-1140):
    strictly-positive-octant sources march, the fields are symmetrized,
    then on-axis sources march normally; the point source (at the origin,
    check_2d_src) always marches normally.
    """
    sl, L = _lambda_slice(wl, lambda_range)
    if bm_par is None:
        bm_par = cfg.bm_par
    phys = make_physics(grid, dust, sl, dens_lambda)
    stats: dict = {}

    if two_d:
        from .rt import symmetry as SYM

        SYM.check_2d_src(p_src_pos)
        if sym is None:
            sym = SYM.build_symmetry(grid)

    # each entry: (SourceSet, symmetrize_after: bool)
    sources = []
    psrc = None
    if dens_stars_arr is not None and np.asarray(dens_stars_arr).sum() > 0:
        cells = E.cell_sources(grid, dens_stars_arr)
        if two_d:
            in_oct = np.isin(cells.cell, sym.src_octant)
            in_axis = np.isin(cells.cell, sym.src_axis)

            def _sub(mask):
                return E.SourceSet(
                    pos=cells.pos[mask], cell=cells.cell[mask],
                    sid=cells.sid[mask], lum=cells.lum[mask], point=False,
                )

            if in_oct.any():
                sources.append((_sub(in_oct), True))
            if in_axis.any():
                sources.append((_sub(in_axis), False))
        else:
            sources.append((cells, False))
    if p_src_pos is not None and len(p_src_pos) > 0:
        psrc = E.point_source_set(grid, p_src_pos, p_src_lum)
        sources.append((psrc, False))
    if not sources:
        raise ValueError("no radiation sources")

    n_point = psrc.n if psrc is not None else 0
    en_lim = E.set_en_lim(grid, cfg.accuracy, n_point)
    wall_lo, wall_hi = E._wall_bounds(cfg, grid.modelsize)

    fdtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    # ---- precalc: lower bound U_LL (rtt_precalc_*) ----
    if u_fest_restore is not None:
        # stage restore (file_restore_part1, rt_prepare dartray_hub.f90:403)
        u_fest = jnp.asarray(u_fest_restore, dtype=fdtype)
        sources_pre = []
    else:
        u_fest = jnp.zeros((grid.n_cells, L), dtype=fdtype)
        sources_pre = sources
    for s, symmetrize in sources_pre:
        u_base = u_fest if symmetrize else None
        r = E.run_field_stage(
            grid, phys, s, mode=M.MODE_PRECALC, u_init=u_fest,
            rad_lim=cfg.rad_lim, bm_par=bm_par, bm_par_max=cfg.bm_par_max,
            chunk=chunk, mesh=mesh,
        )
        u_fest = r.u
        if symmetrize:
            from .rt import symmetry as SYM

            u_fest = jnp.asarray(
                SYM.fix_symmetry_u(u_fest, sym, base=np.asarray(u_base)),
                dtype=fdtype,
            )
        for k, v in r.stats.items():
            stats["precalc_" + k] = stats.get("precalc_" + k, 0) + v

    if files is not None and u_fest_restore is None:
        # part-1 checkpoint (rtt_output_part1, make_output io:1743)
        from . import io_output as OUT

        OUT.write_field_per_lambda(files, "u_fest_part1", np.asarray(u_fest))

    # ---- direct light (rtt_dir_*) ----
    scaspe = None
    perms = None
    if collect_scaspe:
        from .rt import scattering as SC

        scaspe_cfg = scaspe_cfg or SC.ScaspeConfig.from_run_config(
            cfg, dust, wl, None if two_d else dir_out, lambda_range
        )
        scaspe = scaspe_cfg.zeros(grid.n_cells, fdtype)
        if two_d:
            from .rt import symmetry as SYM

            perms = SYM.scaspe_perms(scaspe_cfg)

    u_final = (
        jnp.zeros((grid.n_cells, L), dtype=fdtype)
        if u_init is None
        else jnp.asarray(u_init, dtype=fdtype)
    )
    lum_lost = np.zeros(L)
    for s, symmetrize in sources:
        u_base = u_final if symmetrize else None
        scaspe_base = scaspe if (symmetrize and collect_scaspe) else None
        r = E.run_field_stage(
            grid, phys, s, mode=M.MODE_DIRECT, u_fest=u_fest, u_init=u_final,
            en_lim=en_lim, bm_par=bm_par, bm_par_max=cfg.bm_par_max,
            wall_lo=wall_lo, wall_hi=wall_hi, chunk=chunk,
            scaspe_cfg=scaspe_cfg if collect_scaspe else None,
            scaspe_init=scaspe, mesh=mesh,
        )
        u_final = r.u
        if collect_scaspe:
            scaspe = r.scaspe
        if symmetrize:
            from .rt import scattering as SC
            from .rt import symmetry as SYM

            u_final = jnp.asarray(
                SYM.fix_symmetry_u(u_final, sym, base=np.asarray(u_base)),
                dtype=fdtype,
            )
            if collect_scaspe:
                delta = tuple(
                    np.asarray(a) - np.asarray(b)
                    for a, b in zip(scaspe, scaspe_base)
                )
                fixed = SYM.fix_symmetry_scaspe(delta, scaspe_cfg, perms, sym)
                scaspe = tuple(
                    jnp.asarray(np.asarray(b) + f, dtype=fdtype)
                    for b, f in zip(scaspe_base, fixed)
                )
            # pass-A losses stand in for the 7 mirrored source octants too
            # (fix_symmetry lum_lost scaling, rt_routines.f90:3626)
            lum_lost += 8.0 * r.lum_lost
        else:
            lum_lost += r.lum_lost
        for k, v in r.stats.items():
            stats["direct_" + k] = stats.get("direct_" + k, 0) + v

    # ---- observer intensities (rtt_i_obs_dir_*) ----
    n_sid = grid.n_cells + n_point
    i_obs = i_obs_in = None
    if (dir_out is not None and len(dir_out) > 0) or (
        pos_obs is not None and len(pos_obs) > 0
    ):
        i_obs = (
            np.zeros((n_sid, len(dir_out), L)) if dir_out is not None else None
        )
        i_obs_in = (
            np.zeros((n_sid, len(pos_obs), L)) if pos_obs is not None else None
        )
        for s, _sym in sources:
            i_obs, i_obs_in = E.run_iobs_stage(
                grid, phys, s, dir_out=dir_out, pos_obs=pos_obs,
                i_obs=i_obs, i_obs_in=i_obs_in, n_sid=n_sid,
            )

    # ---- SED and maps ----
    if lambda_range == "dust":
        units = "W/m/pc^2/sr"  # set_units (rt_routines.f90:5198-5201)
    else:
        units = (
            "erg/s/Hz/pc^2/sr" if cfg.units_luminosity == "erg/s/Hz" else "W/Hz/pc^2/sr"
        )
    sed_direct = None
    maps_direct = None
    if i_obs is not None and cfg.print_sed:
        sed_direct = SED.calc_sed(
            grid, i_obs, cfg.dist_obs, units,
            src_host=psrc.cell if psrc is not None else None,
            lambda_si=wl.lambda_si[sl],
        )
    if make_maps is None:
        make_maps = cfg.print_maps
    if i_obs is not None and make_maps:
        i_rng = wl.i_lambda_stars if lambda_range == "stars" else wl.i_lambda_dust
        lam_idx = (
            [i - i_rng[0] for i in cfg.ind_out_maps if i_rng[0] <= i <= i_rng[1]]
            if cfg.ind_out_maps
            else list(range(L))
        )
        mlist = []
        for j, (th, ph) in enumerate(np.asarray(dir_out)):
            m = MAPS.make_map(
                grid, i_obs[:, j, :],
                th, ph, cfg.npixel_maps, cfg.map_size_factor,
                src_pos=psrc.pos if psrc is not None else None,
                src_host=psrc.cell if psrc is not None else None,
            )
            mlist.append(
                MAPS.convert_map_to_MJy_sr(
                    m[..., lam_idx], units,
                    lambda_si=wl.lambda_si[sl][lam_idx],
                )
            )
        maps_direct = np.stack(mlist)

    result = DirectLightResult(
        u_fest=np.asarray(u_fest),
        u_final=np.asarray(u_final),
        i_obs=i_obs,
        i_obs_in=i_obs_in,
        sed_direct=sed_direct,
        maps_direct=maps_direct,
        lum_lost=lum_lost,
        scaspe=scaspe,
        stats=stats,
    )
    if files is not None and collect_scaspe:
        # part-2 checkpoint: direct light complete (rtt_output_part2)
        from . import io_output as OUT

        OUT.write_field_per_lambda(files, "ufield_part2", result.u_final)
        OUT.write_scaspe(files, scaspe_cfg, scaspe, kind="scaspe_part2")
        if i_obs is not None:
            OUT.write_field_per_lambda(files, "i_obs_part2", i_obs)
        if i_obs_in is not None:
            OUT.write_field_per_lambda(files, "i_obs_in_part2", i_obs_in)
    return result


@dataclasses.dataclass
class MainRTResult:
    direct: DirectLightResult
    u_final: np.ndarray  # (ncell, L) total field (direct + scattered)
    i_obs: Optional[np.ndarray]  # (nsid, ndir, L) total observer intensity
    i_obs_in: Optional[np.ndarray]
    sed_tot: Optional[np.ndarray]  # (ndir, L) [Jy]
    maps_tot: Optional[np.ndarray]  # (ndir, npix, npix, Lmaps) [MJy/sr]
    scaspe_tot: Optional[np.ndarray]
    iterations: int
    converged: bool
    lum_lost: np.ndarray


def run_main(
    grid: Grid,
    cfg: RTConfig,
    wl: WavelengthGrid,
    dust: DustModel,
    dens_stars_arr=None,
    p_src_pos=None,
    p_src_lum=None,
    dir_out=None,
    pos_obs=None,
    chunk: int = 32,
    lambda_range: str = "stars",
    bm_par: float = None,
    u_init=None,
    two_d: bool = False,
    dens_lambda=None,  # (ncell, L) per-lambda extinction (lambda grids)
    files=None,  # io_output.OutputFiles: checkpoints + restart
    mesh=None,  # jax.sharding.Mesh: shard the field stages over 'rays'
) -> MainRTResult:
    """The full RT on one wavelength range: direct light + scattering
    iterations + total observer products (the 'main' rt_algorithm of
    dartray_main, dartray_hub.f90:12-67; two_d=True follows
    dartray_main_2D, dartray_hub.f90:70-120)."""
    from .rt import scattering as SC

    sl, L = _lambda_slice(wl, lambda_range)
    if bm_par is None:
        bm_par = cfg.bm_par
    phys = make_physics(grid, dust, sl, dens_lambda)
    sym = None
    if two_d:
        from .rt import symmetry as SYM

        SYM.check_2d_src(p_src_pos)
        sym = SYM.build_symmetry(grid)
    # 2D mode stores no appended observer directions in scaspe
    # (dartray_main_2D disables the per-stage iobs loops; observer values
    # come from the HEALPix pixels, dartray_hub.f90:88-110)
    scfg = SC.ScaspeConfig.make(
        cfg.kp_sca_max, np.asarray(dust.gsca)[sl], None if two_d else dir_out
    )

    # stage-level restart (check_files io_routines.f90:893; restore paths
    # rt_prepare dartray_hub.f90:403-417 + read_output io:1900-1997)
    restore = ""
    if files is not None and cfg.restore_file_mpi:
        from . import io_output as OUT

        restore = OUT.check_files(files)
        if restore == "part2" and cfg.only_direct_rt:
            restore = ""  # nothing to resume into
        # P8: the restore decision steers which stages run (and therefore
        # which collectives fire) — divergent filesystem views across
        # processes must fail loudly, not deadlock
        import jax as _jax

        if _jax.process_count() > 1:
            from .parallel import distributed as DIST

            DIST.agree("check_files restore", restore)

    n_point_r = len(p_src_pos) if p_src_pos is not None else 0
    if restore == "part2":
        from . import io_output as OUT

        n_sid_r = grid.n_cells + n_point_r
        sl_r, L_r = _lambda_slice(wl, lambda_range)
        u_final_r = OUT.read_field_per_lambda(
            files, "ufield_part2", (grid.n_cells,))
        scaspe_r = OUT.read_scaspe(files, scfg, grid.n_cells)
        i_obs_r = i_obs_in_r = None
        if dir_out is not None and len(dir_out) > 0:
            i_obs_r = OUT.read_field_per_lambda(
                files, "i_obs_part2", (n_sid_r, len(dir_out)))
        if pos_obs is not None and len(pos_obs) > 0:
            i_obs_in_r = OUT.read_field_per_lambda(
                files, "i_obs_in_part2", (n_sid_r, len(pos_obs)))
        print("# restart: part-2 outputs found, skipping precalc + direct")
        direct = DirectLightResult(
            u_fest=u_final_r, u_final=u_final_r, i_obs=i_obs_r,
            i_obs_in=i_obs_in_r, sed_direct=None, maps_direct=None,
            lum_lost=np.zeros(L_r), scaspe=tuple(
                jnp.asarray(x) for x in scaspe_r), stats={},
        )
    else:
        u_fest_restore = None
        if restore == "part1":
            from . import io_output as OUT

            u_fest_restore = OUT.read_field_per_lambda(
                files, "u_fest_part1", (grid.n_cells,))
            print("# restart: part-1 output found, skipping precalc")
        direct = run_direct_light(
            grid, cfg, wl, dust,
            dens_stars_arr=dens_stars_arr, p_src_pos=p_src_pos, p_src_lum=p_src_lum,
            dir_out=dir_out, pos_obs=pos_obs, make_maps=False,
            chunk=chunk, collect_scaspe=not cfg.only_direct_rt, scaspe_cfg=scfg,
            lambda_range=lambda_range, bm_par=bm_par, u_init=u_init,
            two_d=two_d, sym=sym, dens_lambda=dens_lambda,
            files=files if (cfg.print_output_part1 or cfg.print_output_part2
                            or cfg.restore_file_mpi) else None,
            u_fest_restore=u_fest_restore, mesh=mesh,
        )

    n_point = len(p_src_pos) if p_src_pos is not None else 0
    n_sid = grid.n_cells + n_point
    psrc_host = None
    if n_point:
        psrc_host = E.point_source_set(grid, p_src_pos, p_src_lum).cell

    if cfg.only_direct_rt:
        i_obs_tot = direct.i_obs
        i_obs_in_tot = direct.i_obs_in
        u_tot = direct.u_final
        scaspe_tot = None
        iters, conv = 0, True
        lum_lost = direct.lum_lost
    else:
        en_lim = E.set_en_lim(grid, cfg.accuracy, n_point)
        wall_lo, wall_hi = E._wall_bounds(cfg, grid.modelsize)
        sres = SC.run_scattering(
            grid, phys, scfg, direct.scaspe, direct.u_final,
            conv_en_lim=cfg.conv_en_lim,
            en_lim=en_lim,
            bm_par_sca=cfg.bm_par_sca,
            bm_par_max=cfg.bm_par_max,
            max_iterations=(
                cfg.max_sca_iterations if cfg.limit_scattering_iterations else 1000
            ),
            wall_lo=wall_lo, wall_hi=wall_hi, chunk=chunk,
            sym=sym, mesh=mesh,
        )
        u_tot = np.asarray(sres.u_final)
        scaspe_tot = SC.ScaspeConfig.asarray(sres.scaspe_tot)
        iters, conv = sres.iterations, sres.converged
        lum_lost = direct.lum_lost + sres.lum_lost

        # scattered-light observer intensities (rtt_i_obs, rt_loop_iobs with
        # scaspe_tot as the source, rt_routines.f90:1519-1548)
        i_obs_tot = direct.i_obs.copy() if direct.i_obs is not None else None
        i_obs_in_tot = direct.i_obs_in.copy() if direct.i_obs_in is not None else None
        if i_obs_tot is not None or i_obs_in_tot is not None:
            lumcell_sca = scfg.lumcell(scaspe_tot)
            leaf = np.asarray(grid.leaf_mask())
            sel = np.flatnonzero(leaf & (lumcell_sca.sum(axis=1) > 0))
            sca_sources = E.SourceSet(
                pos=np.asarray(grid.ccoord)[sel], cell=sel, sid=sel,
                lum=lumcell_sca[sel], point=False,
            )

            def dir_fn(j, cells):
                return scfg.obs_lum(scaspe_tot, cells, j)

            def ang_fn(theta, phi, cells):
                return scfg.assign_src_lum(scaspe_tot, cells, theta, phi)

            i_obs_tot, i_obs_in_tot = E.run_iobs_stage(
                grid, phys, sca_sources, dir_out=dir_out, pos_obs=pos_obs,
                i_obs=i_obs_tot, i_obs_in=i_obs_in_tot, n_sid=n_sid,
                # no appended observer columns in 2D scaspe: read the
                # HEALPix pixel containing each direction instead
                src_lum_dir_fn=None if two_d else dir_fn,
                src_lum_fn=ang_fn,
            )

    if lambda_range == "dust":
        units = "W/m/pc^2/sr"
    else:
        units = (
            "erg/s/Hz/pc^2/sr" if cfg.units_luminosity == "erg/s/Hz" else "W/Hz/pc^2/sr"
        )
    sed_tot = None
    maps_tot = None
    if i_obs_tot is not None and cfg.print_sed:
        sed_tot = SED.calc_sed(grid, i_obs_tot, cfg.dist_obs, units,
                               src_host=psrc_host, lambda_si=wl.lambda_si[sl])
    if i_obs_tot is not None and cfg.print_maps:
        i_rng = wl.i_lambda_stars if lambda_range == "stars" else wl.i_lambda_dust
        lam_idx = (
            [i - i_rng[0] for i in cfg.ind_out_maps if i_rng[0] <= i <= i_rng[1]]
            if cfg.ind_out_maps
            else list(range(L))
        )
        mlist = []
        psrc_pos = np.asarray(p_src_pos) if n_point else None
        for j, (th, ph) in enumerate(np.asarray(dir_out)):
            m = MAPS.make_map(
                grid, i_obs_tot[:, j, :], th, ph,
                cfg.npixel_maps, cfg.map_size_factor,
                src_pos=psrc_pos, src_host=psrc_host,
            )
            mlist.append(
                MAPS.convert_map_to_MJy_sr(
                    m[..., lam_idx], units,
                    lambda_si=wl.lambda_si[sl][lam_idx],
                )
            )
        maps_tot = np.stack(mlist)

    return MainRTResult(
        direct=direct,
        u_final=u_tot,
        i_obs=i_obs_tot,
        i_obs_in=i_obs_in_tot,
        sed_tot=sed_tot,
        maps_tot=maps_tot,
        scaspe_tot=scaspe_tot,
        iterations=iters,
        converged=conv,
        lum_lost=lum_lost,
    )


@dataclasses.dataclass
class DustRTResult:
    u_dust: np.ndarray  # (ncell, Ld) dust-emission radiation field
    dens_stars_dust: np.ndarray  # (ncell, Ld) total dust emissivity [W/m/pc^3]
    t_dust: Optional[np.ndarray]  # (ncell,) equilibrium temperature (eff mode)
    i_obs: Optional[np.ndarray]  # (nsid, ndir, Ld) total dust-emission intensity
    i_obs_in: Optional[np.ndarray]
    sed_dust: Optional[np.ndarray]  # (ndir, Ld) [Jy]
    maps_dust: Optional[np.ndarray]
    iterations: int
    converged: bool


def run_dust_rt(
    grid: Grid,
    cfg: RTConfig,
    wl: WavelengthGrid,
    dust: DustModel,
    u_stellar,  # (ncell, Ls) stellar radiation field from the stellar RT
    dir_out=None,
    pos_obs=None,
    chunk: int = 32,
    max_dust_iterations: int = 30,
    cal=None,  # dust.Calorimetry, required for 'sto'/'sto_lib'
    two_d: bool = False,  # 'dust_2D' algorithm: octant-symmetric dust RT
    mesh=None,  # jax.sharding.Mesh: shard the RT passes over 'rays'
) -> DustRTResult:
    """Dust emission with self-heating iterations (dartray_dust,
    dartray_hub.f90:210-253): compute the dust emissivity from the absorbed
    stellar (+dust) radiation, run the RT on the dust wavelength grid for
    the *delta* emissivity, and iterate until the emissivity converges
    (check_dens_stars_arr, sed_routines.f90:279-333).

    All four heating modes are supported: 'eff'/'equ' (equilibrium,
    dust_emission.py) and 'sto'/'sto_lib' (stochastic, sto.py; the latter
    two need grain-level tables + calorimetry — pass `cal`, built with
    dust.load_calorimetry + dust.add_planck_avg_qabs).  Uses bm_par_sca
    for the ray density (grid_initialize_dust, dartray_hub.f90:518-527).
    """
    from . import dust_emission as DE
    from . import sto as STO

    if wl.no_dust_rt:
        raise ValueError("dust RT disabled: <10 wavelengths in a range")
    Ld = wl.lnum_dust
    units_ufield = (
        "erg/Hz/pc^3" if cfg.units_luminosity == "erg/s/Hz" else "J/Hz/pc^3"
    )

    dens_ref = np.asarray(grid.dens_ref)
    leaf = np.asarray(grid.leaf_mask())
    u_dust = np.zeros((grid.n_cells, Ld))
    dens_prev = np.zeros((grid.n_cells, Ld))
    n_sid = grid.n_cells
    i_obs_tot = (
        np.zeros((n_sid, len(dir_out), Ld)) if dir_out is not None else None
    )
    i_obs_in_tot = (
        np.zeros((n_sid, len(pos_obs), Ld)) if pos_obs is not None else None
    )
    t_dust = None
    converged = False

    it = 0
    while it < max_dust_iterations:
        it += 1
        u_d = u_dust if it > 1 else None
        if cfg.dust_heating_type == "eff":
            dens_new, t_dust = DE.dens_dustem_eff(
                dust, wl, dens_ref, u_stellar, u_d, units_ufield
            )
            dens_new = np.asarray(dens_new)
        elif cfg.dust_heating_type == "equ":
            dens_new = DE.dens_dustem_equ(
                dust, wl, dens_ref, u_stellar, u_d, units_ufield
            )
        elif cfg.dust_heating_type in ("sto", "sto_lib"):
            if cal is None:
                raise ValueError("'sto'/'sto_lib' heating requires cal= "
                                 "(dust.load_calorimetry + add_planck_avg_qabs)")
            if cfg.dust_heating_type == "sto":
                dens_new = STO.dens_dustem_sto(
                    dust, cal, wl, dens_ref, u_stellar, u_d, units_ufield
                )
            else:
                dens_new = STO.dens_dustem_sto_lib(
                    dust, cal, wl, dens_ref, u_stellar, u_d,
                    n_int_rf_bins=cfg.n_int_rf_bins,
                    units_ufield=units_ufield,
                )
        else:
            raise NotImplementedError(
                f"dust_heating_type {cfg.dust_heating_type!r} not implemented"
            )

        # convergence check (check_dens_stars_arr, sed:279-333)
        emitting = leaf & (dens_new.sum(axis=1) > 0)
        rel = np.abs(dens_new[emitting] - dens_prev[emitting]) / np.maximum(
            dens_new[emitting], 1e-300
        )
        n_no_conv = int((rel > cfg.conv_en_lim).sum())
        if n_no_conv == 0 and it > 1:
            converged = True
            it -= 1  # this pass did no RT
            break

        delta = dens_new - dens_prev
        dens_prev = dens_new

        res = run_main(
            grid, cfg, wl, dust,
            dens_stars_arr=delta,
            dir_out=dir_out, pos_obs=pos_obs, chunk=chunk,
            lambda_range="dust", bm_par=cfg.bm_par_sca,
            u_init=u_dust, two_d=two_d, mesh=mesh,
        )
        u_dust = np.asarray(res.u_final)
        if i_obs_tot is not None:
            i_obs_tot += res.i_obs[:n_sid]
        if i_obs_in_tot is not None:
            i_obs_in_tot += res.i_obs_in[:n_sid]

    sed_dust = None
    maps_dust = None
    if i_obs_tot is not None and cfg.print_sed:
        sed_dust = SED.calc_sed(
            grid, i_obs_tot, cfg.dist_obs, "W/m/pc^2/sr",
            lambda_si=wl.lambda_si[wl.dust_slice],
        )
    if i_obs_tot is not None and cfg.print_maps and dir_out is not None:
        i_rng = wl.i_lambda_dust
        lam_idx = (
            [i - i_rng[0] for i in cfg.ind_out_maps if i_rng[0] <= i <= i_rng[1]]
            if cfg.ind_out_maps
            else list(range(Ld))
        )
        if lam_idx:
            mlist = []
            for j, (th, ph) in enumerate(np.asarray(dir_out)):
                m = MAPS.make_map(
                    grid, i_obs_tot[:, j, :], th, ph,
                    cfg.npixel_maps, cfg.map_size_factor,
                )
                mlist.append(
                    MAPS.convert_map_to_MJy_sr(
                        m[..., lam_idx], "W/m/pc^2/sr",
                        lambda_si=wl.lambda_si[wl.dust_slice][lam_idx],
                    )
                )
            maps_dust = np.stack(mlist)

    return DustRTResult(
        u_dust=u_dust,
        dens_stars_dust=dens_prev,
        t_dust=np.asarray(t_dust) if t_dust is not None else None,
        i_obs=i_obs_tot,
        i_obs_in=i_obs_in_tot,
        sed_dust=sed_dust,
        maps_dust=maps_dust,
        iterations=it,
        converged=converged,
    )


def run_sed_algorithm(grid, cfg, wl, files, n_point: int = 0, src_host=None,
                      lambda_range: str = "stars", dir_out=None):
    """'sed' rt_algorithm: recompute integrated SEDs and maps from i_obs
    files written by a previous run (calc_sed_arrays, sed_routines.f90:161-208
    and dartray_sed, dartray_hub.f90:171)."""
    from . import io_output as OUT

    sl, _ = _lambda_slice(wl, lambda_range)
    n_sid = grid.n_cells + n_point
    ndir = len(dir_out) if dir_out is not None else 1
    i_obs = OUT.read_field_per_lambda(files, "i_obs", (n_sid, ndir))
    if lambda_range == "dust":
        units = "W/m/pc^2/sr"
    else:
        units = (
            "erg/s/Hz/pc^2/sr" if cfg.units_luminosity == "erg/s/Hz" else "W/Hz/pc^2/sr"
        )
    sed = SED.calc_sed(grid, i_obs, cfg.dist_obs, units, src_host=src_host,
                       lambda_si=wl.lambda_si[sl])
    maps_out = None
    if cfg.print_maps and dir_out is not None:
        mlist = []
        for j, (th, ph) in enumerate(np.asarray(dir_out)):
            m = MAPS.make_map(grid, i_obs[:, j, :], th, ph,
                              cfg.npixel_maps, cfg.map_size_factor)
            mlist.append(MAPS.convert_map_to_MJy_sr(m, units,
                                                    lambda_si=wl.lambda_si[sl]))
        maps_out = np.stack(mlist)
    return sed, maps_out


def run_iobs_algorithm(grid, cfg, wl, dust, scaspe_tot, scfg, dir_out=None,
                       pos_obs=None, dens_stars_arr=None, p_src_pos=None,
                       p_src_lum=None, lambda_range: str = "stars"):
    """'i_obs' rt_algorithm: observer intensities for arbitrary new
    directions from a saved scattering source function, plus the direct
    light, without redoing the RT (rt_algorithm 'i_obs',
    rt_routines.f90:44; rt_loop_iobs with scaspe_tot).

    Note: the new directions are not part of the scaspe observer pixels, so
    the scattered launch luminosity uses the HEALPix pixel containing each
    direction (assign_src_lum), exactly as the reference does in this mode.
    """
    from .rt import scattering as SC

    sl, L = _lambda_slice(wl, lambda_range)
    phys = make_physics(grid, dust, sl)

    n_point = len(p_src_pos) if p_src_pos is not None else 0
    n_sid = grid.n_cells + n_point
    i_obs = np.zeros((n_sid, len(dir_out), L)) if dir_out is not None else None
    i_obs_in = np.zeros((n_sid, len(pos_obs), L)) if pos_obs is not None else None

    # direct light of the original sources
    sources = []
    if dens_stars_arr is not None and np.asarray(dens_stars_arr).sum() > 0:
        sources.append(E.cell_sources(grid, dens_stars_arr))
    if n_point:
        sources.append(E.point_source_set(grid, p_src_pos, p_src_lum))
    for s in sources:
        i_obs, i_obs_in = E.run_iobs_stage(
            grid, phys, s, dir_out=dir_out, pos_obs=pos_obs,
            i_obs=i_obs, i_obs_in=i_obs_in, n_sid=n_sid,
        )

    # scattered light from scaspe_tot (per-bucket tuple)
    lumcell_sca = scfg.lumcell(scaspe_tot)
    leaf = np.asarray(grid.leaf_mask())
    sel = np.flatnonzero(leaf & (lumcell_sca.sum(axis=1) > 0))
    if len(sel):
        sca_sources = E.SourceSet(
            pos=np.asarray(grid.ccoord)[sel], cell=sel, sid=sel,
            lum=lumcell_sca[sel], point=False,
        )

        def ang_fn(theta, phi, cells):
            return scfg.assign_src_lum(scaspe_tot, cells, theta, phi)

        i_obs, i_obs_in = E.run_iobs_stage(
            grid, phys, sca_sources, dir_out=dir_out, pos_obs=pos_obs,
            i_obs=i_obs, i_obs_in=i_obs_in, n_sid=n_sid, src_lum_fn=ang_fn,
        )
    return i_obs, i_obs_in
