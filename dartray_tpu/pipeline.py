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


def make_physics(grid: Grid, dust: DustModel, lambda_slice) -> E.Physics:
    kext = dust.kext[lambda_slice]
    return E.Physics(
        dens_ref=jnp.asarray(grid.dens_ref),
        kext_norm=jnp.asarray(kext / dust.kext_ref),
        albedo=jnp.asarray(dust.albedo[lambda_slice]),
        gsca=jnp.asarray(dust.gsca[lambda_slice]),
        cs=CSPEED / PARSEC,  # [pc/s] (set_units rt_routines.f90:5190-5196)
        lambda_um=dust.lambda_um[lambda_slice],
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
) -> DirectLightResult:
    """Stellar-emission direct light: precalc -> direct -> i_obs -> SED/maps."""
    sl = wl.stellar_slice
    L = wl.lnum_stars
    phys = make_physics(grid, dust, sl)
    stats: dict = {}

    sources = []
    if dens_stars_arr is not None and np.asarray(dens_stars_arr).sum() > 0:
        sources.append(E.cell_sources(grid, dens_stars_arr))
    psrc = None
    if p_src_pos is not None and len(p_src_pos) > 0:
        psrc = E.point_source_set(grid, p_src_pos, p_src_lum)
        sources.append(psrc)
    if not sources:
        raise ValueError("no radiation sources")

    n_point = psrc.n if psrc is not None else 0
    en_lim = E.set_en_lim(grid, cfg.accuracy, n_point)
    wall_lo, wall_hi = E._wall_bounds(cfg, grid.modelsize)

    fdtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    # ---- precalc: lower bound U_LL (rtt_precalc_*) ----
    u_fest = jnp.zeros((grid.n_cells, L), dtype=fdtype)
    for s in sources:
        r = E.run_field_stage(
            grid, phys, s, mode=M.MODE_PRECALC, u_init=u_fest,
            rad_lim=cfg.rad_lim, bm_par=cfg.bm_par, bm_par_max=cfg.bm_par_max,
            chunk=chunk,
        )
        u_fest = r.u
        for k, v in r.stats.items():
            stats["precalc_" + k] = stats.get("precalc_" + k, 0) + v

    # ---- direct light (rtt_dir_*) ----
    scaspe = None
    weights_fn = None
    if collect_scaspe:
        from .rt import scattering as SC

        scaspe_cfg = scaspe_cfg or SC.ScaspeConfig.from_run_config(cfg, dust, wl, dir_out)
        scaspe = jnp.zeros((grid.n_cells, scaspe_cfg.npix_tot, L), dtype=fdtype)
        weights_fn = scaspe_cfg.weights_fn(phys)

    u_final = jnp.zeros((grid.n_cells, L), dtype=fdtype)
    lum_lost = np.zeros(L)
    for s in sources:
        r = E.run_field_stage(
            grid, phys, s, mode=M.MODE_DIRECT, u_fest=u_fest, u_init=u_final,
            en_lim=en_lim, bm_par=cfg.bm_par, bm_par_max=cfg.bm_par_max,
            wall_lo=wall_lo, wall_hi=wall_hi, chunk=chunk,
            scaspe_weights_fn=weights_fn, scaspe_init=scaspe,
        )
        u_final = r.u
        if collect_scaspe:
            scaspe = r.scaspe
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
        for s in sources:
            i_obs, i_obs_in = E.run_iobs_stage(
                grid, phys, s, dir_out=dir_out, pos_obs=pos_obs,
                i_obs=i_obs, i_obs_in=i_obs_in, n_sid=n_sid,
            )

    # ---- SED and maps ----
    units = (
        "erg/s/Hz/pc^2/sr" if cfg.units_luminosity == "erg/s/Hz" else "W/Hz/pc^2/sr"
    )
    sed_direct = None
    maps_direct = None
    if i_obs is not None and cfg.print_sed:
        sed_direct = SED.calc_sed(
            grid, i_obs, cfg.dist_obs, units,
            src_host=psrc.cell if psrc is not None else None,
        )
    if make_maps is None:
        make_maps = cfg.print_maps
    if i_obs is not None and make_maps:
        lam_idx = (
            [i - wl.i_lambda_stars[0] for i in cfg.ind_out_maps
             if wl.i_lambda_stars[0] <= i <= wl.i_lambda_stars[1]]
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
            mlist.append(MAPS.convert_map_to_MJy_sr(m[..., lam_idx], units))
        maps_direct = np.stack(mlist)

    return DirectLightResult(
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
