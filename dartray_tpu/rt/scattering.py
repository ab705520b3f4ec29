"""Scattering source function ("scaspe") and scattering iterations.

Rebuild of create_scaspe / set_npix_arr / calc_ffn_arr / assign_src_lum and
the rtt_scatt iteration loop (rt_routines.f90:2784-2852, 5235-5315,
2186-2281, 3043-3071; dartray_hub.f90:45-52).

Layout decision (differs from the reference deliberately): the reference
stores scaspe per wavelength with *adaptive* angular resolution — kp(lambda)
chosen so >= 5 pixels sample the Henyey-Greenstein FWHM, capped at
kp_sca_max (set_npix_arr) — which gives ragged per-lambda arrays.  The TPU
rebuild uses one dense tensor (ncell, P, L) with P = 12*4^kp_sca_max +
tot_ndir for every wavelength: wavelengths whose reference kp would be
smaller (or isotropic) simply carry *more* angular resolution than the
reference, converging to the same scattered field.  This keeps every
deposit/lookup a dense gather/scatter.  kp-bucketed ragged storage is the
planned memory optimization for large L (SURVEY.md §7 hard part 6).

The scattering iterations run in the reference's sequential_scattering
(Jacobi) mode (rt_routines.f90:272): each iteration propagates the
luminosity scattered in the *previous* pass; this is deterministic and
order-independent, which is what a data-parallel TPU pass needs
(no_communications mode requires it in the reference too, rt:319).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import healpix as hp
from ..grid.octree import Grid
from . import march as M
from . import engine as E


@dataclasses.dataclass
class ScaspeConfig:
    kp_sca: int  # HEALPix k parameter of the scaspe sphere
    dirs: np.ndarray  # (P, 3) unit vectors: npix_hp HEALPix centers + observers
    npix_hp: int
    tot_ndir: int

    @property
    def nside(self):
        return 2**self.kp_sca

    @property
    def npix_tot(self):
        return self.npix_hp + self.tot_ndir

    @classmethod
    def make(cls, kp_sca_max: int, dir_out=None):
        nside = 2**kp_sca_max
        npix_hp = 12 * nside * nside
        th, ph = hp.pix2ang_nest(nside, np.arange(npix_hp))
        th = np.asarray(th)
        ph = np.asarray(ph)
        if dir_out is not None and len(dir_out) > 0:
            do = np.asarray(dir_out)
            th = np.concatenate([th, do[:, 0]])
            ph = np.concatenate([ph, do[:, 1]])
            ndir = len(do)
        else:
            ndir = 0
        dirs = np.stack(
            [np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph), np.cos(th)], axis=-1
        )
        return cls(kp_sca=kp_sca_max, dirs=dirs, npix_hp=npix_hp, tot_ndir=ndir)

    @classmethod
    def from_run_config(cls, cfg, dust, wl, dir_out=None):
        return cls.make(cfg.kp_sca_max, dir_out)

    # ---- per-batch quantities for the march kernel ----
    def ads(self, theta, phi):
        """cos(angle) between ray directions and every scaspe direction
        (calc_ads_arr, rt_routines.f90:2288-2297)."""
        d = np.stack(
            [
                np.sin(theta) * np.cos(phi),
                np.sin(theta) * np.sin(phi),
                np.cos(theta),
            ],
            axis=-1,
        )
        return d @ self.dirs.T  # (NR, P)

    def hg_norm(self, ads, gsca):
        """Sum of the unnormalized HG weights over the npix_hp HEALPix pixels
        (the normalization of calc_ffn_arr, rt_routines.f90:2258-2260)."""
        g = np.asarray(gsca)[None, None, :]
        a = ads[:, : self.npix_hp, None]
        w = (1.0 - g**2) / self.npix_hp * (1.0 + g**2 - 2.0 * g * a) ** (-1.5)
        return w.sum(axis=1)  # (NR, L)

    def weights_fn(self, phys):
        """Returns a function (batch_dict, nside) -> kwargs for march()."""
        gs = np.asarray(phys.gsca)

        def fn(d, nside):
            ads = self.ads(d["theta"], d["phi"])
            return ads, self.hg_norm(ads, gs)

        return fn

    def pix_of_direction(self, theta, phi):
        """HEALPix pixel of a direction on the scaspe sphere."""
        return np.asarray(hp.ang2pix_nest(self.nside, theta, phi))


def assign_src_lum(scfg: ScaspeConfig, scaspe_prev, cells, theta, phi):
    """Ray launch luminosity for scattered light: scaspe value at the ray
    direction times npix_hp (assign_src_lum, rt_routines.f90:3043-3071)."""
    pix = scfg.pix_of_direction(theta, phi)
    sp = np.asarray(scaspe_prev)
    return sp[cells, pix, :] * scfg.npix_hp


@dataclasses.dataclass
class ScatteringResult:
    u_final: jax.Array  # (ncell, L) total field incl. scattered light
    scaspe_tot: jax.Array  # (ncell, P, L) total scattering source function
    iterations: int
    converged: bool
    lum_lost: np.ndarray
    tot_rad_en: np.ndarray  # (L,) total scattered luminosity pool
    stats: dict


def run_scattering(
    grid: Grid,
    phys,
    scfg: ScaspeConfig,
    scaspe_direct,  # (ncell, P, L) from the direct-light pass
    u_final,  # (ncell, L) field after direct light
    *,
    conv_en_lim: float = 0.01,
    en_lim: float = 0.0,
    bm_par_sca: float = 5.0,
    bm_par_max: float = 200.0,
    max_iterations: int = 1000,
    wall_lo=(-np.inf,) * 3,
    wall_hi=(np.inf,) * 3,
    chunk: int = 32,
    fdtype=None,
) -> ScatteringResult:
    """Scattered-light iterations (the rtt_scatt loop, dartray_hub.f90:45-52).

    Each iteration: every cell with scattered luminosity re-emits it with
    the angular distribution stored in scaspe_prev; deposits add to u_final
    and to a fresh scaspe accumulator (the next iteration's source).
    Convergence when the remaining pool is < conv_en_lim of the total
    (calc_total_luminosity_sca, rt_routines.f90:663-775).
    """
    if fdtype is None:
        fdtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    L = np.asarray(phys.kext_norm).shape[0]
    P = scfg.npix_tot
    stats: dict = {}
    lum_lost = np.zeros(L)

    scaspe_prev = jnp.asarray(scaspe_direct, dtype=fdtype)
    scaspe_tot = scaspe_prev
    u = jnp.asarray(u_final, dtype=fdtype)

    # total scattered luminosity at iteration 1 (rt_routines.f90:675-695)
    tot_rad_en = np.asarray(
        jnp.sum(scaspe_prev[:, : scfg.npix_hp, :], axis=(0, 1))
    )

    leaf = np.asarray(grid.leaf_mask())
    converged = False
    it = 0
    while it < max_iterations:
        it += 1
        # per-cell escaping luminosity (lumcell, rt:697-708)
        lumcell = np.array(jnp.sum(scaspe_prev[:, : scfg.npix_hp, :], axis=1))
        lumcell[~leaf] = 0.0
        tot_lumcell = lumcell.sum(axis=0)
        if tot_rad_en.sum() <= 0:
            converged = True
            break
        frac = np.where(tot_rad_en > 0, tot_lumcell / np.maximum(tot_rad_en, 1e-300), 0.0)
        if np.all(frac < conv_en_lim):
            converged = True
            break

        sel = np.flatnonzero(lumcell.sum(axis=1) > 0)
        sources = E.SourceSet(
            pos=np.asarray(grid.ccoord)[sel],
            cell=sel,
            sid=sel,
            lum=lumcell[sel],  # placeholder; per-ray value from scaspe_prev
            point=False,
        )

        scaspe_prev_host = scaspe_prev  # device array; gathered per launch

        def src_lum_fn(d, nside):
            return assign_src_lum(
                scfg, scaspe_prev_host, d["src_cell"], d["theta"], d["phi"]
            )

        scaspe_new = jnp.zeros((grid.n_cells, P, L), dtype=fdtype)
        r = E.run_field_stage(
            grid, phys, sources,
            mode=M.MODE_DIRECT,
            u_fest=u,  # rt_prepare@scatt: u_fest <- u_final (hub:403-417)
            u_init=u,
            en_lim=en_lim,
            bm_par=bm_par_sca,
            bm_par_max=bm_par_max,
            wall_lo=wall_lo,
            wall_hi=wall_hi,
            chunk=chunk,
            scaspe_weights_fn=scfg.weights_fn(phys),
            scaspe_init=scaspe_new,
            scaspe_npix_hp=scfg.npix_hp,
            src_lum_fn=src_lum_fn,
        )
        u = r.u
        scaspe_new = r.scaspe
        lum_lost += r.lum_lost
        for k, v in r.stats.items():
            stats[f"scatt_{k}"] = stats.get(f"scatt_{k}", 0) + v

        scaspe_tot = scaspe_tot + scaspe_new
        scaspe_prev = scaspe_new

    return ScatteringResult(
        u_final=u,
        scaspe_tot=scaspe_tot,
        iterations=it,
        converged=converged,
        lum_lost=lum_lost,
        tot_rad_en=tot_rad_en,
        stats=stats,
    )
