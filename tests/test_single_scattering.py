"""Single-scattering analytic oracle for the TRUST I slab.

Pins the scaspe/HG/albedo chain against physics (not just energy budgets):
the first-order scattered flux toward an external observer has the closed
form

    F_1(n) * d^2 = int dV  rho*k_sca * [L e^{-tau_in} / (4 pi r^2)]
                          * Phi(s, n) / (4 pi) * e^{-tau_out}

where s is the direction source->x, tau_in/tau_out are the slab optical
depths along the in/out paths (closed form for a z-slab and vertical
observers), and Phi is the Henyey-Greenstein phase factor in the
framework's *discrete* normalization (calc_ffn_arr,
rt_routines.f90:2186-2281): Phi = w(cos a) * npix_hp / sum_p w(cos a_p)
over the npix_hp HEALPix pixel directions.  Using the discrete
normalization removes the dominant angular-discretization term, so the
comparison tolerance is set by ray/cell discretization only.

The framework side is exactly first order: direct pass -> scaspe, then the
observer-intensity stage sourced by the *direct* scaspe (the appended
observer columns, rt_loop_iobs rt_routines.f90:1519-1548).  Workload:
the TRUST I benchmark geometry (user_routines_trustI.f90:15-19) at
tau_z = 0.1.
"""
import os

import numpy as np
import pytest

from dartray_tpu.config import RTConfig
from dartray_tpu.constants import PARSEC
from dartray_tpu.wavelength import make_wavelength_grid
from dartray_tpu import dust as D
from dartray_tpu.models import trustI
from dartray_tpu import pipeline as P
from dartray_tpu.rt import engine as E
from dartray_tpu.rt import scattering as SC

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
AV_OPAC = os.path.join(DATA, "DUST_OPACITY", "TRUST", "ZDA_BARE_GR_S_Effective.dat")
BB_TABLE = os.path.join(DATA, "TRUSTI_GRIDS", "BB_T10000_L100000.dat")

TAU_Z = 0.1
LAM = [0.4, 1.0]  # g ~ 0.6 and ~0.45: two distinct HG shapes
Z_TOP, Z_BOT = trustI.Z1_SLAB, trustI.Z1_SLAB - trustI.LZ_SLAB


@pytest.fixture(scope="module")
def run():
    grid = trustI.build_trustI_grid(
        tau_z=TAU_Z, base=(10, 2), max_lvl=2, min_lvl=1, max_ncell=200_000
    )
    wl = make_wavelength_grid(np.asarray(LAM), max_lambda_stars=80.0)
    dustm = D.load_effective_dust_model(AV_OPAC, wl.lambda_um, lambda_ref=1.0)
    tl, tf = trustI.read_planck_table(BB_TABLE)
    lum = trustI.source_luminosity(wl.lambda_um, tl, tf)[None, :]
    cfg = RTConfig(
        accuracy=0.05, bm_par=15, bm_par_sca=10, bm_par_max=300, rad_lim=0.1,
        dist_obs=1e4, use_p_src=True, use_dir_out=True, print_sed=True,
        kp_sca_max=2,
    ).validate()
    dir_out = np.array([[0.0, 0.0], [np.pi, 0.0]])  # up (+z), down (-z)
    scfg = SC.ScaspeConfig.make(cfg.kp_sca_max, np.asarray(dustm.gsca), dir_out)
    direct = P.run_direct_light(
        grid, cfg, wl, dustm,
        p_src_pos=trustI.STAR_POS[None, :], p_src_lum=lum,
        dir_out=dir_out, collect_scaspe=True, scaspe_cfg=scfg,
    )
    # first-order scattered observer intensities: iobs stage sourced by the
    # DIRECT scaspe only (no scattering iterations => exactly single
    # scattering)
    sl = wl.stellar_slice
    phys = P.make_physics(grid, dustm, sl)
    scaspe_np = SC.ScaspeConfig.asarray(direct.scaspe)
    lumcell = scfg.lumcell(scaspe_np)
    leaf = np.asarray(grid.leaf_mask())
    sel = np.flatnonzero(leaf & (lumcell.sum(axis=1) > 0))
    sources = E.SourceSet(
        pos=np.asarray(grid.ccoord)[sel], cell=sel, sid=sel,
        lum=lumcell[sel], point=False,
    )
    i_obs_sca, _ = E.run_iobs_stage(
        grid, phys, sources, dir_out=dir_out,
        n_sid=grid.n_cells + 1,
        src_lum_dir_fn=lambda j, cells: scfg.obs_lum(scaspe_np, cells, j),
    )
    # flux per direction: sum_cells i_obs * (csize/d)^2 in Jy (calc_sed)
    csize = np.asarray(grid.csize)
    d_cm = cfg.dist_obs * PARSEC * 100
    f_jy = np.zeros((2, len(LAM)))
    for j in range(2):
        f_jy[j] = (
            (i_obs_sca[: grid.n_cells, j] * (csize**2)[:, None]).sum(axis=0)
            * 4 * np.pi / (4 * np.pi * d_cm**2) * 1e23
        )
    return grid, dustm, lum[0], scfg, f_jy


def _analytic_flux(dustm, lum_l, scfg, j_up: bool, d_cm):
    """Numerical quadrature of the closed-form first-order integral."""
    S = trustI.STAR_POS
    # integration grid over the slab (integrand is smooth: source is 6 pc
    # above the slab top)
    nx, nz = 60, 48
    xs = np.linspace(-5, 5, nx, endpoint=False) + 5.0 / nx
    zs = np.linspace(Z_BOT, Z_TOP, nz, endpoint=False) + (
        (Z_TOP - Z_BOT) / nz / 2
    )
    X, Y, Z = np.meshgrid(xs, xs, zs, indexing="ij")
    dV = (10.0 / nx) ** 2 * ((Z_TOP - Z_BOT) / nz)
    P3 = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1)  # (N, 3)
    r = np.linalg.norm(P3 - S, axis=1)
    s_hat = (P3 - S) / r[:, None]
    nvec = np.array([0.0, 0.0, 1.0 if j_up else -1.0])
    cosa = s_hat @ nvec

    k_ref = TAU_Z / trustI.LZ_SLAB  # extinction coeff at lambda_ref [1/pc]
    out = np.zeros(len(dustm.kext))
    for il, (kn, alb, g) in enumerate(
        zip(np.asarray(dustm.kext) / dustm.kext_ref,
            np.asarray(dustm.albedo), np.asarray(dustm.gsca))
    ):
        k = k_ref * kn
        tau_in = k * r * (Z_TOP - P3[:, 2]) / (S[2] - P3[:, 2])
        tau_out = k * ((Z_TOP - P3[:, 2]) if j_up else (P3[:, 2] - Z_BOT))
        # discrete-normalized HG phase factor (calc_ffn_arr convention)
        b = next(bb for bb in scfg.buckets
                 if il in set(bb.lam_idx.tolist()))
        if b.kp >= 0:
            dirs = b.dirs[: b.npix_hp]  # (P, 3) HEALPix pixel centers
            wpix = (1 - g**2) * (
                1 + g**2 - 2 * g * (s_hat @ dirs.T)
            ) ** -1.5  # (N, P)
            wobs = (1 - g**2) * (1 + g**2 - 2 * g * cosa) ** -1.5
            phi = wobs / wpix.sum(axis=1) * b.npix_hp
        else:
            phi = np.ones_like(cosa)
        integ = (
            k * alb * lum_l[il] * np.exp(-tau_in) / (4 * np.pi * r**2)
            * phi / (4 * np.pi) * np.exp(-tau_out)
        )
        out[il] = integ.sum() * dV
    return out * 4 * np.pi / (4 * np.pi * d_cm**2) * 1e23


@pytest.mark.parametrize("j", [0, 1], ids=["up", "down"])
def test_single_scattering_matches_analytic(run, j):
    grid, dustm, lum_l, scfg, f_jy = run
    d_cm = 1e4 * PARSEC * 100
    expect = _analytic_flux(dustm, lum_l, scfg, j_up=(j == 0), d_cm=d_cm)
    ratio = f_jy[j] / expect
    # tolerance: ray/beam + cell discretization (the HG discretization is
    # matched exactly by the discrete normalization above)
    assert np.all(np.abs(ratio - 1) < 0.08), (ratio, f_jy[j], expect)
