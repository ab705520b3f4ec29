"""Dust temperature / emission tests: Planck function, equilibrium solve,
energy balance, and the self-heating RT loop."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from dartray_tpu import dust_emission as DE
from dartray_tpu.constants import CSPEED, SIGMA_SB, PARSEC
from dartray_tpu.wavelength import make_wavelength_grid


def test_bplanck_stefan_boltzmann():
    """Integral of pi*B_lambda over wavelength = sigma T^4."""
    lam = np.logspace(-7.5, -2.5, 4000)  # 0.03um .. 3mm
    for T in (100.0, 1000.0, 5000.0):
        B = np.asarray(DE.bplanck(T, lam))
        integral = np.trapezoid(B, lam) * np.pi
        np.testing.assert_allclose(integral, SIGMA_SB * T**4, rtol=1e-3)


def test_bplanck_wien_peak():
    lam = np.logspace(-7, -3, 20000)
    T = 300.0
    B = np.asarray(DE.bplanck(T, lam))
    peak = lam[np.argmax(B)]
    np.testing.assert_allclose(peak, 2.8977719e-3 / T, rtol=1e-3)


def test_solve_t_equil_graybody():
    """Constant kabs over a wide lambda range: equilibrium T satisfies
    abs_en = 4 kabs sigma T^4."""
    lam = np.logspace(-7.2, -2.8, 600)
    dl = np.gradient(lam)
    kabs = np.full(len(lam), 1e-14)  # m^2
    for T_true in (30.0, 300.0, 2000.0):
        abs_en = 4.0 * kabs[0] * SIGMA_SB * T_true**4
        T = float(DE.solve_t_equil(jnp.asarray(kabs), jnp.asarray(lam),
                                   jnp.asarray(dl), jnp.asarray(abs_en)))
        np.testing.assert_allclose(T, T_true, rtol=2e-3)


def test_solve_t_batched():
    lam = np.logspace(-7, -3, 300)
    dl = np.gradient(lam)
    kabs = np.full(len(lam), 1e-14)
    T_true = np.array([20.0, 100.0, 700.0, 3000.0])
    abs_en = 4.0 * kabs[0] * SIGMA_SB * T_true**4
    T = np.asarray(DE.solve_t_equil(jnp.asarray(kabs), jnp.asarray(lam),
                                    jnp.asarray(dl), jnp.asarray(abs_en)))
    np.testing.assert_allclose(T, T_true, rtol=5e-3)


def test_dens_dustem_eff_energy_balance():
    """Total emitted dust luminosity equals total absorbed power:
    integral over lambda of dens_stars_dust * V  ==
    4 pi * kabs/kext_ref*dens_ref*V*parsec^2 * integral B = abs_en scaled."""
    from dartray_tpu import dust as D

    DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
    lam = np.concatenate([np.logspace(-1, 0.5, 12), np.logspace(0.7, 3, 16)])
    wl = make_wavelength_grid(lam, max_lambda_stars=3.2, min_lambda_dust=1.0)
    assert not wl.no_dust_rt
    dustm = D.load_effective_dust_model(
        os.path.join(DATA, "DUST_OPACITY/TRUST/ZDA_BARE_GR_S_Effective.dat"),
        wl.lambda_um, lambda_ref=1.0,
    )
    ncell = 5
    dens_ref = np.array([0.1, 0.2, 0.0, 0.5, 1.0])
    rng = np.random.default_rng(0)
    u_stellar = rng.uniform(1e20, 1e22, (ncell, wl.lnum_stars))  # erg/Hz/pc^3

    em, T = DE.dens_dustem_eff(dustm, wl, dens_ref, u_stellar)
    em = np.asarray(em)
    T = np.asarray(T)
    assert np.all(T[dens_ref > 0] > 1.0)
    assert np.all(em[dens_ref == 0] == 0)

    # emitted power density [W/pc^3] = integral em dlambda
    emitted = (em * wl.delta_lambda_bin_dust[None, :]).sum(axis=1)
    # absorbed power density: n_grain_density * abs_en_per_grain
    # with n_grain = dens_ref/kext_ref [grains*?/pc^3 modulo parsec^2 factor]
    rf = np.asarray(DE.convert_ufield_ifield(u_stellar, wl.lambda_si[wl.stellar_slice]))
    abs_pg = (dustm.kabs[wl.stellar_slice] * rf * wl.delta_lambda_bin_stars).sum(axis=1)
    absorbed = abs_pg * dens_ref / dustm.kext_ref * PARSEC**2
    sel = dens_ref > 0
    np.testing.assert_allclose(emitted[sel], absorbed[sel], rtol=1e-3)


def test_dust_rt_loop_on_slab():
    """Tiny end-to-end dust RT: stellar field heats the TRUST slab, dust
    emits in the IR, self-heating converges, SED is positive in the IR."""
    from dartray_tpu import dust as D, pipeline as P
    from dartray_tpu.models import trustI
    from dartray_tpu.config import RTConfig

    DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
    grid = trustI.build_trustI_grid(
        tau_z=1.0, base=(10, 2), max_lvl=1, min_lvl=1, max_ncell=50_000
    )
    lam = np.concatenate([np.logspace(-1, 0.4, 11), np.logspace(0.5, 3, 12)])
    wl = make_wavelength_grid(lam, max_lambda_stars=2.6, min_lambda_dust=1.0)
    dustm = D.load_effective_dust_model(
        os.path.join(DATA, "DUST_OPACITY/TRUST/ZDA_BARE_GR_S_Effective.dat"),
        wl.lambda_um, lambda_ref=1.0,
    )
    cfg = RTConfig(
        accuracy=0.3, bm_par=4, bm_par_sca=2, bm_par_max=40, rad_lim=0.2,
        kp_sca_max=0, conv_en_lim=0.05, dist_obs=1e4,
        use_p_src=True, use_dir_out=True, print_sed=True,
        dust_heating_type="eff", only_direct_rt=True,
    ).validate()
    tl, tf = trustI.read_planck_table(os.path.join(DATA, "TRUSTI_GRIDS/BB_T10000_L100000.dat"))
    lum = trustI.source_luminosity(wl.lambda_um, tl, tf)[None, :]
    dir_out = np.array([[np.pi, 0.0]])

    stellar = P.run_main(
        grid, cfg, wl, dustm,
        p_src_pos=trustI.STAR_POS[None, :], p_src_lum=lum[:, wl.stellar_slice],
        dir_out=dir_out, chunk=64,
    )
    dustres = P.run_dust_rt(
        grid, cfg, wl, dustm, stellar.u_final, dir_out=dir_out, chunk=64,
        max_dust_iterations=5,
    )
    assert dustres.converged
    assert dustres.iterations >= 1
    T = dustres.t_dust
    dens = np.asarray(grid.dens_ref)
    assert np.all(T[dens > 0] > 5.0) and np.all(T[dens > 0] < 200.0)
    # IR SED positive and peaks at lambda > 10 um for these temperatures
    sed = dustres.sed_dust[0]
    assert np.all(sed >= 0) and sed.max() > 0
    lam_d = wl.lambda_um[wl.dust_slice]
    assert lam_d[np.argmax(sed)] > 10.0
    # global energy conservation: emitted dust luminosity ~= absorbed
    # stellar luminosity (tau=1 slab absorbs a sizeable fraction)
    em_tot = (dustres.dens_stars_dust * (np.asarray(grid.csize) ** 3)[:, None]
              * wl.delta_lambda_bin_dust[None, :]).sum()
    assert em_tot > 0
