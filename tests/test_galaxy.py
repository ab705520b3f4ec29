"""Galaxy model tests: profile normalizations, dust calibration, grid build."""
import numpy as np
import pytest

from dartray_tpu.models import galaxy as G
from dartray_tpu.grid import build_grid


def test_eta_disk0_normalizes_total_luminosity():
    """Integrating the expR_expz profile over the volume recovers lnu."""
    lnu = 7.5e21
    hc, zc, rtrun = 3200.0, 140.0, 14000.0
    a0 = G.eta_disk0(lnu, "expR_expz", hc, zc, rtrun)
    # numeric integral in cylindrical coordinates
    R = np.linspace(0, rtrun, 4000)
    zint = 2 * zc  # integral of exp(-|z|/zc)
    L = np.trapezoid(a0 * np.exp(-R / hc) * 2 * np.pi * R * zint, R)
    np.testing.assert_allclose(L, lnu, rtol=1e-5)


def test_kext_disk0_faceon_tau():
    """Face-on optical depth through both dust disks at R=0 equals tau1+tau2
    (for kext(lambda)=kext(B))."""
    tau1, tau2 = 3.17, 0.61
    zd, zdt = 140.0, 50.0
    k_d, k_t = G.kext_disk0(tau1, tau2, zd, zdt, 1.0)
    # vertical integral of k0 * exp(-|z|/zd) = 2 k0 zd
    np.testing.assert_allclose(2 * k_d * zd + 2 * k_t * zdt, tau1 + tau2, rtol=1e-12)


def test_flared_profile_properties():
    d = G.DiskParams(
        disk_type="flared_sech2z", a0=1.0, hc=3200.0, zc=140.0,
        zc_r1=170.0, zc_rsun=300.0, chi=0.5, r1=4500.0, rsun=8000.0,
        max_z=4000.0, max_rad=14000.0,
    )
    # scale height grows with radius (flare)
    z = 200.0
    rho_in = d.density(np.array([[5000.0, 0, z]]))[0]
    rho_mid = d.density(np.array([[5000.0, 0, 0.0]]))[0]
    rho_out_z = d.density(np.array([[12000.0, 0, z]]))[0]
    rho_out_mid = d.density(np.array([[12000.0, 0, 0.0]]))[0]
    assert rho_in < rho_mid
    # relative z-falloff is shallower at large radius (bigger scale height)
    assert rho_out_z / rho_out_mid > rho_in / rho_mid
    # inner taper: radial factor at R -> 0 reduced by chi = 0.5; the flare
    # factor zc/zc_r differs between the two radii (1 at center, zc/zc_r1
    # at r1), so the midplane ratio is chi * zc_r1/zc
    rho_c = d.density(np.array([[1.0, 0, 0.0]]))[0]
    rho_r1 = d.density(np.array([[4500.0, 0, 0.0]]))[0]
    np.testing.assert_allclose(rho_c / rho_r1, 0.5 * 170.0 / 140.0, rtol=0.01)
    # beyond max_rad: zero
    assert d.density(np.array([[14500.0, 0, 0.0]]))[0] == 0


def test_bulge_sersic():
    b = G.BulgeParams(a0=1.0, reff=400.0, acap=40.0, ellipt=0.5,
                      mtrunc=3.0, nsersic=4)
    # decreasing with m; flattened along z
    r1 = b.density(np.array([[200.0, 0, 0]]))[0]
    r2 = b.density(np.array([[800.0, 0, 0]]))[0]
    assert r1 > r2 > 0
    # z flattening: same m at z = ellipt * x
    rho_x = b.density(np.array([[300.0, 0, 0]]))[0]
    rho_z = b.density(np.array([[0, 0, 150.0]]))[0]
    np.testing.assert_allclose(rho_x, rho_z, rtol=1e-12)
    # truncation
    assert b.density(np.array([[1300.0, 0, 0]]))[0] == 0.0


@pytest.mark.parametrize("seed", [0])
def test_galaxy_grid_build_and_luminosity(seed):
    """Small galaxy grid: total stellar luminosity on the leaves matches
    the calibrated lnu_tot within discretization error."""
    lam_tab = np.array([0.443, 0.564, 2.2])
    lnu_tab = np.array([4.771e21, 9.382e21, 6.497e22])
    model = G.GalaxyModel(
        old_disk=G.DiskParams("expR_expz", 0.0, 3200.0, 140.0,
                              max_z=4000.0, max_rad=14000.0),
        young_disk=G.DiskParams("expR_expz", 0.0, 3200.0, 50.0,
                                max_z=4000.0, max_rad=14000.0),
        bulge=G.BulgeParams(1.0, 400.0, 40.0, 0.5, 3.0, 4),
        thick_dust=G.DiskParams("expR_expz", 0.0, 5200.0, 140.0,
                                max_z=4000.0, max_rad=14000.0),
        thin_dust=G.DiskParams("expR_expz", 0.0, 3200.0, 50.0,
                               max_z=4000.0, max_rad=14000.0),
        old_sed=(lam_tab, lnu_tab),
        young_sed=(lam_tab, lnu_tab * 0.3),
        old_norm=0.353,
        sfr=1.0,
        bd_ratio=0.5,
        rtrun=14000.0,
    )
    # dust amplitudes
    k_d, k_t = G.kext_disk0(3.17, 0.61, 140.0, 50.0, 1.0)
    model.thick_dust = G.DiskParams("expR_expz", k_d, 5200.0, 140.0,
                                    max_z=4000.0, max_rad=14000.0)
    model.thin_dust = G.DiskParams("expR_expz", k_t, 3200.0, 50.0,
                                   max_z=4000.0, max_rad=14000.0)

    lnu_old, lnu_sf, lnu_bulge = model.luminosities(np.array([0.443]))
    lnu_tot = float(lnu_old[0] + lnu_sf[0] + lnu_bulge[0])

    dens_fn = G.make_galaxy_dens_fn(model, 0.443)
    subdiv = G.make_galaxy_subdivision_fn(
        max_dtau=1.0, max_dlum=1e-3, lnu_tot=lnu_tot,
        z_subd_lim=300.0, R_subd_lim=5000.0, max_lvl=3,
    )
    grid = build_grid(dens_fn, subdiv, base=(7, 2), max_lvl=3, min_lvl=1,
                      modelsize=28000.0, max_ncell=500_000)
    assert grid.n_cells > 343

    ds = G.galaxy_dens_stars_arr(grid, model, np.array([0.443]))
    vol = np.asarray(grid.csize) ** 3
    total = float((ds[:, 0] * vol).sum())
    # cell averages use the reference's step_int=10 subgrid; the thin young
    # disk (zc = 50 pc) is undersampled inside the coarse off-plane cells,
    # exactly as in the reference, so the total carries ~10% quadrature
    # error at this deliberately coarse test resolution
    np.testing.assert_allclose(total, lnu_tot, rtol=0.12)
    # the bulge is renormalized exactly on the grid (fix_dens_stars_arrays):
    # its contribution equals lnu_bulge to machine precision
    import dataclasses as DC

    with_b = G.galaxy_dens_stars_arr(grid, DC.replace(model, sfr=0.0), np.array([0.443]))
    no_b = G.galaxy_dens_stars_arr(
        grid, DC.replace(model, sfr=0.0, bd_ratio=0.0), np.array([0.443])
    )
    bulge_total = float(((with_b - no_b)[:, 0] * vol).sum())
    np.testing.assert_allclose(bulge_total, float(lnu_bulge[0]), rtol=1e-10)
