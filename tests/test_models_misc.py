"""Tests for the N-body/SPH and 2dto3d model importers."""
import os

import numpy as np
import pytest

from dartray_tpu.models import nbody_sph as NB
from dartray_tpu.models import twod3d as TD

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
MARASTON = os.path.join(
    DATA, "STELLAR_LIBRARIES", "maraston2005",
    "table_lum_mass_vs_age_met_maraston2005_kr_rhb.h5",
)
G2_FILE = os.path.join(
    DATA, "2DTO3D_GRIDS", "EX1",
    "grid_wd01_q06_t37_s100_no35_bd45_hd5200_zd140_hd1_3200_zd1_50_hs3200_"
    "zs140_hs1_3200_zs1_50_reff400_ell60_sca_irr1_l100.000um.dat",
)


def fake_particles(n_star=4000, n_gas=6000, seed=0, modelsize=20000.0):
    rng = np.random.default_rng(seed)
    # exponential disk-ish distribution
    def disk(n, h, zc):
        r = rng.exponential(h, n)
        phi = rng.uniform(0, 2 * np.pi, n)
        z = rng.laplace(0, zc, n)
        return np.stack([r * np.cos(phi), r * np.sin(phi), z], -1)

    return NB.Particles(
        starcoord=np.clip(disk(n_star, 3000, 300), -modelsize / 2 * 0.99, modelsize / 2 * 0.99),
        mstar=rng.uniform(1e4, 1e5, n_star),
        agestar=rng.uniform(0.1, 10.0, n_star),
        fehstar=rng.uniform(-1.0, 0.3, n_star),
        gascoord=np.clip(disk(n_gas, 4000, 200), -modelsize / 2 * 0.99, modelsize / 2 * 0.99),
        mgas=rng.uniform(1e4, 1e5, n_gas),
        gastemp=rng.uniform(1e2, 1e7, n_gas),
        fehgas=rng.uniform(-1.0, 0.3, n_gas),
        ofegas=rng.uniform(-0.2, 0.4, n_gas),
    )


def test_stellar_library_loads():
    lib = NB.load_stellar_library(MARASTON)
    assert lib.lum_to_mass.shape == (len(lib.lambda_um), len(lib.age_yr), len(lib.met))
    assert np.all(lib.lum_to_mass >= 0)
    assert lib.lambda_um.min() < 1.0 < lib.lambda_um.max()


def test_star_luminosities_reasonable():
    lib = NB.load_stellar_library(MARASTON)
    parts = fake_particles(n_star=500, n_gas=10)
    lum = NB.star_luminosities(1.0, parts, lib)
    assert np.all(lum > 0)
    # older populations are dimmer per unit mass in the optical
    young = parts.agestar < 1.0
    old = parts.agestar > 7.0
    lm = lum / parts.mstar
    assert np.median(lm[young]) > np.median(lm[old])


def test_nbody_grid_conserves_particle_totals():
    parts = fake_particles()
    lum_ref = np.ones(len(parts.mstar))
    grid = NB.build_nbody_grid(
        parts, lum_ref, kext_gas_ref=1e-8, base=(8, 2), max_lvl=4,
        modelsize=20000.0, max_dtau=0.05, max_dlum=1e-3,
    )
    leaf = np.asarray(grid.leaf_mask())
    vol = np.asarray(grid.csize) ** 3
    # total stellar "luminosity" on the grid == number of particles in box
    tot = float((np.asarray(grid.dens_stars_ref) * vol)[leaf].sum())
    np.testing.assert_allclose(tot, len(parts.mstar), rtol=1e-10)
    # dust mass: only cool gas contributes
    cool = parts.gastemp < 1e6
    mdust = (parts.mgas * 10.0 ** (parts.ofegas + parts.fehgas))[cool].sum()
    tot_d = float((np.asarray(grid.dens_ref) * vol)[leaf].sum()) / 1e-8
    np.testing.assert_allclose(tot_d, mdust, rtol=1e-10)
    # particle -> cell map lands particles in their own cells
    pc = NB.particle_cells(grid, parts.starcoord)
    cc = np.asarray(grid.ccoord)[pc]
    cs = np.asarray(grid.csize)[pc]
    assert np.all(np.abs(parts.starcoord - cc) <= cs[:, None] / 2 * (1 + 1e-9))


def test_2d_table_roundtrip():
    g2 = TD.read_grid_2d(G2_FILE)
    assert g2.lum.shape == (len(g2.r), len(g2.z))
    assert np.all(np.diff(g2.r) > 0) and np.all(np.diff(g2.z) > 0)
    # midplane emissivity decreases outward
    assert g2.lum[0, 0] > g2.lum[-1, 0]
    # sampling at a table point returns that value
    l, d = TD.sample(g2, np.array([[g2.r[3] + 1.0, 0.0, g2.z[2] + 1.0]]))
    np.testing.assert_allclose(l[0], g2.lum[3, 2])
    # outside -> zero
    l, d = TD.sample(g2, np.array([[g2.r[-1] * 2, 0.0, 0.0]]))
    assert l[0] == 0.0


def test_2dto3d_grid_build():
    g2 = TD.read_grid_2d(G2_FILE)
    grid = TD.build_2dto3d_grid(
        g2, base=(7, 2), max_lvl=3, modelsize=2 * g2.r[-1],
        max_dtau=1e30, max_dlum=1e-2,
    )
    leaf = np.asarray(grid.leaf_mask())
    vol = np.asarray(grid.csize) ** 3
    tot_grid = float((np.asarray(grid.dens_stars_ref) * vol)[leaf].sum())
    # exact integral of the piecewise-constant (bracketing-lookup) function:
    # table point (k,j) covers the annulus [r_k, r_k+1) x |z| in [z_j, z_j+1)
    r, z = g2.r, g2.z
    ann = np.pi * (r[1:] ** 2 - r[:-1] ** 2)  # (nr-1,)
    dz = 2.0 * (z[1:] - z[:-1])  # (nz-1,), both z signs
    tot_exact = float(ann @ g2.lum[:-1, :-1] @ dz)
    np.testing.assert_allclose(tot_grid, tot_exact, rtol=0.05)


def test_tipsy_converter_roundtrip(tmp_path):
    """scripts/tipsy2dartray.py: standard tipsy binary -> the nine
    Nbody_SPH datasets (io_routines.f90:149-160), with gasoline FeMassFrac/
    OxMassFrac auxiliaries and unit conversions."""
    import struct
    import subprocess
    import sys
    import h5py

    rng = np.random.default_rng(3)
    nsph, ndark, nstar = 5, 2, 4
    sim = tmp_path / "snap.tipsy"
    gas = rng.random((nsph, 12)).astype(">f4")
    gas[:, 8] = 1e4  # temp
    dark = rng.random((ndark, 9)).astype(">f4")
    star = rng.random((nstar, 11)).astype(">f4")
    star[:, 8] = 0.2  # tform
    with open(sim, "wb") as f:
        f.write(struct.pack(">d5i", 1.0, nsph + ndark + nstar, 3,
                            nsph, ndark, nstar))
        f.write(gas.tobytes())
        f.write(dark.tobytes())
        f.write(star.tobytes())
    n = nsph + ndark + nstar
    fe = np.full(n, 1.31e-3, dtype=">f4")  # solar -> [Fe/H] = 0
    ox = np.full(n, 2.0 * 5.79e-3, dtype=">f4")  # 2x solar O
    with open(str(sim) + ".FeMassFrac", "wb") as f:
        f.write(struct.pack(">i", n))
        f.write(fe.tobytes())
    with open(str(sim) + ".OxMassFrac", "wb") as f:
        f.write(struct.pack(">i", n))
        f.write(ox.tobytes())

    out = tmp_path / "out.h5"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts/tipsy2dartray.py"),
         str(sim), str(out), "--dkpcunit", "2.0", "--dmsolunit", "1e9",
         "--time-gyr", "10.0"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    with h5py.File(out) as f:
        assert f["starcoord"].shape == (nstar, 3)
        assert f["gascoord"].shape == (nsph, 3)
        np.testing.assert_allclose(
            f["gascoord"][...], gas[:, 1:4].astype(np.float64) * 2000.0,
            rtol=1e-6)
        np.testing.assert_allclose(
            f["mstar"][...], star[:, 0].astype(np.float64) * 1e9, rtol=1e-6)
        np.testing.assert_allclose(f["agestar"][...], 9.8, rtol=1e-5)
        np.testing.assert_allclose(f["fehstar"][...], 0.0, atol=1e-5)
        np.testing.assert_allclose(f["fehgas"][...], 0.0, atol=1e-5)
        np.testing.assert_allclose(f["ofegas"][...], np.log10(2.0),
                                   atol=1e-5)
        # the converted particle file feeds the model loader directly
        from dartray_tpu.models import nbody_sph as NB

        parts = NB.load_particles(str(out))
        assert parts.starcoord.shape == (nstar, 3)
        assert parts.mgas.shape == (nsph,)
