"""2D/axisymmetric mode: the octant-symmetry algorithm must reproduce the
full 3D calculation on a reflection-symmetric model (the reference's own
cross-check, rt_routines.f90:41)."""
import numpy as np
import pytest
import jax.numpy as jnp

from dartray_tpu.grid import build_grid
from dartray_tpu.config import RTConfig
from dartray_tpu.wavelength import make_wavelength_grid
from dartray_tpu import dust as D
from dartray_tpu import pipeline as P
from dartray_tpu.rt import symmetry as SYM
from dartray_tpu.rt import scattering as SC


@pytest.fixture(scope="module")
def shell_setup():
    """Spherically symmetric dusty shell with an emitting core."""

    def dens_fn(centers, csize):
        r = np.sqrt(np.sum(centers**2, axis=1))
        dens = np.where((r > 2.0) & (r < 4.0), 0.08, 1e-4)
        stars = np.where(r < 1.5, 1.0, 0.0)
        return dens, stars

    def subdiv(centers, csize, level, dens, dens_stars):
        r = np.sqrt(np.sum(centers**2, axis=1))
        return (np.abs(r - 3.0) < 1.5) & (level < 2)

    grid = build_grid(dens_fn, subdiv, base=(6, 2), max_lvl=2, min_lvl=1,
                      modelsize=10.0, max_ncell=100_000)
    lam = np.array([0.4, 1.0, 2.0])
    wl = make_wavelength_grid(lam, max_lambda_stars=80.0, min_lambda_dust=1.0)
    L = wl.lnum_stars
    dustm = D.DustModel(
        lambda_um=lam,
        kext=np.array([1.8, 1.0, 0.5]),
        kabs=np.array([0.9, 0.5, 0.3]),
        ksca=np.array([0.9, 0.5, 0.2]),
        gsca=np.array([0.6, 0.4, 0.0]),
        kext_ref=1.0,
    )
    ds = np.zeros((grid.n_cells, L))
    stars = np.asarray(grid.dens_stars_ref)
    for j in range(L):
        ds[:, j] = stars
    # small accuracy: the f_U kill criterion is threshold-based, so the 2D
    # and 3D runs can legitimately differ by up to ~accuracy where a kill
    # decision flips between a ray and its symmetry-inferred twin
    cfg = RTConfig(accuracy=1e-3, bm_par=6, bm_par_sca=4, bm_par_max=200,
                   rad_lim=0.3, kp_sca_max=1, dist_obs=1e6,
                   limit_scattering_iterations=True, max_sca_iterations=2,
                   print_sed=True, print_maps=False).validate()
    return grid, cfg, wl, dustm, ds


def test_build_symmetry(shell_setup):
    grid, *_ = shell_setup
    sym = SYM.build_symmetry(grid)
    cc = np.asarray(grid.ccoord)
    # mirror coordinates match exactly
    for m, s in enumerate(SYM._SIGNS):
        np.testing.assert_allclose(
            cc[sym.links[:, m]], cc[sym.primary] * s[None, :], atol=1e-12
        )
    # octant + axis + mirrors tile all leaves
    leaves = set(np.flatnonzero(np.asarray(grid.leaf_mask())))
    covered = set(sym.primary.tolist())
    covered.update(sym.links.ravel().tolist())
    assert covered == leaves


def test_check_2d_src():
    SYM.check_2d_src(None)
    SYM.check_2d_src(np.zeros((1, 3)))
    with pytest.raises(ValueError):
        SYM.check_2d_src(np.array([[1.0, 0, 0]]))
    with pytest.raises(ValueError):
        SYM.check_2d_src(np.zeros((2, 3)))


def test_scaspe_perms_are_involutions(shell_setup):
    grid, cfg, wl, dustm, ds = shell_setup
    scfg = SC.ScaspeConfig.make(1, np.array([0.6, 0.4, 0.0]), None)
    perms = SYM.scaspe_perms(scfg)
    for b, pm in zip(scfg.buckets, perms):
        if pm is None:
            continue
        for m in range(7):
            np.testing.assert_array_equal(pm[m][pm[m]], np.arange(b.npix_hp))


def _symmetrize_mean(u, sym):
    """Mean of a field over its 8 symmetry images (the converged limit the
    3D run approaches as the ray density grows)."""
    out = u.copy()
    acc = u[sym.primary].copy()
    for m in range(7):
        acc += u[sym.links[:, m]]
    acc /= 8.0
    out[sym.primary] = acc
    for m in range(7):
        out[sym.links[:, m]] = acc
    return out


def test_2d_matches_3d_direct(shell_setup):
    """The 3D field carries mirror-to-mirror sampling noise (split/merge
    threshold flips between rays that are only mirror-equal to roundoff),
    so the 2D result is compared against the symmetry-averaged 3D field —
    the 2D field must sit WITHIN the 3D run's own asymmetry envelope."""
    import dataclasses

    grid, cfg, wl, dustm, ds = shell_setup
    cfg = dataclasses.replace(
        cfg, only_direct_rt=True, bm_par=60, bm_par_max=1000
    ).validate()

    r3 = P.run_main(grid, cfg, wl, dustm, dens_stars_arr=ds, two_d=False)
    r2 = P.run_main(grid, cfg, wl, dustm, dens_stars_arr=ds, two_d=True)
    sym = SYM.build_symmetry(grid)

    u3s = _symmetrize_mean(r3.u_final, sym)
    nz = u3s > 0
    rel = np.abs(r2.u_final[nz] - u3s[nz]) / u3s[nz]
    # 3D self-asymmetry at this ray density is ~9% max / ~1.8% mean; the
    # 2D field must be at least as close to the symmetrized field
    assert rel.max() < 0.08, rel.max()
    assert rel.mean() < 0.02, rel.mean()
    # integrated absorbed energy matches tightly
    np.testing.assert_allclose(
        r2.u_final.sum(axis=0), r3.u_final.sum(axis=0), rtol=1e-3
    )
    # lost-luminosity bookkeeping (x8 scaling of pass-A losses)
    np.testing.assert_allclose(r2.lum_lost, r3.lum_lost, rtol=0.05)
    # the 2D field itself is exactly symmetric
    for m in range(7):
        np.testing.assert_array_equal(
            r2.u_final[sym.links[:, m]], r2.u_final[sym.primary]
        )


def test_2d_scattering_symmetric(shell_setup):
    """Full 2D run including scattering iterations: fields and scaspe_tot
    stay exactly symmetric, SED is produced."""
    grid, cfg, wl, dustm, ds = shell_setup
    dir_out = np.array([[0.3, 0.7], [1.2, 4.0]])
    r2 = P.run_main(grid, cfg, wl, dustm, dens_stars_arr=ds,
                    dir_out=dir_out, two_d=True)
    sym = SYM.build_symmetry(grid)
    for m in range(7):
        np.testing.assert_array_equal(
            r2.u_final[sym.links[:, m]], r2.u_final[sym.primary]
        )
    assert r2.sed_tot is not None and np.all(np.isfinite(r2.sed_tot))
    assert r2.sed_tot.sum() > 0
    assert r2.scaspe_tot is not None
    # per-cell scattered luminosity symmetric too
    from dartray_tpu.rt.scattering import ScaspeConfig

    scfg = SC.ScaspeConfig.make(cfg.kp_sca_max, np.array([0.6, 0.4, 0.0]), None)
    lc = scfg.lumcell(r2.scaspe_tot)
    for m in range(7):
        np.testing.assert_allclose(
            lc[sym.links[:, m]], lc[sym.primary], rtol=1e-12
        )
