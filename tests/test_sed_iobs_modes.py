"""'sed' and 'i_obs' rt_algorithm modes: cross-mode redundancy checks
(SURVEY.md §4: these recompute outputs from persisted arrays and must be
consistent with the main run)."""
import os

import numpy as np
import pytest

from dartray_tpu.config import RTConfig
from dartray_tpu.wavelength import make_wavelength_grid
from dartray_tpu import dust as D, pipeline as P, io_output as OUT
from dartray_tpu.models import trustI
from dartray_tpu.rt import scattering as SC

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    grid = trustI.build_trustI_grid(
        tau_z=1.0, base=(10, 2), max_lvl=1, min_lvl=1, max_ncell=50_000
    )
    lam = np.array([0.4, 1.0])
    wl = make_wavelength_grid(lam, max_lambda_stars=80.0)
    dustm = D.load_effective_dust_model(
        os.path.join(DATA, "DUST_OPACITY/TRUST/ZDA_BARE_GR_S_Effective.dat"),
        wl.lambda_um, lambda_ref=1.0,
    )
    tl, tf = trustI.read_planck_table(os.path.join(DATA, "TRUSTI_GRIDS/BB_T10000_L100000.dat"))
    lum = trustI.source_luminosity(wl.lambda_um, tl, tf)[None, :]
    cfg = RTConfig(
        accuracy=0.3, bm_par=4, bm_par_sca=2, bm_par_max=40, rad_lim=0.2,
        kp_sca_max=1, conv_en_lim=0.05, dist_obs=1e4,
        use_p_src=True, use_dir_out=True, print_sed=True, print_maps=True,
        npixel_maps=40, map_size_factor=1.5,
    ).validate()
    dir_out = np.array([[0.0, 0.0], [np.pi, 0.0]])
    res = P.run_main(
        grid, cfg, wl, dustm,
        p_src_pos=trustI.STAR_POS[None, :], p_src_lum=lum,
        dir_out=dir_out, chunk=64,
    )
    d = tmp_path_factory.mktemp("runs")
    files = OUT.OutputFiles(str(d), "trust_test", wl.lambda_um[wl.stellar_slice])
    OUT.write_field_per_lambda(files, "i_obs", res.i_obs)
    return grid, cfg, wl, dustm, lum, dir_out, res, files


def test_sed_mode_matches_main(run):
    grid, cfg, wl, dustm, lum, dir_out, res, files = run
    psrc_host = None
    import dartray_tpu.rt.engine as E

    psrc = E.point_source_set(grid, trustI.STAR_POS[None, :], lum)
    sed, maps_out = P.run_sed_algorithm(
        grid, cfg, wl, files, n_point=1, src_host=psrc.cell, dir_out=dir_out
    )
    np.testing.assert_allclose(sed, res.sed_tot, rtol=1e-12)
    assert maps_out is not None and maps_out.shape[0] == 2


def test_iobs_mode_matches_main(run):
    """Recomputing i_obs from scaspe_tot for the same directions must agree
    with the main run's totals (the observer-pixel vs HEALPix-pixel lookup
    differ at the angular discretization level)."""
    grid, cfg, wl, dustm, lum, dir_out, res, files = run
    scfg = SC.ScaspeConfig.make(
        cfg.kp_sca_max, np.asarray(dustm.gsca)[wl.stellar_slice], dir_out
    )
    i_obs2, _ = P.run_iobs_algorithm(
        grid, cfg, wl, dustm, res.scaspe_tot, scfg, dir_out=dir_out,
        p_src_pos=trustI.STAR_POS[None, :], p_src_lum=lum,
    )
    from dartray_tpu import sed as SEDM

    sed2 = SEDM.calc_sed(
        grid, i_obs2, cfg.dist_obs, "erg/s/Hz/pc^2/sr",
        src_host=[int(np.asarray(res.i_obs).shape[0]) - grid.n_cells - 1 + grid.n_cells] if False else None,
    )
    # compare only the cell (scattered) component; point-source rows differ
    # by none (direct light identical)
    sed_cells_main = SEDM.calc_sed(
        grid, res.i_obs[: grid.n_cells], cfg.dist_obs, "erg/s/Hz/pc^2/sr"
    )
    sed_cells_mode = SEDM.calc_sed(
        grid, i_obs2[: grid.n_cells], cfg.dist_obs, "erg/s/Hz/pc^2/sr"
    )
    # the i_obs algorithm reads the scattered luminosity from the HEALPix
    # pixel containing the direction rather than the dedicated observer
    # pixel: agreement at the phase-function discretization level
    np.testing.assert_allclose(sed_cells_mode, sed_cells_main, rtol=0.35)
    assert np.all(sed_cells_mode > 0)
