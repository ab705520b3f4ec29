"""Config parsing, wavelength grid and dust model tests against the shipped
TRUST I benchmark data (data/TRUSTI_GRIDS, data/DUST_OPACITY)."""
import os

import numpy as np
import pytest

from dartray_tpu.config import load_config, RTConfig
from dartray_tpu.wavelength import make_wavelength_grid, read_lambda_list
from dartray_tpu import dust
from dartray_tpu.models import trustI

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
TRUST_IN = os.path.join(DATA, "TRUSTI_GRIDS", "input_trustI_tau0.01_LD.in")
LAMBDA_LIST = os.path.join(DATA, "TRUSTI_GRIDS", "lambda_list_trustI_basic.dat")
AV_OPAC = os.path.join(DATA, "DUST_OPACITY", "TRUST", "ZDA_BARE_GR_S_Effective.dat")
BB_TABLE = os.path.join(DATA, "TRUSTI_GRIDS", "BB_T10000_L100000.dat")


@pytest.fixture(scope="module")
def trust_in(tmp_path_factory):
    """The reference input file, with data paths fixed to the repo copies."""
    text = open(TRUST_IN).read()
    text = text.replace("./DUST_OPACITY", DATA + "/DUST_OPACITY")
    text = text.replace("./TRUSTI_GRIDS/", DATA + "/TRUSTI_GRIDS/")
    p = tmp_path_factory.mktemp("cfg") / "input_trustI.in"
    p.write_text(text)
    return str(p)


def test_parse_reference_input(trust_in):
    cfg = load_config(trust_in)
    assert cfg.rt_algorithm == "main"
    assert cfg.kp_sca_max == 1
    assert cfg.accuracy == 0.1
    assert cfg.bm_par == 10 and cfg.bm_par_sca == 5 and cfg.bm_par_max == 200
    assert cfg.rad_lim == 0.1
    assert cfg.max_lambda_stars == 80.0
    assert cfg.dist_obs == 10e3
    assert cfg.use_p_src and cfg.use_dir_out
    assert cfg.no_communications is True
    assert cfg.z_wall_on is True
    assert cfg.z_wall_coord == (0.0, 0.3)
    assert cfg.ind_out_maps == [2, 8, 28, 35]
    assert cfg.dust_heating_type == "eff"
    assert cfg.units_luminosity == "erg/s/Hz"


def test_validation_rejects_bad_values():
    with pytest.raises(ValueError):
        RTConfig(kp_sca_max=9).validate()
    with pytest.raises(ValueError):
        RTConfig(bm_par=10, bm_par_max=50).validate()
    with pytest.raises(ValueError):
        RTConfig(rt_algorithm="bogus").validate()


def test_wavelength_grid_split():
    lam = read_lambda_list(LAMBDA_LIST)
    assert len(lam) == 45
    wl = make_wavelength_grid(lam, max_lambda_stars=80.0, min_lambda_dust=1.0)
    # stellar range: lambda <= 80 um
    assert wl.lambda_um[wl.i_lambda_stars[1]] <= 80.0
    assert wl.lambda_um[wl.i_lambda_stars[1] + 1] > 80.0
    # dust range starts at the last lambda <= 1 um (= 1.0 exactly here)
    assert wl.lambda_um[wl.i_lambda_dust[0]] == 1.0
    assert not wl.no_dust_rt
    # bins integrate to the full range (log-centered bins cover [l0, l1])
    np.testing.assert_allclose(
        wl.delta_lambda_bin.sum(), wl.lambda_si[-1] - wl.lambda_si[0], rtol=1e-12
    )


def test_effective_dust_model():
    lam = read_lambda_list(LAMBDA_LIST)
    dm = dust.load_effective_dust_model(AV_OPAC, lam, lambda_ref=1.0)
    assert dm.kext.shape == (45,)
    # extinction must decrease from optical to mm
    assert dm.kext[11] > dm.kext[-1]  # 1um vs 1000um
    # kext_ref equals kext at lambda=1um (present in grid)
    i1 = np.argmin(np.abs(lam - 1.0))
    np.testing.assert_allclose(dm.kext[i1], dm.kext_ref, rtol=1e-10)
    # albedo in [0,1]
    assert np.all((dm.albedo >= 0) & (dm.albedo <= 1))
    # g in (-1,1)
    assert np.all(np.abs(dm.gsca) < 1)
    # table values: at 1um, TRUST ZDA BARE-GR-S has albedo ~0.5-0.6
    assert 0.4 < dm.albedo[i1] < 0.7


def test_trust_source_luminosity():
    tl, tf = trustI.read_planck_table(BB_TABLE)
    lam = read_lambda_list(LAMBDA_LIST)
    wl = make_wavelength_grid(lam, max_lambda_stars=80.0)
    lum = trustI.source_luminosity(wl.lambda_um[wl.stellar_slice], tl, tf)
    assert np.all(lum > 0)
    # total luminosity ~ 1e5 Lsun = 3.839e38 erg/s: integrate L_nu dnu
    from dartray_tpu.constants import CSPEED

    lam_si = wl.lambda_si[wl.stellar_slice]
    lum_all = trustI.source_luminosity(tl, tl, tf)  # at table points
    nu = CSPEED / (tl * 1e-6)
    order = np.argsort(nu)
    tot = np.trapezoid(lum_all[order], nu[order])
    np.testing.assert_allclose(tot, 3.839e38, rtol=0.05)
