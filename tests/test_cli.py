"""CLI end-to-end: grid creation + full RT run from reference-format
namelist input files (MAGTAR shell, scaled down for the CPU test budget)."""
import os
import subprocess
import sys

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


@pytest.fixture(scope="module")
def shell_inputs(tmp_path_factory):
    d = tmp_path_factory.mktemp("magtar")
    lam = [0.3, 0.5, 0.8, 1.0, 2.0]
    (d / "lambda_small.dat").write_text("\n".join(str(x) for x in lam) + "\n")
    (d / "dir_out.dat").write_text(" THETA PHI\n0.0 0.0\n1.5707963 0.0\n")
    (d / "pos_obs.dat").write_text(" X Y Z\n0.0 0.0 0.5\n")
    (d / "pos_point_sources.dat").write_text(" X Y Z\n0. 0. 0.\n")
    (d / "param_point_sources.dat").write_text(" Teff Lbol\n3660 112201.89\n")
    (d / "input_grid_shell.in").write_text(f"""
&magtar_input_strings
grid_file='grid_shell.h5'
dir_grid='{d}/'
dust_geometry = 'shell'
file_lambda_list = 'lambda_small.dat',
units_lambda = 'um',
dust_model = 'TRUST',
file_av_opacities = '{DATA}/DUST_OPACITY/TRUST/ZDA_BARE_GR_S_Effective.dat'
subdivision_criteria = 'shell'
/
&magtar_input_var
modelsize =10
tau_z=4.8E-1
lambda_ref=1.
base=6,3
ax=1.09
by=2.18
cz=2.18
elrad_width=0.10
max_ncell=1.5E6
max_lvl=2
min_lvl=1.
max_dtau=4.8E-1
/
&magtar_input_logical
input_av_opacities = .TRUE.,
/""")
    (d / "input_shell.in").write_text(f"""
&dartray_input_strings
label_model_out = 'shell'
grid_file='grid_shell.h5',
file_dir_out='dir_out.dat',
file_p_src='pos_point_sources.dat',
file_pos_obs='pos_obs.dat',
file_lambda_list='lambda_small.dat',
dir_runs='{d}/RUNS',
rt_algorithm = 'main',
dir_grid='{d}/',
units_lambda = 'um',
dust_model = 'TRUST',
file_av_opacities = '{DATA}/DUST_OPACITY/TRUST/ZDA_BARE_GR_S_Effective.dat',
units_csize = 'pc',
units_luminosity = 'erg/s/Hz',
dust_heating_type = 'eff',
file_param_src = 'param_point_sources.dat'
/
&dartray_input_var
lambda_ref = 1.,
kp_sca_max=0,
rad_lim=0.2,
accuracy=0.3,
conv_en_lim=0.05,
bm_par = 3,
bm_par_sca= 2,
bm_par_max=30,
max_lambda_stars = 30,
min_lambda_dust = 1.,
dist_obs = 10E3,
npixel_maps = 50,
map_size_factor = 1.
/
&dartray_input_logical
use_dir_out = .TRUE.,
use_p_src = .TRUE.,
use_pos_obs = .TRUE.,
print_maps = .TRUE.,
print_sed = .TRUE.,
input_av_opacities = .TRUE.,
no_dust_rt = .TRUE.,
only_direct_rt = .FALSE.
/""")
    return d


def test_cli_create_grid_and_run(shell_inputs):
    from dartray_tpu import cli

    d = shell_inputs
    rc = cli.main(["create-grid", "magtar", str(d / "input_grid_shell.in")])
    assert rc == 0
    assert (d / "grid_shell.h5").exists()

    # grid sanity: shell density present
    from dartray_tpu.grid.io import read_grid

    grid = read_grid(str(d / "grid_shell.h5"))
    dens = np.asarray(grid.dens_ref)
    assert grid.base == (6, 3)
    assert (dens > 0).sum() > 10

    rc = cli.main(["run", "magtar", str(d / "input_shell.in")])
    assert rc == 0

    # outputs exist with the reference naming scheme
    runs = d / "RUNS"
    assert (runs / "grid_shell_sed.h5").exists()
    assert (runs / "grid_shell_maps.h5").exists()
    assert (runs / "grid_shell_l1.000um_ufield.h5").exists()
    assert (runs / "grid_shell_l0.300um_i_obs.h5").exists()

    import h5py

    with h5py.File(runs / "grid_shell_sed.h5") as f:
        sed = f["sed"][...]
    assert sed.shape == (2, 5)
    assert np.all(sed > 0)
    # shell geometry: edge-on and face-on SEDs of a central source through
    # tau~0.5 shell: attenuated below the unattenuated point-source flux
    from dartray_tpu.models import magtar
    from dartray_tpu.constants import PARSEC

    lum = magtar.source_luminosity(np.array([0.3, 0.5, 0.8, 1.0, 2.0]), 3660.0, 112201.89)[0]
    unatt = lum / (4 * np.pi * (1e4 * PARSEC * 100) ** 2) * 1e23
    assert np.all(sed[0] < unatt * 1.05)
    assert np.all(sed[0] > unatt * np.exp(-2.0))  # not absurdly attenuated

    with h5py.File(runs / "grid_shell_maps.h5") as f:
        maps = f["maps"][...]
    assert maps.shape[0] == 2 and maps.shape[1] == 50
    assert maps.max() > 0


@pytest.fixture(scope="module")
def restart_inputs(shell_inputs):
    """The magtar shell input with checkpoints + restart enabled."""
    d = shell_inputs
    text = (d / "input_shell.in").read_text()
    text = text.replace("label_model_out = 'shell'",
                        "label_model_out = 'shell_rst'")
    text = text.replace(
        "use_dir_out = .TRUE.,",
        "use_dir_out = .TRUE.,\nrestore_file_mpi = .TRUE.,\n"
        "print_output_part1 = .TRUE.,\nprint_output_part2 = .TRUE.,\n"
        "print_scaspe_tot = .TRUE.,\nprint_psel_av = .TRUE.,",
    )
    (d / "input_shell_rst.in").write_text(text)
    return d


def test_cli_restart_resume(restart_inputs):
    """Stage-level restart (check_files io_routines.f90:893 + restore paths
    rt_prepare dartray_hub.f90:403-417): a full run writes part-1/part-2
    checkpoints; a rerun restores part 2, skips precalc+direct, and
    reproduces the final outputs."""
    import h5py
    from dartray_tpu import cli

    d = restart_inputs
    rc = cli.main(["run", "magtar", str(d / "input_shell_rst.in")])
    assert rc == 0
    runs = d / "RUNS"
    # checkpoints written
    assert (runs / "grid_shell_rst_l1.000um_u_fest_part1.h5").exists()
    assert (runs / "grid_shell_rst_l1.000um_ufield_part2.h5").exists()
    assert (runs / "grid_shell_rst_l1.000um_scaspe_part2.h5").exists()
    # telemetry files (write_file_info io:854, psel_av rt:3220)
    assert (runs / "grid_shell_rst_info.dat").exists()
    assert (runs / "grid_shell_rst_psel_av.h5").exists()
    assert (runs / "grid_shell_rst_lum_lost.h5").exists()
    with h5py.File(runs / "grid_shell_rst_sed.h5") as f:
        sed1 = f["sed"][...]

    # remove the final outputs but keep the part-2 checkpoint: the rerun
    # must restore and reproduce the SED without redoing direct light
    (runs / "grid_shell_rst_sed.h5").unlink()
    rc = cli.main(["run", "magtar", str(d / "input_shell_rst.in")])
    assert rc == 0
    with h5py.File(runs / "grid_shell_rst_sed.h5") as f:
        sed2 = f["sed"][...]
    np.testing.assert_allclose(sed2, sed1, rtol=1e-10)


def test_cli_sed_and_iobs_algorithms(restart_inputs):
    """'sed' and 'i_obs' rt_algorithms recompute products from saved files
    (dartray_sed dartray_hub.f90:171, dartray_i_obs :125)."""
    import h5py
    from dartray_tpu import cli

    d = restart_inputs
    runs = d / "RUNS"
    with h5py.File(runs / "grid_shell_rst_sed.h5") as f:
        sed_run = f["sed"][...]

    text = (d / "input_shell_rst.in").read_text()
    (d / "input_shell_sed.in").write_text(
        text.replace("rt_algorithm = 'main',", "rt_algorithm = 'sed',")
    )
    (runs / "grid_shell_rst_sed.h5").unlink()
    rc = cli.main(["run", "magtar", str(d / "input_shell_sed.in")])
    assert rc == 0
    with h5py.File(runs / "grid_shell_rst_sed.h5") as f:
        sed_re = f["sed"][...]
    np.testing.assert_allclose(sed_re, sed_run, rtol=1e-10)

    # i_obs recompute from scaspe_tot, new output label
    (d / "input_shell_iobs.in").write_text(
        text.replace("rt_algorithm = 'main',", "rt_algorithm = 'i_obs',")
    )
    rc = cli.main(["run", "magtar", str(d / "input_shell_iobs.in")])
    assert rc == 0
    assert (runs / "grid_shell_rst_i_obs_l1.000um_i_obs.h5").exists()
    with h5py.File(runs / "grid_shell_rst_i_obs_l1.000um_i_obs.h5") as f:
        iobs_re = f["i_obs"][...]
    with h5py.File(runs / "grid_shell_rst_l1.000um_i_obs.h5") as f:
        iobs_run = f["i_obs"][...]
    # direct + scattered toward the same directions: the recompute reads the
    # scattered launch luminosity from the HEALPix pixel containing each
    # direction (assign_src_lum) instead of the exact appended observer
    # columns of the main run, so per-cell values carry the angular
    # discretization of kp_sca_max=0 (12 pixels); totals must still agree
    tot_re = iobs_re.sum(axis=0)
    tot_run = iobs_run.sum(axis=0)
    np.testing.assert_allclose(tot_re, tot_run, rtol=0.3)
    assert (np.abs(iobs_re - iobs_run) > 0).any()  # scattered part present


def test_cli_maps_in(restart_inputs):
    """print_maps_in writes internal-observer HEALPix maps
    (map_in_projection, visual_routines.f90:917-1076)."""
    import h5py
    from dartray_tpu import cli

    d = restart_inputs
    text = (d / "input_shell_rst.in").read_text()
    text = text.replace("label_model_out = 'shell_rst'",
                        "label_model_out = 'shell_min'")
    text = text.replace("print_maps = .TRUE.,",
                        "print_maps = .TRUE.,\nprint_maps_in = .TRUE.,")
    (d / "input_shell_min.in").write_text(text)
    rc = cli.main(["run", "magtar", str(d / "input_shell_min.in")])
    assert rc == 0
    runs = d / "RUNS"
    assert (runs / "grid_shell_min_maps_in.h5").exists()
    with h5py.File(runs / "grid_shell_min_maps_in.h5") as f:
        maps_in = f["maps"][...]
    # (nobs_in, npix=12*4^kp_maps, L)
    assert maps_in.shape[0] == 1 and maps_in.shape[1] == 12 * 4**3
    assert maps_in.max() > 0
