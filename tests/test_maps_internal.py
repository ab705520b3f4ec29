"""Internal-observer HEALPix map tests."""
import numpy as np
import pytest

from dartray_tpu.grid import build_grid
from dartray_tpu.vis import maps_internal as MI
from dartray_tpu import healpix as hp


@pytest.fixture(scope="module")
def grid():
    def dens_fn(centers, csize):
        return np.zeros(len(centers)), np.zeros(len(centers))

    def subdiv(centers, csize, level, dens, ds):
        return np.zeros(len(centers), dtype=bool)

    return build_grid(dens_fn, subdiv, base=(6, 2), max_lvl=2, min_lvl=1,
                      modelsize=12.0, max_ncell=10_000)


def test_flux_conservation_far_cell(grid):
    """A single distant luminous cell: total map power = i_obs * omega_cell
    regardless of which case (1 or 3) applies."""
    from dartray_tpu.grid import point_to_cell

    kp = 3
    npix = hp.nside2npix(2**kp)
    omega_hp = 4 * np.pi / npix
    # distant cell -> case 1 (single pixel)
    cell_far, _ = point_to_cell(grid, np.array([[5.0, 5.0, 5.0]]))
    cell_far = int(np.asarray(cell_far)[0])
    i_obs_in = np.zeros((grid.n_cells, 1))
    i_obs_in[cell_far, 0] = 2.5
    obs = np.array([0.2, 0.1, 0.0])
    m = MI.make_map_in(grid, i_obs_in, obs, kp)
    cc = np.asarray(grid.ccoord)[cell_far]
    cs = float(np.asarray(grid.csize)[cell_far])
    omega_cell = cs**2 / np.sum((cc - obs) ** 2)
    np.testing.assert_allclose(m.sum() * omega_hp, 2.5 * omega_cell, rtol=1e-10)
    # the lit pixel is the one toward the cell
    ip = int(np.asarray(hp.vec2pix_nest(2**kp, cc - obs)))
    assert m[ip, 0] > 0


def test_flux_conservation_near_cell(grid):
    """A nearby big cell (case 3): the distributed flux sums to
    i_obs * omega_cell and covers multiple pixels around the direction."""
    from dartray_tpu.grid import point_to_cell

    kp = 3
    npix = hp.nside2npix(2**kp)
    omega_hp = 4 * np.pi / npix
    cell, _ = point_to_cell(grid, np.array([[2.0, 0.0, 0.0]]))
    cell = int(np.asarray(cell)[0])
    i_obs_in = np.zeros((grid.n_cells, 1))
    i_obs_in[cell, 0] = 1.0
    obs = np.array([0.1, 0.05, 0.02])  # close: cell subtends many pixels
    m = MI.make_map_in(grid, i_obs_in, obs, kp)
    cc = np.asarray(grid.ccoord)[cell]
    cs = float(np.asarray(grid.csize)[cell])
    omega_cell = cs**2 / np.sum((cc - obs) ** 2)
    assert omega_cell / omega_hp > 3  # really case 3
    np.testing.assert_allclose(m.sum() * omega_hp, omega_cell, rtol=1e-10)
    assert (m[:, 0] > 0).sum() >= 3


def test_observer_inside_cell(grid):
    """Observer inside the emitting cell: uniform I/2 over the sphere."""
    from dartray_tpu.grid import point_to_cell

    kp = 2
    cell, _ = point_to_cell(grid, np.array([[0.3, 0.3, 0.3]]))
    cell = int(np.asarray(cell)[0])
    i_obs_in = np.zeros((grid.n_cells, 1))
    i_obs_in[cell, 0] = 4.0
    obs = np.asarray(np.asarray(grid.ccoord)[cell]) + 0.01
    m = MI.make_map_in(grid, i_obs_in, obs, kp)
    np.testing.assert_allclose(m, 2.0, rtol=1e-12)
