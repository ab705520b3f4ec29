"""HEALPix NESTED-scheme unit tests.

Validates the vectorized implementation against the defining properties of
the reference implementation (healpix_routines.f90:30,238,416):
round-trips, nesting hierarchy, solid-angle uniformity, known pixel centers.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dartray_tpu import healpix as hp


NSIDES = [1, 2, 4, 8, 16, 64, 256]


@pytest.mark.parametrize("nside", NSIDES)
def test_roundtrip_pix2ang_ang2pix(nside):
    npix = hp.nside2npix(nside)
    pix = jnp.arange(npix)
    theta, phi = hp.pix2ang_nest(nside, pix)
    pix2 = hp.ang2pix_nest(nside, theta, phi)
    np.testing.assert_array_equal(np.asarray(pix2), np.asarray(pix))


@pytest.mark.parametrize("nside", [1, 2, 8, 32])
def test_random_directions_land_in_valid_pixels(nside):
    rng = np.random.default_rng(42)
    theta = np.arccos(rng.uniform(-1, 1, 5000))
    phi = rng.uniform(0, 2 * np.pi, 5000)
    pix = np.asarray(hp.ang2pix_nest(nside, theta, phi))
    assert pix.min() >= 0
    assert pix.max() < hp.nside2npix(nside)
    # pixel center must be within ~2 pixel radii of the input direction
    tc, pc = hp.pix2ang_nest(nside, pix)
    v1 = np.asarray(hp.ang2vec(theta, phi))
    v2 = np.asarray(hp.ang2vec(tc, pc))
    cosang = np.sum(v1 * v2, axis=-1)
    max_rad = 2.5 * np.sqrt(4 * np.pi / hp.nside2npix(nside))
    assert np.all(cosang > np.cos(max_rad))


def test_nested_hierarchy():
    """Child pixels at 2*nside live inside the parent pixel: pix2ang of child
    ipix*4+k must map back to parent ipix at the lower resolution."""
    for nside in [2, 4, 16]:
        npix = hp.nside2npix(nside)
        pix = np.arange(npix)
        for k in range(4):
            child = pix * 4 + k
            theta, phi = hp.pix2ang_nest(2 * nside, child)
            parent = np.asarray(hp.ang2pix_nest(nside, theta, phi))
            np.testing.assert_array_equal(parent, pix)


def test_equal_area_statistics():
    """NESTED pixels are equal-area: random uniform points on the sphere fall
    in each pixel with equal probability."""
    nside = 4
    npix = hp.nside2npix(nside)
    rng = np.random.default_rng(0)
    n = 200000
    theta = np.arccos(rng.uniform(-1, 1, n))
    phi = rng.uniform(0, 2 * np.pi, n)
    pix = np.asarray(hp.ang2pix_nest(nside, theta, phi))
    counts = np.bincount(pix, minlength=npix)
    expected = n / npix
    assert np.all(np.abs(counts - expected) < 6 * np.sqrt(expected))


def test_nside1_centers():
    """For nside=1 the 4 equatorial faces (4..7) have centers at z=0."""
    theta, phi = hp.pix2ang_nest(1, jnp.arange(12))
    z = np.cos(np.asarray(theta))
    np.testing.assert_allclose(z[4:8], 0.0, atol=1e-12)
    np.testing.assert_allclose(z[0:4], 2.0 / 3.0, atol=1e-12)
    np.testing.assert_allclose(z[8:12], -2.0 / 3.0, atol=1e-12)
    # polar face centers at phi = 45, 135, 225, 315 deg
    np.testing.assert_allclose(
        np.asarray(phi[0:4]), np.pi / 4 + np.arange(4) * np.pi / 2, atol=1e-12
    )


@pytest.mark.parametrize("nside", [2, 4, 16])
def test_neighbours_cover_adjacency(nside):
    """Every pixel has 7 or 8 distinct neighbours, and neighbour relation is
    symmetric."""
    npix = hp.nside2npix(nside)
    nb = np.asarray(hp.neighbours_nest(nside, jnp.arange(npix)))
    neigh_sets = [set(int(x) for x in row if x >= 0) for row in nb]
    for p, s in enumerate(neigh_sets):
        assert 7 <= len(s) <= 8, f"pixel {p} has {len(s)} neighbours"
        for q in s:
            assert p in neigh_sets[q], f"asymmetric neighbour {p}<->{q}"


def test_pix2vec_unit_norm():
    v = np.asarray(hp.pix2vec_nest(8, jnp.arange(hp.nside2npix(8))))
    np.testing.assert_allclose(np.sum(v**2, axis=-1), 1.0, atol=1e-12)
