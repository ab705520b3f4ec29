"""2D/axisymmetric RT mode: octant symmetry exploitation (C7).

Rebuild of the reference's rt_loop_2D machinery (rt_routines.f90:1061-1140),
check_grid_symmetry (:3283), find_linked_cells (:3364), fix_symmetry and its
parts (:3605-4080), calc_scaspe_indices (:4083) and check_2d_src (:3581).

For a model symmetric under the three coordinate-plane reflections (any
axisymmetric model is), only sources in the closed (+,+,+) octant need to be
ray-traced:

1. pass A: sources with strictly positive center coordinates march normally;
2. ``fix_symmetry``: for every closed-octant cell c, the energy it *would*
   have received from the 7 mirrored source octants equals the energy its 7
   mirror cells received from the pass-A sources, so
   ``u[c] += sum_m u[mirror_m(c)]`` and the symmetrized value is broadcast
   back to the mirrors (duplicate links of on-plane cells double-count
   exactly as required — see fix_symmetry_part1, rt:3632-3662);
   the scattering source function transforms the same way with the pixel
   axis permuted through the reflected HEALPix directions;
3. pass B: on-axis sources (a center coordinate exactly 0) march normally
   with no symmetrization (their own emission pattern is already symmetric).

Up to ~8x less ray tracing (rt_routines.f90:41).  Following the reference's
dartray_main_2D (dartray_hub.f90:70-120, rt_loop_iobs calls disabled), the
scaspe arrays carry no appended observer columns in this mode; observer
intensities are computed from the HEALPix pixels of the symmetrized
scaspe_tot (the 'i_obs' algorithm path).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from .. import healpix as hp
from ..grid.octree import Grid, np_point_to_cell

# reflection sign patterns, in the reference's link_list order
# (find_linked_cells: X, Y, Z, XY, XZ, YZ, XYZ — rt_routines.f90:3364-3560)
_SIGNS = np.array(
    [
        [-1, 1, 1],
        [1, -1, 1],
        [1, 1, -1],
        [-1, -1, 1],
        [-1, 1, -1],
        [1, -1, -1],
        [-1, -1, -1],
    ],
    dtype=np.float64,
)


def check_2d_src(p_src_pos) -> None:
    """2D mode allows at most one point source, at the origin
    (check_2d_src, rt_routines.f90:3581-3601)."""
    if p_src_pos is None or len(p_src_pos) == 0:
        return
    pos = np.atleast_2d(np.asarray(p_src_pos))
    if len(pos) > 1 or np.any(pos[0] != 0):
        raise ValueError(
            "only ONE point source positioned at the origin is allowed in 2D mode"
        )


@dataclasses.dataclass
class SymmetryMaps:
    """Precomputed symmetry bookkeeping for one grid."""

    primary: np.ndarray  # (P,) leaf cells with all center coords >= 0
    links: np.ndarray  # (P, 7) mirror cell of each primary per reflection
    src_octant: np.ndarray  # (S,) leaf cells with all coords > 0 (pass A sources)
    src_axis: np.ndarray  # (A,) leaf cells with a zero coord (pass B sources)


def build_symmetry(grid: Grid) -> SymmetryMaps:
    """Locate every cell's mirror cells and verify the grid is symmetric
    (find_linked_cells + check_grid_symmetry, rt_routines.f90:3283-3560).

    Raises ValueError when a mirrored center does not land on a leaf cell at
    the mirrored position (grid not reflection-symmetric).
    """
    cchild = np.asarray(grid.cchild)
    ccoord = np.asarray(grid.ccoord, dtype=np.float64)
    leaf = cchild == -1
    pos_all = np.all(ccoord >= 0, axis=1)
    primary = np.flatnonzero(leaf & pos_all)
    src_octant = np.flatnonzero(leaf & np.all(ccoord > 0, axis=1))
    src_axis = np.flatnonzero(leaf & pos_all & np.any(ccoord == 0, axis=1))

    pc = ccoord[primary]  # (P, 3)
    links = np.empty((len(primary), 7), dtype=np.int64)
    for m in range(7):
        mirrored = pc * _SIGNS[m][None, :]
        cc, clvl = np_point_to_cell(
            cchild, grid.base, grid.max_lvl, grid.modelsize, mirrored
        )
        # symmetry check: the mirror must be a leaf at the mirrored center
        ok = (
            (np.asarray(grid.lvl)[cc] == np.asarray(grid.lvl)[primary])
            & np.all(np.abs(ccoord[cc] - mirrored) <= 1e-9 * grid.modelsize, axis=1)
        )
        if not np.all(ok):
            bad = primary[~ok][:5]
            raise ValueError(
                f"grid not symmetric under reflection {m} (e.g. cells {bad})"
            )
        dref = np.asarray(grid.dens_ref)
        if not np.allclose(dref[cc], dref[primary], rtol=1e-12, atol=0):
            raise ValueError(f"dust density not symmetric under reflection {m}")
        links[:, m] = cc
    return SymmetryMaps(
        primary=primary, links=links, src_octant=src_octant, src_axis=src_axis
    )


def scaspe_perms(scfg) -> list:
    """Per-bucket pixel permutations for the 7 reflections
    (calc_scaspe_indices, rt_routines.f90:4083-4250).

    perm[m][p] = HEALPix pixel whose direction is the reflection-m image of
    pixel p's direction; scaspe row of a mirror cell = primary row indexed by
    perm[m].  None for isotropic (single-pixel) buckets.  HEALPix NESTED is
    exactly symmetric under all three coordinate reflections, so the map is
    a true permutation (verified by assertion).
    """
    out = []
    for b in scfg.buckets:
        if b.kp < 0:
            out.append(None)
            continue
        nside = b.nside
        th, ph = hp.np_pix2ang_nest(nside, np.arange(b.npix_hp))
        d = np.stack(
            [np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph), np.cos(th)], axis=-1
        )
        perms = np.empty((7, b.npix_hp), dtype=np.int64)
        for m in range(7):
            dm = d * _SIGNS[m][None, :]
            thm = np.arccos(np.clip(dm[:, 2], -1, 1))
            phm = np.arctan2(dm[:, 1], dm[:, 0]) % (2 * np.pi)
            pm = hp.np_ang2pix_nest(nside, thm, phm)
            # exactness check: each mirrored center must be a pixel center
            thc, phc = hp.np_pix2ang_nest(nside, pm)
            dc = np.stack(
                [np.sin(thc) * np.cos(phc), np.sin(thc) * np.sin(phc), np.cos(thc)],
                axis=-1,
            )
            assert np.all(np.sum(dm * dc, axis=1) > 1.0 - 1e-9), (
                "HEALPix reflection symmetry violated"
            )
            assert len(np.unique(pm)) == b.npix_hp, "not a permutation"
            perms[m] = pm
        out.append(perms)
    return out


def fix_symmetry_u(u, sym: SymmetryMaps, base=None):
    """Symmetrize a radiation-field array after pass A
    (fix_symmetry_part1/2/3, rt_routines.f90:3632-3662,3700-3710).

    With `base` (the field before the pass), only the pass's delta is
    symmetrized (fix_symmetry_part3 semantics for scattering/dust
    iterations whose accumulators start non-zero)."""
    u = np.asarray(u)
    d = u if base is None else u - np.asarray(base)
    out = d.copy()
    p = sym.primary
    tot = d[p] + d[sym.links].sum(axis=1)  # (P, L)
    out[p] = tot
    for m in range(7):
        out[sym.links[:, m]] = tot
    if base is not None:
        out = out + np.asarray(base)
    return out


class DeviceSymmetry:
    """Device-resident symmetrization (fix_symmetry_part3,
    rt_routines.f90:3802-4080): the per-pass numpy round-trip of
    fix_symmetry_u / fix_symmetry_scaspe becomes jitted gathers +
    index-sets, so 2D scattering iterations never copy the field or the
    scaspe to the host."""

    def __init__(self, sym: SymmetryMaps, perms=None):
        import jax
        import jax.numpy as jnp

        p = jnp.asarray(sym.primary, dtype=jnp.int32)
        links = jnp.asarray(sym.links, dtype=jnp.int32)  # (P, 7)
        perms_d = None
        if perms is not None:
            perms_d = [
                None if pm is None else jnp.asarray(pm, dtype=jnp.int32)
                for pm in perms
            ]

        @jax.jit
        def _fix_u(u, base):
            d = u - base
            tot = d[p] + jnp.sum(d[links], axis=1)
            out = d.at[p].set(tot)
            for m in range(7):
                out = out.at[links[:, m]].set(tot)
            return out + base

        self._fix_u = _fix_u

        @jax.jit
        def _fix_scaspe(scaspe, scaspe_base):
            outs = []
            for k, (s_new, s_base) in enumerate(zip(scaspe, scaspe_base)):
                s = s_new - s_base
                pm = perms_d[k] if perms_d is not None else None
                tot = s[p]
                if pm is None:
                    for m in range(7):
                        tot = tot + s[links[:, m]]
                    out = s.at[p].set(tot)
                    for m in range(7):
                        out = out.at[links[:, m]].set(tot)
                else:
                    for m in range(7):
                        tot = tot + s[links[:, m]][:, pm[m], :]
                    out = s.at[p].set(tot)
                    for m in range(7):
                        out = out.at[links[:, m]].set(tot[:, pm[m], :])
                outs.append(out + s_base)
            return tuple(outs)

        self._fix_scaspe = _fix_scaspe

    def fix_u(self, u, base):
        return self._fix_u(u, base)

    def fix_scaspe_delta(self, scaspe_new, scaspe_base):
        return self._fix_scaspe(tuple(scaspe_new), tuple(scaspe_base))


def dev_ops(sym: SymmetryMaps, perms=None) -> DeviceSymmetry:
    # cache keyed on the perms CONTENT: a cache hit keyed on `sym` alone
    # would silently reuse the first stage's pixel permutations for a
    # different ScaspeConfig (e.g. the dust range against the same sym)
    key = (
        None
        if perms is None
        else tuple(
            None if pm is None else (pm.shape, pm.tobytes()) for pm in perms
        )
    )
    hit = getattr(sym, "_dev_ops", None)
    if hit is not None and hit[0] == key:
        return hit[1]
    ops = DeviceSymmetry(sym, perms)
    object.__setattr__(sym, "_dev_ops", (key, ops))
    return ops


def fix_symmetry_scaspe(scaspe, scfg, perms, sym: SymmetryMaps):
    """Symmetrize the per-bucket scattering source function after pass A
    (fix_symmetry_part2 scaspe block, rt_routines.f90:3711-3795).

    The mirror-m image of a primary's scaspe row is the row with the pixel
    axis permuted by perms[k][m]; the primary accumulates the permuted rows
    of its mirrors, and the symmetrized row is broadcast back (permuted
    forward).  Accumulators start from zero each pass, so no base handling
    is needed."""
    p = sym.primary
    out = []
    for s, pm in zip(scaspe, perms):
        s = np.array(s, copy=True)
        tot = s[p].copy()  # (P, npix, Lk)
        if pm is None:
            for m in range(7):
                tot += s[sym.links[:, m]]
            for m in range(7):
                s[sym.links[:, m]] = tot
        else:
            for m in range(7):
                tot += s[sym.links[:, m]][:, pm[m], :]
            for m in range(7):
                s[sym.links[:, m]] = tot[:, pm[m], :]
        s[p] = tot
        out.append(s)
    return tuple(out)
