"""Dust model: opacities, albedo, scattering asymmetry per wavelength.

Rebuild of the reference's dust-model preparation (prepare_dust_model,
sed_routines.f90:1081-1113):

* grain-level path: load Q_abs/Q_sca/Q_ext/g tables for up to 4 species
  (load_opacity_param sed:1117), size distributions (load_fa_arr sed:1346),
  interpolate Q to the distribution sizes (interpolate_q_grain_fa sed:1440)
  and integrate to per-grain average cross sections (calc_total_opacity
  sed:1761-1819);

* effective path: read size-integrated opacities from a table
  (read_av_opacities sed:1822-1998), as used by the TRUST I benchmark
  (ZDA_BARE_GR_S_Effective.dat).

All cross sections are stored in m^2 per "average grain"; the grid's
``dens`` arrays hold extinction coefficient [1/length] at lambda_ref, and
per-wavelength extinction is dens * kext(lambda)/kext_ref (scale_dens_arr,
rt_routines.f90:5018-5071).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np


@dataclasses.dataclass
class DustModel:
    lambda_um: np.ndarray  # (L,) the RT wavelength grid
    kabs: np.ndarray  # (L,) absorption cross section per grain [m^2]
    ksca: np.ndarray  # (L,)
    kext: np.ndarray  # (L,)
    gsca: np.ndarray  # (L,) Henyey-Greenstein asymmetry
    kext_ref: float  # [m^2] at lambda_ref
    tot_n_dust: float = 0.0  # grains per H
    tau_nh_ref: float = 0.0  # [m^2/H]
    # grain-level data (None for effective-only models); needed by the
    # 'equ'/'sto' dust-emission modes
    dust_size_fa: Optional[np.ndarray] = None  # (C, A) grain sizes [m]
    dust_fa: Optional[np.ndarray] = None  # (C, A) size distribution [1/m/H]
    delta_dust_size: Optional[np.ndarray] = None  # (C, A) bin widths [m]
    qabs_fa: Optional[np.ndarray] = None  # (C, A, L)
    qsca_fa: Optional[np.ndarray] = None
    qext_fa: Optional[np.ndarray] = None
    gsca_fa: Optional[np.ndarray] = None
    n_dust_size: Optional[np.ndarray] = None  # (C,) valid sizes per species

    @property
    def albedo(self) -> np.ndarray:
        """ksca_arr_norm (sed_routines.f90:1099)."""
        return self.ksca / self.kext


# ---------------------------------------------------------------------------
# effective (size-integrated) opacity table
# ---------------------------------------------------------------------------


def read_av_opacities_table(path: str):
    """Parse an effective-opacity table (TRUST format): 4 header lines then
    columns lambda[um] Cabs[cm^2] Csca[cm^2] tau/N_H a g
    (read_av_opacities, sed_routines.f90:1839-1868)."""
    data = np.loadtxt(path, skiprows=4)
    lam = data[:, 0]
    if np.any(np.diff(lam) < 0):
        raise ValueError("lambda not ascending in av opacities table")
    kabs = data[:, 1] * 1e-4  # cm^2 -> m^2
    ksca = data[:, 2] * 1e-4
    tau_nh = data[:, 3] * 1e-4
    g = data[:, 5]
    return lam, kabs, ksca, tau_nh, g


def _interp_right(x, xp, fp):
    """The reference's interpolation: for each target, use the first table
    point >= target and its predecessor (linear).  Identical to np.interp
    for in-range targets."""
    return np.interp(x, xp, fp)


def load_effective_dust_model(path: str, lambda_um, lambda_ref: float) -> DustModel:
    lam_t, kabs_t, ksca_t, tau_nh_t, g_t = read_av_opacities_table(path)
    kext_t = kabs_t + ksca_t
    lam = np.asarray(lambda_um, dtype=np.float64)
    if lam.min() < lam_t[0] or lam.max() > lam_t[-1]:
        raise ValueError("RT wavelength grid outside opacity table range")
    kabs = _interp_right(lam, lam_t, kabs_t)
    ksca = _interp_right(lam, lam_t, ksca_t)
    kext = _interp_right(lam, lam_t, kext_t)
    gsca = _interp_right(lam, lam_t, g_t)
    kext_ref = float(_interp_right(np.asarray([lambda_ref]), lam_t, kext_t)[0])
    tau_nh_ref = float(_interp_right(np.asarray([lambda_ref]), lam_t, tau_nh_t)[0])
    # tot_n_dust inferred from tau/N_H = kext * n_dust
    with np.errstate(divide="ignore", invalid="ignore"):
        tot_n_dust = float(tau_nh_ref / kext_ref) if kext_ref > 0 else 0.0
    return DustModel(
        lambda_um=lam, kabs=kabs, ksca=ksca, kext=kext, gsca=gsca,
        kext_ref=kext_ref, tot_n_dust=tot_n_dust, tau_nh_ref=tau_nh_ref,
    )


# ---------------------------------------------------------------------------
# grain-level tables
# ---------------------------------------------------------------------------

_TRUST_FILES = dict(
    q=("Gra_121_1201.dat", "suvSil_121_1201.dat", "PAH_28_1201_neu.dat"),
    nsize=(121, 121, 28),
    nwave=1201,
    fa=(
        "ZDA_BARE_GR_S_SzDist_Gra.dat",
        "ZDA_BARE_GR_S_SzDist_Sil.dat",
        "ZDA_BARE_GR_S_SzDist_PAH.dat",
    ),
)
_DRAINELI_FILES = dict(
    q=("Gra01", "Si01", "PAHneu06", "PAHion06"),
    nsize=(81, 81, 30, 30),
    nwave=1201,
    fa=(
        "DraineLi06_SzDist_Gra01.dat",
        "DraineLi06_SzDist_Si01.dat",
        "DraineLi06_SzDist_PAHneu06.dat",
        "DraineLi06_SzDist_PAHion06.dat",
    ),
)


def read_q_table(path: str, n_size: int, n_wave: int, n_head: int = 15):
    """Parse a single-species Q table (load_opacity_param,
    sed_routines.f90:1214-1263): per size block — size line, separator line,
    n_wave rows of (x, lambda, Qabs, Qsca, Qext, g), trailing line."""
    sizes = np.empty(n_size)
    lam = None
    qabs = np.empty((n_size, n_wave))
    qsca = np.empty((n_size, n_wave))
    qext = np.empty((n_size, n_wave))
    gsca = np.empty((n_size, n_wave))
    with open(path) as f:
        lines = f.readlines()
    i = n_head
    for s in range(n_size):
        sizes[s] = float(lines[i].split()[0])
        i += 2
        block = np.loadtxt(lines[i : i + n_wave])
        if lam is None:
            lam = block[:, 1]
        qabs[s] = block[:, 2]
        qsca[s] = block[:, 3]
        qext[s] = block[:, 4]
        gsca[s] = block[:, 5]
        i += n_wave + 1
    return sizes * 1e-6, lam * 1e-6, qabs, qsca, qext, gsca  # SI


def read_fa_table(path: str, n_head: int = 4):
    data = np.loadtxt(path, skiprows=n_head)
    a = data[:, 0] * 1e-6  # um -> m
    fa = data[:, 1] * 1e2  # cm^-1 H^-1 -> m^-1 H^-1
    return a, fa


def load_grain_dust_model(
    opacity_dir: str, lambda_um, lambda_ref: float, model: str = "TRUST"
) -> DustModel:
    """Build a DustModel by integrating single-grain opacities over the size
    distributions (the reference's default path)."""
    spec = _TRUST_FILES if model == "TRUST" else _DRAINELI_FILES
    sub = "TRUST" if model == "TRUST" else "DraineLi06"
    lam = np.asarray(lambda_um, dtype=np.float64)
    lam_si = lam * 1e-6
    lref_si = lambda_ref * 1e-6
    L = len(lam)
    ncomp = len(spec["q"])

    # per-species data, interpolated to (distribution sizes) x (RT lambdas)
    size_list, fa_list, dsize_list = [], [], []
    qabs_l, qsca_l, qext_l, gsca_l = [], [], [], []
    qext_ref_l = []
    for c in range(ncomp):
        qpath = os.path.join(opacity_dir, sub, spec["q"][c])
        fpath = os.path.join(opacity_dir, sub, spec["fa"][c])
        sizes, tlam, qa, qs, qe, gg = read_q_table(qpath, spec["nsize"][c], spec["nwave"])
        a_fa, fa = read_fa_table(fpath)
        # interpolate in lambda (linear), then in size (linear)
        def interp2(q):
            # q: (n_size_table, n_wave) -> (n_fa, L)
            ql = np.empty((len(sizes), L))
            for s in range(len(sizes)):
                ql[s] = np.interp(lam_si, tlam, q[s])
            out = np.empty((len(a_fa), L))
            for il in range(L):
                out[:, il] = np.interp(a_fa, sizes, ql[:, il])
            return out

        def interp_ref(q):
            qr = np.array([np.interp(lref_si, tlam, q[s]) for s in range(len(sizes))])
            return np.interp(a_fa, sizes, qr)

        qabs_l.append(interp2(qa))
        qsca_l.append(interp2(qs))
        qext_l.append(interp2(qe))
        gsca_l.append(interp2(gg))
        qext_ref_l.append(interp_ref(qe))
        # arithmetic-mid size bins (interpolate_q_grain_fa sed:1545-1562)
        mid = (a_fa[1:] + a_fa[:-1]) / 2.0
        d = np.empty_like(a_fa)
        d[1:-1] = mid[1:] - mid[:-1]
        d[0] = mid[0] - a_fa[0]
        d[-1] = a_fa[-1] - mid[-1]
        size_list.append(a_fa)
        fa_list.append(fa)
        dsize_list.append(d)

    # integrate (calc_total_opacity sed:1780-1807)
    kabs = np.zeros(L)
    ksca = np.zeros(L)
    kext = np.zeros(L)
    gnum = np.zeros(L)
    tau_nh_ref = 0.0
    tot_n_dust = 0.0
    for c in range(ncomp):
        a, fa, da = size_list[c], fa_list[c], dsize_list[c]
        w = np.pi * a**2 * fa * da  # (A,)
        tot_n_dust += np.sum(fa * da)
        kabs += qabs_l[c].T @ w
        ksca += qsca_l[c].T @ w
        kext += qext_l[c].T @ w
        gnum += (qsca_l[c] * gsca_l[c]).T @ w
        tau_nh_ref += float(np.sum(w * qext_ref_l[c]))

    gsca = gnum / ksca
    kabs /= tot_n_dust
    ksca /= tot_n_dust
    kext /= tot_n_dust
    kext_ref = tau_nh_ref / tot_n_dust

    A = max(len(s) for s in size_list)

    def pad2(lst):
        out = np.zeros((ncomp, A) + lst[0].shape[1:])
        for c, arr in enumerate(lst):
            out[c, : arr.shape[0]] = arr
        return out

    return DustModel(
        lambda_um=lam, kabs=kabs, ksca=ksca, kext=kext, gsca=gsca,
        kext_ref=kext_ref, tot_n_dust=tot_n_dust, tau_nh_ref=tau_nh_ref,
        dust_size_fa=pad2([s[:, None] for s in size_list])[..., 0],
        dust_fa=pad2([s[:, None] for s in fa_list])[..., 0],
        delta_dust_size=pad2([s[:, None] for s in dsize_list])[..., 0],
        qabs_fa=pad2(qabs_l),
        qsca_fa=pad2(qsca_l),
        qext_fa=pad2(qext_l),
        gsca_fa=pad2(gsca_l),
        n_dust_size=np.asarray([len(s) for s in size_list]),
    )


# ---------------------------------------------------------------------------
# calorimetry (grain enthalpy / heat capacity) tables — for 'sto'/'sto_lib'
# ---------------------------------------------------------------------------

N_TEMP_PLANCK = 100  # smooth_grid_routines.f90:250


@dataclasses.dataclass
class Calorimetry:
    """Grain enthalpy/heat-capacity tables (load_cT_hT_tables,
    sed_routines.f90:1571-1660) plus the Planck-averaged Qabs table
    (calc_planck_av_qabs, sed:2033-2077)."""

    cal_temp: np.ndarray  # (2, NT) [K]; row 0 graphitic, row 1 silicate
    grain_enthalpy: np.ndarray  # (2, NT) [J/m^3]
    grain_heat_capacity: np.ndarray  # (2, NT) [J/m^3/K]
    iq_ct_table: np.ndarray  # (C,) calorimetry row per dust species
    t_arr_planck: Optional[np.ndarray] = None  # (100,) [K] log grid 1..2500
    qabs_planck: Optional[np.ndarray] = None  # (C, A, 100) <Qabs>_Planck(T)


def load_calorimetry(opacity_dir: str, n_comp: int) -> Calorimetry:
    """Read the TRUST graphitic + silicate calorimetry tables.

    Format (load_cT_hT_tables, sed:1631-1650): 3 header lines, one density
    line [g/cm^3], then NT rows of (T [K], enthalpy [erg/g], C_T [erg/g/K]).
    Values are converted to per-volume SI (J/m^3[, /K]).  Species->table
    mapping: Gra/PAH0/PAH+ -> graphitic, Sil -> silicate (sed:1596-1607).
    """
    files = ("Graphitic_Calorimetry_1000.dat", "Silicate_Calorimetry_1000.dat")
    temps, enth, heat = [], [], []
    for fn in files:
        path = os.path.join(opacity_dir, "TRUST", fn)
        with open(path) as f:
            lines = f.readlines()
        rho = float(lines[3].split()[0])  # g/cm^3
        data = np.loadtxt(lines[4:])
        temps.append(data[:, 0])
        enth.append(data[:, 1] * rho * 1e-1)  # erg/g -> J/m^3
        heat.append(data[:, 2] * rho * 1e-1)  # erg/g/K -> J/m^3/K
    # species order in this framework: (Gra, Sil, PAH0[, PAH+])
    iq = np.array([0, 1, 0, 0][:n_comp])
    return Calorimetry(
        cal_temp=np.stack(temps),
        grain_enthalpy=np.stack(enth),
        grain_heat_capacity=np.stack(heat),
        iq_ct_table=iq,
    )


def add_planck_avg_qabs(cal: Calorimetry, dust: DustModel, lambda_si,
                        delta_lambda_bin) -> Calorimetry:
    """Planck-averaged Qabs per (species, size) on a 100-point log T grid
    1..2500 K (calc_planck_av_qabs, sed_routines.f90:2033-2077):
    <Qabs>(T) = sum(Qabs * B(T) * dl) / sum(B(T) * dl) over the full RT
    wavelength grid."""
    from .dust_emission import bplanck

    t = np.logspace(0.0, np.log10(2500.0), N_TEMP_PLANCK)
    B = np.asarray(bplanck(t[:, None], np.asarray(lambda_si)[None, :]))  # (T, L)
    w = B * np.asarray(delta_lambda_bin)[None, :]
    den = w.sum(axis=1)  # (T,)
    num = np.einsum("cal,tl->cat", dust.qabs_fa, w)
    cal.t_arr_planck = t
    cal.qabs_planck = num / den[None, None, :]
    return cal


def prepare_dust_model(cfg, lambda_um, opacity_dir: str = None) -> DustModel:
    """Orchestrates dust-model preparation per the config.

    Follows prepare_dust_model (sed_routines.f90:1081-1113).  If the grain
    tables are unavailable (the reference repository ships only the PAH
    table + the effective table for TRUST), falls back to the effective
    table when input_av_opacities is set.
    """
    lam = np.asarray(lambda_um, dtype=np.float64)
    grain = None
    if opacity_dir is not None:
        sub = "TRUST" if cfg.dust_model == "TRUST" else "DraineLi06"
        spec = _TRUST_FILES if cfg.dust_model == "TRUST" else _DRAINELI_FILES
        have_all = all(
            os.path.exists(os.path.join(opacity_dir, sub, q)) for q in spec["q"]
        )
        if have_all:
            grain = load_grain_dust_model(opacity_dir, lam, cfg.lambda_ref, cfg.dust_model)

    if cfg.input_av_opacities:
        eff = load_effective_dust_model(cfg.file_av_opacities, lam, cfg.lambda_ref)
        if grain is not None:
            # 5% consistency check (read_av_opacities sed:1928-1964); the
            # effective values win, grain-level arrays are kept for the
            # dust-emission modes
            for name in ("kabs", "ksca", "kext"):
                a, b = getattr(eff, name), getattr(grain, name)
                rel = np.abs(a - b) / np.maximum((a + b) / 2, 1e-300)
                if np.any(rel > 0.05):
                    raise ValueError(
                        f"effective {name} deviates >5% from grain integration"
                    )
            grain.kabs, grain.ksca, grain.kext, grain.gsca = (
                eff.kabs, eff.ksca, eff.kext, eff.gsca,
            )
            grain.kext_ref = eff.kext_ref
            grain.tau_nh_ref = eff.kext_ref * grain.tot_n_dust
            return grain
        return eff

    if grain is None:
        raise FileNotFoundError(
            "no dust opacity source: grain tables missing and "
            "input_av_opacities not set"
        )
    return grain
