"""Axisymmetric galaxy model: stellar disks + Sersic bulge + dust disks.

Rebuild of user_routines_galaxy.f90 (Popescu et al. 2011-style models):
six radial/vertical profile families (expR_expz, expR_sech2z, flared_expz,
flared_sech2z, ellipt_expR_expz, ellipt_expR_sech2z —
user_routines_galaxy.f90:223-228), per-wavelength disk scale lengths,
luminosity calibration from input SED tables (calc_luminosities galaxy:1259,
calc_scaling_factors_stars galaxy:1327, calc_scaling_factors_dust
galaxy:1433), and the Sersic ellipsoidal bulge (av_star_bulge galaxy:1802).

Everything is vectorized over cell batches; cell averages use the same
step_int=10 subgrid as the reference (av_disk galaxy:1604-1797).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..grid.builder import build_grid

STEP_INT = 10  # galaxy.f90:245
BSERSIC = np.array(
    [1.67835, 3.67206, 5.67017, 7.66925, 9.66872, 11.6684, 13.6681, 15.6679,
     17.6678, 19.6677]
)  # galaxy.f90:1806-1807


@dataclasses.dataclass
class DiskParams:
    """One disk component (stellar or dust)."""

    disk_type: str  # one of the six profile families
    a0: float  # central amplitude (eta_disk0 / kext_disk0)
    hc: float  # radial scale length
    zc: float  # central vertical scale height
    zc_r1: float = 0.0  # scale height at r1 (flared types)
    zc_rsun: float = 0.0  # scale height at rsun (flared types)
    chi: float = 0.0  # inner-taper parameter (flared types)
    r1: float = 0.0  # inner radius
    hc2: float = 0.0  # second semi-axis (elliptical types)
    theta_ellipt: float = 0.0  # position angle [deg] (elliptical types)
    rsun: float = 8000.0
    max_z: float = np.inf
    max_rad: float = np.inf

    def density(self, pts):
        """Profile value at points (N,3) (av_disk, galaxy.f90:1625-1790)."""
        x, y, z = pts[:, 0], pts[:, 1], np.abs(pts[:, 2])
        rad = np.sqrt(x**2 + y**2)
        out = np.zeros(len(pts))
        ok = (z <= self.max_z) & (rad <= self.max_rad)
        t = self.disk_type
        if t == "expR_expz":
            out = np.exp(-rad / self.hc) * np.exp(-z / self.zc)
        elif t == "expR_sech2z":
            out = np.exp(-rad / self.hc) / np.cosh(z / self.zc) ** 2
        elif t in ("flared_expz", "flared_sech2z"):
            if abs(self.zc_r1 - self.zc) > 1e-5 * self.zc:
                xexp = np.log((self.zc_rsun - self.zc) / (self.zc_r1 - self.zc)) / np.log(
                    self.rsun / self.r1
                )
            else:
                xexp = 0.0
            zc_r = self.zc + (self.zc_r1 - self.zc) * (rad / self.r1) ** xexp
            zfac = (
                np.exp(-z / zc_r)
                if t == "flared_expz"
                else 1.0 / np.cosh(z / zc_r) ** 2
            )
            inner = rad < self.r1
            rfac = np.where(
                inner,
                (rad / self.r1 * (1 - self.chi) + self.chi) * np.exp(-self.r1 / self.hc),
                np.exp(-rad / self.hc),
            )
            out = self.zc / zc_r * rfac * zfac
            if self.chi < 0:
                out = np.maximum(out, 0.0)
        elif t in ("ellipt_expR_expz", "ellipt_expR_sech2z"):
            if abs(self.zc_r1 - self.zc) > 1e-5 * self.zc:
                xexp = np.log((self.zc_rsun - self.zc) / (self.zc_r1 - self.zc)) / np.log(
                    self.rsun / self.r1
                )
            else:
                xexp = 0.0
            zc_r = self.zc + (self.zc_r1 - self.zc) * (rad / self.r1) ** xexp
            ct = np.cos(np.deg2rad(self.theta_ellipt))
            st = np.sin(np.deg2rad(self.theta_ellipt))
            xr = x * ct + y * st
            yr = -x * st + y * ct
            nr = np.sqrt((xr / self.hc) ** 2 + (yr / self.hc2) ** 2)
            zfac = (
                np.exp(-z / zc_r)
                if t == "ellipt_expR_expz"
                else 1.0 / np.cosh(z / zc_r) ** 2
            )
            out = np.where(rad < self.r1, self.zc / zc_r * np.exp(-nr) * zfac, 0.0)
        else:
            raise ValueError(f"unknown disk_type {t!r}")
        return np.where(ok, self.a0 * out, 0.0)


@dataclasses.dataclass
class BulgeParams:
    """Sersic ellipsoidal bulge (av_star_bulge, galaxy.f90:1802-1895)."""

    a0: float  # eta_bulge0 (scaled after grid creation)
    reff: float
    acap: float  # inner flattening radius [same units as reff]
    ellipt: float  # z flattening
    mtrunc: float  # truncation in effective radii
    nsersic: int
    theta_bulge: float = 0.0
    ellipt_xy: float = 1.0
    max_rad: float = np.inf

    def density(self, pts):
        b = BSERSIC[self.nsersic - 1]
        n = float(self.nsersic)
        ct = np.cos(np.deg2rad(self.theta_bulge))
        st = np.sin(np.deg2rad(self.theta_bulge))
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        xr = x * ct + y * st
        yr = -x * st + y * ct
        rad = np.sqrt(xr**2 + (yr / self.ellipt_xy) ** 2)
        m = np.sqrt(rad**2 + (z / self.ellipt) ** 2) / self.reff
        m = np.maximum(m, self.acap / self.reff)
        val = m ** (-(2 * n - 1) / (2 * n)) * np.exp(-b * m ** (1.0 / n))
        return np.where((m <= self.mtrunc) & (rad <= self.max_rad), self.a0 * val, 0.0)


def cell_average(component, centers, csize, steps: int = STEP_INT):
    """step_int^3 subgrid cell average (av_disk galaxy:1604-1797)."""
    offs = (np.arange(steps) + 0.5) / steps
    xx, yy, zz = np.meshgrid(offs, offs, offs, indexing="ij")
    frac = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], -1)
    lo = centers - csize[:, None] / 2.0
    pts = lo[:, None, :] + frac[None, :, :] * csize[:, None, None]
    vals = component.density(pts.reshape(-1, 3)).reshape(len(centers), -1)
    return vals.mean(axis=1)


# ---------------------------------------------------------------------------
# luminosity calibration
# ---------------------------------------------------------------------------


def read_star_sed(path: str):
    """Wavelength [um] / luminosity [W/Hz] table (read_stellar_sed,
    galaxy.f90:2291-2368)."""
    data = np.loadtxt(path, skiprows=1)
    return data[:, 0], data[:, 1]


def unit_luminosity(lambda_um, table_lam, table_lnu):
    """lnu at lambda with (last_lambda/lambda)^2 extrapolation
    (calc_luminosities, galaxy.f90:1281-1290)."""
    lam = np.atleast_1d(np.asarray(lambda_um, dtype=np.float64))
    out = np.interp(lam, table_lam, table_lnu, left=0.0)
    beyond = lam > table_lam[-1]
    out = np.where(beyond, table_lnu[-1] * (table_lam[-1] / lam) ** 2, out)
    out = np.where(lam < table_lam[0] * 0.999, 0.0, out)
    return out


def eta_disk0(lnu, disk_type, hc, zc, rtrun, r1=0.0, chi=0.0):
    """Central emissivity from the total component luminosity
    (calc_scaling_factors_stars, galaxy.f90:1344-1425)."""
    if lnu == 0:
        return 0.0
    if disk_type in ("expR_expz", "expR_sech2z", "ellipt_expR_expz", "ellipt_expR_sech2z"):
        termr = 1.0 - np.exp(-rtrun / hc) - (rtrun / hc) * np.exp(-rtrun / hc)
        return lnu / (4 * np.pi * zc * hc**2 * termr)
    if disk_type in ("flared_expz", "flared_sech2z"):
        termr = (
            np.exp(-r1 / hc) - np.exp(-rtrun / hc)
            + (r1 / hc) * np.exp(-r1 / hc) - (rtrun / hc) * np.exp(-rtrun / hc)
        )
        termrin = 4.0 / 3.0 * (1 + chi / 2) * np.pi * r1**2 * zc * np.exp(-r1 / hc)
        return lnu / (4 * np.pi * zc * hc**2 * termr + termrin)
    raise ValueError(disk_type)


def kext_disk0(tau1, tau2, zd_disk, zd_tdisk, kext_lambda_over_kext_B):
    """Central extinction coefficients of the two dust disks from the
    face-on B-band optical depths (calc_scaling_factors_dust,
    galaxy.f90:1433-1465).  Returns (kext_disk0, kext_tdisk0) at lambda."""
    taub_f = (tau1 + tau2) * kext_lambda_over_kext_B
    if tau2 > 0:
        tau_ratio = tau1 / tau2
        k_t = taub_f / (2 * (1 + tau_ratio) * zd_tdisk)
        k_d = tau_ratio * k_t * zd_tdisk / zd_disk
    else:
        k_t = 0.0
        k_d = taub_f / (2 * zd_disk)
    return k_d, k_t


@dataclasses.dataclass
class GalaxyModel:
    """Full model configuration: geometry + SED tables."""

    old_disk: DiskParams
    young_disk: DiskParams
    bulge: Optional[BulgeParams]
    thick_dust: DiskParams
    thin_dust: DiskParams
    old_sed: tuple  # (lambda_um, lnu) tables
    young_sed: tuple
    old_norm: float  # 'old' parameter
    sfr: float
    bd_ratio: float
    rtrun: float
    hs_disk_arr: Optional[dict] = None  # {lambda_index: hs_disk} overrides

    def luminosities(self, lambda_um):
        """(lnu_old, lnu_sf, lnu_bulge) at each wavelength
        (calc_luminosities galaxy.f90:1259-1323)."""
        lnu_old = self.old_norm * unit_luminosity(lambda_um, *self.old_sed)
        lnu_sf = self.sfr * unit_luminosity(lambda_um, *self.young_sed)
        lnu_bulge = self.bd_ratio * lnu_old
        return lnu_old, lnu_sf, lnu_bulge


def make_galaxy_dens_fn(model: GalaxyModel, lambda_ref_um: float):
    """Reference-wavelength extinction + stellar emissivity for the grid
    builder (calc_dens in create_adap_grid_galaxy.f90)."""
    lnu_old, lnu_sf, lnu_bulge = model.luminosities(np.asarray([lambda_ref_um]))

    old = dataclasses.replace(
        model.old_disk,
        a0=eta_disk0(float(lnu_old[0]), model.old_disk.disk_type,
                     model.old_disk.hc, model.old_disk.zc, model.rtrun,
                     model.old_disk.r1, model.old_disk.chi),
    )
    young = dataclasses.replace(
        model.young_disk,
        a0=eta_disk0(float(lnu_sf[0]), model.young_disk.disk_type,
                     model.young_disk.hc, model.young_disk.zc, model.rtrun,
                     model.young_disk.r1, model.young_disk.chi),
    )
    bulge = (
        dataclasses.replace(model.bulge, a0=1.0) if model.bulge is not None else None
    )

    def dens_fn(centers, csize):
        centers = np.asarray(centers)
        csize = np.asarray(csize)
        dust = cell_average(model.thick_dust, centers, csize) + cell_average(
            model.thin_dust, centers, csize
        )
        stars = cell_average(old, centers, csize) + cell_average(young, centers, csize)
        if bulge is not None:
            stars = stars + cell_average(bulge, centers, csize)
        return dust, stars

    return dens_fn


def make_galaxy_subdivision_fn(max_dtau, max_dlum, lnu_tot, z_subd_lim, R_subd_lim,
                               max_lvl):
    """'standard' criterion (create_adap_grid_galaxy.f90 subdivision)."""

    def fn(centers, csize, level, dens, dens_stars):
        tau = dens * csize
        lum = dens_stars * csize**3
        inner = (np.abs(centers[:, 2]) < z_subd_lim) & (
            np.sqrt(centers[:, 0] ** 2 + centers[:, 1] ** 2) < R_subd_lim
        )
        return (level < max_lvl) & ((tau > max_dtau) | (lum > max_dlum * lnu_tot) | inner)

    return fn


def _f(raw, key, default=0.0):
    v = raw.get(key, default)
    return float(v[0]) if isinstance(v, list) else float(v)


def model_from_namelist(raw: dict, dir_grid: str):
    """Build a GalaxyModel + grid parameters from the reference's galaxy
    namelist groups (galaxy_input_strings/var/var_old_disk/var_young_disk/
    var_bulge/var_thick_dust_disk/var_thin_dust_disk,
    user_routines_galaxy.f90:286-300).
    """
    import os

    rsun = _f(raw, "rsun", 8000.0)
    max_z = _f(raw, "max_z", np.inf)
    max_rad = _f(raw, "max_rad", np.inf)
    rtrun = _f(raw, "rtrun", max_rad)

    def disk(dtype_key, hc, zc, zc_r1, zc_rsun, chi, r1, hc2=0.0, theta=0.0):
        return DiskParams(
            disk_type=raw.get(dtype_key, "expR_expz"), a0=1.0,
            hc=hc, zc=zc, zc_r1=zc_r1, zc_rsun=zc_rsun, chi=chi, r1=r1,
            hc2=hc2 or hc, theta_ellipt=theta, rsun=rsun,
            max_z=max_z, max_rad=max_rad,
        )

    old_disk = disk(
        "old_disk_type", _f(raw, "hs_disk_b"), _f(raw, "zs_disk"),
        _f(raw, "zs_disk_r1"), _f(raw, "zs_disk_rsun"), _f(raw, "chi_disk"),
        _f(raw, "hsin"), _f(raw, "hs_disk2", 0.0),
        _f(raw, "theta_disk_ellipt", 0.0),
    )
    young_disk = disk(
        "young_disk_type", _f(raw, "hs_tdisk"), _f(raw, "zs_tdisk"),
        _f(raw, "zs_tdisk_r1"), _f(raw, "zs_tdisk_rsun"), _f(raw, "chi_tdisk"),
        _f(raw, "hs1in"), _f(raw, "hs_tdisk2", 0.0),
        _f(raw, "theta_tdisk_ellipt", 0.0),
    )
    thick_dust = disk(
        "thick_disk_type", _f(raw, "hd_disk"), _f(raw, "zd_disk"),
        _f(raw, "zd_disk_r1"), _f(raw, "zd_disk_rsun"),
        _f(raw, "chi_dust_disk"), _f(raw, "hdin"), _f(raw, "hd_disk2", 0.0),
        _f(raw, "theta_dust_disk_ellipt", 0.0),
    )
    thin_dust = disk(
        "thin_disk_type", _f(raw, "hd_tdisk"), _f(raw, "zd_tdisk"),
        _f(raw, "zd_tdisk_r1"), _f(raw, "zd_tdisk_rsun"),
        _f(raw, "chi_dust_tdisk"), _f(raw, "hd1in"), _f(raw, "hd_tdisk2", 0.0),
        _f(raw, "theta_dust_tdisk_ellipt", 0.0),
    )
    bd_ratio = _f(raw, "bd_ratio", 0.0)
    bulge = None
    if bd_ratio > 0 and "reff" in raw:
        bulge = BulgeParams(
            a0=1.0, reff=_f(raw, "reff"), acap=_f(raw, "acap_bulge"),
            ellipt=_f(raw, "ellipt", 1.0), mtrunc=_f(raw, "mtrunc", 3.0),
            nsersic=int(_f(raw, "nsersic", 4)),
            theta_bulge=_f(raw, "theta_bulge", 0.0),
            ellipt_xy=_f(raw, "ellipt_xy", 1.0), max_rad=max_rad,
        )

    old_sed = read_star_sed(os.path.join(dir_grid, raw["file_old_star_sed"]))
    young_sed = read_star_sed(os.path.join(dir_grid, raw["file_young_star_sed"]))

    # per-lambda B-band scale-length overrides (read_input_galaxy,
    # user_routines_galaxy.f90:340-352)
    hs_arr = None
    ids = raw.get("id_hs_disk_arr")
    if ids is not None:
        ids = ids if isinstance(ids, list) else [ids]
        vals = raw.get("hs_disk_arr", [])
        vals = vals if isinstance(vals, list) else [vals]
        hs_arr = {int(i): float(v) for i, v in zip(ids, vals)}

    model = GalaxyModel(
        old_disk=old_disk, young_disk=young_disk, bulge=bulge,
        thick_dust=thick_dust, thin_dust=thin_dust,
        old_sed=old_sed, young_sed=young_sed,
        old_norm=_f(raw, "old", 1.0), sfr=_f(raw, "sfr", 0.0),
        bd_ratio=bd_ratio, rtrun=rtrun, hs_disk_arr=hs_arr,
    )
    tau1, tau2 = _f(raw, "tau1", 0.0), _f(raw, "tau2", 0.0)
    return model, tau1, tau2


B_BAND_UM = 0.443  # B band wavelength for the tau1/tau2 calibration


def set_dust_a0(model: GalaxyModel, tau1: float, tau2: float,
                kext_ratio_B: float):
    """Dust-disk central extinction at one wavelength from the face-on
    B-band optical depths (calc_scaling_factors_dust, galaxy.f90:1433-1465);
    kext_ratio_B = kext(lambda)/kext(B)."""
    k_d, k_t = kext_disk0(
        tau1, tau2, model.thick_dust.zc, model.thin_dust.zc, kext_ratio_B
    )
    return dataclasses.replace(
        model,
        thick_dust=dataclasses.replace(model.thick_dust, a0=k_d),
        thin_dust=dataclasses.replace(model.thin_dust, a0=k_t),
    )


def galaxy_dens_arr(grid, model: GalaxyModel, tau1, tau2, kext_um, kext_tab,
                    lambda_um):
    """Per-wavelength dust extinction on the grid leaves (the dens part of
    the galaxy lambda grids, make_lambda_grid create_adap_grid_galaxy.f90:
    171-226): the dust-disk profiles scaled by kext(lambda)/kext(B)."""
    kext_B = np.interp(B_BAND_UM, kext_um, kext_tab)
    centers = np.asarray(grid.ccoord)
    csize = np.asarray(grid.csize)
    leaf = np.asarray(grid.leaf_mask())
    lam = np.atleast_1d(np.asarray(lambda_um))
    out = np.zeros((grid.n_cells, len(lam)))
    for il, l in enumerate(lam):
        ratio = float(np.interp(l, kext_um, kext_tab) / kext_B)
        m = set_dust_a0(model, tau1, tau2, ratio)
        out[leaf, il] = cell_average(m.thick_dust, centers[leaf], csize[leaf]) \
            + cell_average(m.thin_dust, centers[leaf], csize[leaf])
    return out


def galaxy_dens_stars_arr(grid, model: GalaxyModel, lambda_um):
    """Per-wavelength stellar emissivity on the grid leaves — the in-memory
    equivalent of the reference's per-lambda grid files
    (create_adap_grid_galaxy.f90:100-120 lambda-grid loop), including the
    after-the-fact bulge normalization (fix_dens_stars_arrays,
    galaxy.f90:1914-1961: components with a0=1 are rescaled so their grid
    total matches the target luminosity)."""
    lam = np.asarray(lambda_um)
    lnu_old, lnu_sf, lnu_bulge = model.luminosities(lam)
    centers = np.asarray(grid.ccoord)
    csize = np.asarray(grid.csize)
    leaf = np.asarray(grid.leaf_mask())
    vol = csize**3
    out = np.zeros((grid.n_cells, len(lam)))
    for il, lam_i in enumerate(lam):
        hs = model.hs_disk_arr.get(il, model.old_disk.hc) if model.hs_disk_arr else model.old_disk.hc
        old = dataclasses.replace(
            model.old_disk, hc=hs,
            a0=eta_disk0(float(lnu_old[il]), model.old_disk.disk_type, hs,
                         model.old_disk.zc, model.rtrun, model.old_disk.r1,
                         model.old_disk.chi),
        )
        young = dataclasses.replace(
            model.young_disk,
            a0=eta_disk0(float(lnu_sf[il]), model.young_disk.disk_type,
                         model.young_disk.hc, model.young_disk.zc, model.rtrun,
                         model.young_disk.r1, model.young_disk.chi),
        )
        d = cell_average(old, centers[leaf], csize[leaf]) + cell_average(
            young, centers[leaf], csize[leaf]
        )
        if model.bulge is not None and lnu_bulge[il] > 0:
            b = cell_average(
                dataclasses.replace(model.bulge, a0=1.0), centers[leaf], csize[leaf]
            )
            tot = np.sum(b * vol[leaf])
            if tot > 0:
                d = d + b * (lnu_bulge[il] / tot)
        out[leaf, il] = d
    return out
