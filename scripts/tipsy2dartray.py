"""tipsy -> dartray_tpu N-body/SPH HDF5 converter.

Standalone equivalent of the reference's tipsy2dartray.py (which needs
pynbody; not available here): reads a standard tipsy binary snapshot plus
the optional gasoline auxiliary metal arrays and writes the nine datasets
the Nbody_SPH import expects (io_routines.f90:149-160):

  starcoord, gascoord  [same length unit as the grid, set by --dkpcunit]
  mstar, mgas          [Msun]
  agestar              [Gyr]
  gastemp              [K]
  fehstar, fehgas      [Fe/H]
  ofegas               [O/Fe]

Units: tipsy snapshots are in simulation units; pass the gasoline
dKpcUnit/dMsolUnit conversions (or leave 1.0 for already-physical files).
[Fe/H]/[O/Fe] come from the <sim>.FeMassFrac / <sim>.OxMassFrac auxiliary
files when present, else from the snapshot 'metals' field assuming solar
abundance ratios (the reference's note: gas Z from O, stellar Z from Fe).

Usage:
  python scripts/tipsy2dartray.py snap.tipsy out.h5 \
      [--dkpcunit 1.0] [--dmsolunit 1.0] [--time-gyr 13.7] [--little-endian]
"""
from __future__ import annotations

import argparse
import os
import struct
import sys

import numpy as np

# solar mass fractions (Asplund et al. 2009) for the metals fallback
XSUN_FE = 1.31e-3
XSUN_O = 5.79e-3
ZSUN = 0.0134

GAS_FIELDS = 12   # mass x y z vx vy vz rho temp hsmooth metals phi
DARK_FIELDS = 9   # mass x y z vx vy vz eps phi
STAR_FIELDS = 11  # mass x y z vx vy vz metals tform eps phi


def read_tipsy(path: str, big_endian: bool = True):
    """Parse a standard tipsy binary into (header dict, gas, dark, star)
    float32 record arrays (fields along axis 1)."""
    e = ">" if big_endian else "<"
    with open(path, "rb") as f:
        raw = f.read()
    time, nbodies, ndim, nsph, ndark, nstar = struct.unpack(
        e + "d5i", raw[:28]
    )
    off = 28
    # standard tipsy pads the header to 32 bytes
    expect = nsph * GAS_FIELDS + ndark * DARK_FIELDS + nstar * STAR_FIELDS
    if len(raw) - 32 == 4 * expect:
        off = 32
    elif len(raw) - 28 != 4 * expect:
        raise ValueError(
            f"{path}: size {len(raw)} does not match header "
            f"(nsph={nsph}, ndark={ndark}, nstar={nstar}); "
            "try the other endianness (--little-endian)"
        )
    data = np.frombuffer(raw, dtype=e + "f4", offset=off)
    gas = data[: nsph * GAS_FIELDS].reshape(nsph, GAS_FIELDS)
    data = data[nsph * GAS_FIELDS:]
    dark = data[: ndark * DARK_FIELDS].reshape(ndark, DARK_FIELDS)
    star = data[ndark * DARK_FIELDS:].reshape(nstar, STAR_FIELDS)
    hdr = dict(time=time, nbodies=nbodies, ndim=ndim, nsph=nsph,
               ndark=ndark, nstar=nstar)
    return hdr, gas, dark, star


def read_aux(path: str, n: int, big_endian: bool = True):
    """Gasoline auxiliary array (<sim>.FeMassFrac etc.): int32 count +
    float32 values for every particle (gas, dark, star order)."""
    if not os.path.exists(path):
        return None
    e = ">" if big_endian else "<"
    with open(path, "rb") as f:
        raw = f.read()
    cnt = struct.unpack(e + "i", raw[:4])[0]
    if cnt != n:
        raise ValueError(f"{path}: {cnt} entries, snapshot has {n} bodies")
    return np.frombuffer(raw, dtype=e + "f4", offset=4)


def convert(sim: str, out: str, dkpcunit: float = 1.0,
            dmsolunit: float = 1.0, time_gyr: float = None,
            big_endian: bool = True):
    import h5py

    hdr, gas, dark, star = read_tipsy(sim, big_endian)
    nsph, ndark, nstar = hdr["nsph"], hdr["ndark"], hdr["nstar"]
    n = hdr["nbodies"]

    # physical units: kpc -> pc for coordinates, Msun for masses
    pos_fac = dkpcunit * 1e3
    gascoord = gas[:, 1:4].astype(np.float64) * pos_fac
    starcoord = star[:, 1:4].astype(np.float64) * pos_fac
    mgas = gas[:, 0].astype(np.float64) * dmsolunit
    mstar = star[:, 0].astype(np.float64) * dmsolunit
    gastemp = gas[:, 8].astype(np.float64)

    # stellar ages: t_now - tform, in Gyr.  For cosmological runs pass the
    # age of the snapshot via --time-gyr; tform is then interpreted as a
    # fraction of it (pynbody does the full cosmology integral — out of
    # scope for a unit converter).
    tform = star[:, 8].astype(np.float64)
    t_now = hdr["time"] if time_gyr is None else time_gyr
    agestar = np.maximum(t_now - tform, 1e-4)

    fe = read_aux(sim + ".FeMassFrac", n, big_endian)
    ox = read_aux(sim + ".OxMassFrac", n, big_endian)
    if fe is not None:
        fe_gas = fe[:nsph].astype(np.float64)
        fe_star = fe[nsph + ndark:].astype(np.float64)
        fehgas = np.log10(np.maximum(fe_gas, 1e-12) / XSUN_FE)
        fehstar = np.log10(np.maximum(fe_star, 1e-12) / XSUN_FE)
    else:
        # fallback: scale the total-metals field by solar ratios
        fehgas = np.log10(np.maximum(gas[:, 10], 1e-12) / ZSUN)
        fehstar = np.log10(np.maximum(star[:, 7], 1e-12) / ZSUN)
    if ox is not None:
        o_gas = ox[:nsph].astype(np.float64)
        ofegas = np.log10(np.maximum(o_gas, 1e-12) / XSUN_O) - fehgas
    else:
        ofegas = np.zeros(nsph)

    with h5py.File(out, "w") as f:
        f["starcoord"] = starcoord
        f["gascoord"] = gascoord
        f["mstar"] = mstar
        f["mgas"] = mgas
        f["agestar"] = agestar
        f["gastemp"] = gastemp
        f["fehstar"] = fehstar
        f["fehgas"] = fehgas
        f["ofegas"] = ofegas
    print(f"{out}: {nstar} star + {nsph} gas particles "
          f"({ndark} dark skipped)")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("sim")
    ap.add_argument("out")
    ap.add_argument("--dkpcunit", type=float, default=1.0)
    ap.add_argument("--dmsolunit", type=float, default=1.0)
    ap.add_argument("--time-gyr", type=float, default=None)
    ap.add_argument("--little-endian", action="store_true")
    a = ap.parse_args(argv)
    convert(a.sim, a.out, a.dkpcunit, a.dmsolunit, a.time_gyr,
            big_endian=not a.little_endian)
    return 0


if __name__ == "__main__":
    sys.exit(main())
