"""Physical constants (SI unless noted), mirroring smooth_grid_routines.f90:371-452."""

PARSEC = 3.08567758e16  # m       (smooth_grid_routines.f90:373)
PARSEC_CGS = 3.08567758e18  # cm  (smooth_grid_routines.f90:375)
CSPEED = 2.99792458e8  # m/s      (smooth_grid_routines.f90:377)
HPLANCK = 6.62606957e-34  # J s   (smooth_grid_routines.f90:440)
KBOLTZ = 1.3806488e-23  # J/K     (smooth_grid_routines.f90:443)
SIGMA_SB = 5.67036713e-8  # W/m^2/K^4 (smooth_grid_routines.f90:446)
MSUN = 1.9892000e30  # kg         (smooth_grid_routines.f90:449)
M_H = 1.6605402e-27  # kg         (smooth_grid_routines.f90:452)
