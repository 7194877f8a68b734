"""California Undercurrent (CUC) benchmark case.

Port of the reference's realistic case (``setup_cuc``,
src/mg_setup_tests.f90:13-105; driver src/mg_testcuc.f90): 1024x1024x64,
Lx = Ly = 200 km, hc = 250, theta_b = theta_s = 6, with bathymetry ``h``
and grid-spacing fields ``pm``/``pn`` read from ``cuc_nhgrd.nc``.

The data file is NOT shipped with the reference either
(mg_setup_tests.f90:44-48 points at a local ``../DATA`` directory), so this
module provides both:
  - :func:`load_cuc` — read a real ``cuc_nhgrd.nc`` (netCDF classic via
    scipy), applying the same transforms (dx = 1/pm, dy = 1/pn, spacing
    floored at 1 m, zeta = 0);
  - :func:`setup_cuc_synthetic` — a stand-in continental-slope bathymetry
    with the same statistics (depth range, slope structure) so the
    1024^2 x 64 configuration can be exercised without the file.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .seamount import CaseSetup

CUC_DEFAULTS = dict(nx=1024, ny=1024, nz=64, Lx=2.0e5, Ly=2.0e5,
                    hc=250.0, theta_b=6.0, theta_s=6.0)


def load_cuc(path: str, nx: int = 1024, ny: int = 1024,
             i0: int = 1, j0: int = 1, dtype=jnp.float64) -> CaseSetup:
    """Read h, pm, pn from a CUC grid file (mg_setup_tests.f90:56-103).

    ``i0``, ``j0`` are the 0-based offsets of the subwindow (the reference
    reads starting at index 2, i.e. offset 1)."""
    from scipy.io import netcdf_file
    with netcdf_file(path, "r") as f:
        h = np.array(f.variables["h"][j0:j0 + ny, i0:i0 + nx])
        pm = np.array(f.variables["pm"][j0:j0 + ny, i0:i0 + nx])
        pn = np.array(f.variables["pn"][j0:j0 + ny, i0:i0 + nx])
    dx = np.maximum(1.0, 1.0 / pm)       # (:96-101)
    dy = np.maximum(1.0, 1.0 / pn)
    zeta = np.zeros_like(h)
    return CaseSetup(jnp.asarray(dx, dtype), jnp.asarray(dy, dtype),
                     jnp.asarray(zeta, dtype), jnp.asarray(h, dtype),
                     CUC_DEFAULTS["hc"], CUC_DEFAULTS["theta_b"],
                     CUC_DEFAULTS["theta_s"])


def setup_cuc_synthetic(nx: int = 1024, ny: int = 1024, nz: int = 64,
                        Lx: float = 2.0e5, Ly: float = 2.0e5,
                        hc: float = 250.0, theta_b: float = 6.0,
                        theta_s: float = 6.0, seed: int = 7,
                        dtype=jnp.float64) -> CaseSetup:
    """Synthetic continental-slope bathymetry standing in for
    ``cuc_nhgrd.nc``: a shelf (~100 m) dropping over a tanh slope to an
    abyssal plain (~4000 m), plus smooth ridges — the depth range and slope
    scale of the California margin the real file covers."""
    x = (np.arange(nx) + 0.5) / nx
    y = (np.arange(ny) + 0.5) / ny
    X, Y = np.meshgrid(x, y)
    shelf, deep = 100.0, 4000.0
    # slope position meanders with alongshore coordinate
    slope_pos = 0.35 + 0.08 * np.sin(2 * np.pi * Y * 1.5)
    h = shelf + 0.5 * (deep - shelf) * (
        1.0 + np.tanh((X - slope_pos) / 0.08))
    # smooth ridges/canyons
    rng = np.random.default_rng(seed)
    for kx, ky in ((2, 3), (3, 1), (5, 2)):
        amp = 120.0 * rng.uniform(0.5, 1.0)
        ph = rng.uniform(0, 2 * np.pi, size=2)
        h += amp * np.sin(2 * np.pi * kx * X + ph[0]) \
                 * np.cos(2 * np.pi * ky * Y + ph[1])
    dx = np.full((ny, nx), Lx / nx)
    dy = np.full((ny, nx), Ly / ny)
    zeta = np.zeros((ny, nx))
    return CaseSetup(jnp.asarray(dx, dtype), jnp.asarray(dy, dtype),
                     jnp.asarray(zeta, dtype), jnp.asarray(h, dtype),
                     hc, theta_b, theta_s)
