"""Seamount benchmark case.

Port of the reference's canonical test problem (``setup_seamount``,
src/mg_setup_tests.f90:108-157; driver defaults in
src/mg_testseamount.f90:44-49, 76-123): a Gaussian seamount in a
Lx x Ly x Htot box, uniform horizontal spacing, zeta = 0, and an initial
velocity field u = v = 0, w = -1 (zero at the bottom face).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CaseSetup(NamedTuple):
    dx: jnp.ndarray
    dy: jnp.ndarray
    zeta: jnp.ndarray
    h: jnp.ndarray
    hc: float
    theta_b: float
    theta_s: float


def setup_seamount(nx: int = 64, ny: int = 64, nz: int = 64,
                   Lx: float = 1.0e4, Ly: float = 1.0e4, Htot: float = 4.0e3,
                   hc: float = 4.0e3, theta_b: float = 0.0,
                   theta_s: float = 0.0, dtype=jnp.float64) -> CaseSetup:
    """Gaussian seamount bathymetry:
    h = Htot*(1 - 0.5*exp(-((x-x0)^2 + (y-y0)^2)/(L/5)^2))
    (mg_setup_tests.f90:145); cell-centre coordinates x = (i-1/2)dx for the
    1-based interior index (:142-143)."""
    dxv = Lx / nx
    dyv = Ly / ny
    x = (jnp.arange(1, nx + 1, dtype=dtype) - 0.5) * dxv
    y = (jnp.arange(1, ny + 1, dtype=dtype) - 0.5) * dyv
    X = x[None, :]
    Y = y[:, None]
    h = Htot * (1.0 - 0.5 * jnp.exp(-((X - 0.5 * Lx) ** 2) / (Lx / 5.0) ** 2
                                    - ((Y - 0.5 * Ly) ** 2) / (Ly / 5.0) ** 2))
    dx = jnp.full((ny, nx), dxv, dtype=dtype)
    dy = jnp.full((ny, nx), dyv, dtype=dtype)
    zeta = jnp.zeros((ny, nx), dtype=dtype)
    return CaseSetup(dx, dy, zeta, h, hc, theta_b, theta_s)


def initial_velocities(nx: int, ny: int, nz: int, dtype=jnp.float64):
    """u = v = 0, w = -1 except the bottom face
    (mg_testseamount.f90:119-123)."""
    u = jnp.zeros((nz, ny + 2, nx + 1), dtype=dtype)
    v = jnp.zeros((nz, ny + 1, nx + 2), dtype=dtype)
    w = jnp.full((nz + 1, ny + 2, nx + 2), -1.0, dtype=dtype)
    w = w.at[0].set(0.0)
    return u, v, w
