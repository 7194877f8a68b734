"""Public API: the nonhydrostatic pressure solver a host ocean model calls.

TPU-native port of ``src/nhydro.f90`` — the reference's library interface:
  nhydro_init      -> NHModel(...)              (nhydro.f90:18-33)
  nhydro_matrices  -> NHModel.set_matrices(...) (:36-50)
  nhydro_solve     -> NHModel.solve(...)        (:53-102)
  nhydro_check_nondivergence -> NHModel.check_nondivergence(...) (:105-134)
  nhydro_clean     -> (garbage collection; XLA owns memory)

Velocity array layout (z leading; see ops/rhs.py for the mapping to the
reference's (i, j, k) interfaces):
  u: (nz, ny+2, nx+1), v: (nz, ny+1, nx+2), w: (nz+1, ny+2, nx+2)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .assembly import FineMetrics, build_operators
from .bc import extend_h1
from .config import SolverConfig
from .levels import build_level_plan, describe
from .ops.projection import correct_uvw
from .ops.rhs import compute_rhs
from .solver import SingleDeviceBackend, SolveInfo, solve_p


class NHModel:
    """Geometric-multigrid solver for the nonhydrostatic pressure Poisson
    equation on a terrain-following ocean grid."""

    def __init__(self, nx: int, ny: int, nz: int,
                 cfg: Optional[SolverConfig] = None, verbose: bool = False):
        self.cfg = cfg or SolverConfig()
        self.levels = build_level_plan(nx, ny, nz,
                                       aggressive=self.cfg.aggressive)
        self.nx, self.ny, self.nz = nx, ny, nz
        self.backend = None
        self.metrics: Optional[FineMetrics] = None
        if verbose:
            print(describe(self.levels))

    @property
    def dtype(self):
        return jnp.dtype(self.cfg.dtype)

    def set_matrices(self, dx, dy, zeta, h, rmask=None,
                     hc: float = 0.0, theta_b: float = 0.0,
                     theta_s: float = 0.0) -> None:
        """Assemble all levels from topography (nhydro_matrices,
        nhydro.f90:36-50).  Inputs are interior (ny, nx) arrays."""
        dt = self.dtype
        conv = lambda a: jnp.asarray(a, dtype=dt)
        if rmask is None:
            rmask = jnp.ones((self.ny, self.nx), dtype=dt)
        ops, metrics = build_operators(
            self.levels, conv(dx), conv(dy), conv(zeta), conv(h),
            conv(rmask), hc, theta_b, theta_s, self.cfg)
        self.ops = ops
        self.metrics = metrics
        self.backend = SingleDeviceBackend(self.levels, ops, self.cfg)

    # -- pieces (also exposed for tests/benchmarks) ------------------------
    def rhs(self, u, v, w) -> jnp.ndarray:
        assert self.metrics is not None, "call set_matrices first"
        return compute_rhs(self.metrics, u, v, w, self.cfg.bmask)

    def pressure_solve(self, b, tol=None, maxiter=None, verbose=False
                       ) -> Tuple[jnp.ndarray, SolveInfo]:
        return solve_p(self.backend, b, self.cfg, tol=tol, maxiter=maxiter,
                       verbose=verbose)

    def project(self, p, u, v, w):
        return correct_uvw(self.metrics, extend_h1(p), u, v, w)

    # -- the reference's three-step solve (nhydro.f90:80-98) ---------------
    def solve(self, u, v, w, tol=None, maxiter=None, verbose=False):
        """compute_rhs -> solve_p -> correct_uvw.  Returns corrected
        (u, v, w), the pressure p, and a SolveInfo."""
        u = jnp.asarray(u, dtype=self.dtype)
        v = jnp.asarray(v, dtype=self.dtype)
        w = jnp.asarray(w, dtype=self.dtype)
        b = self.rhs(u, v, w)
        p, info = self.pressure_solve(b, tol=tol, maxiter=maxiter,
                                      verbose=verbose)
        u, v, w = self.project(p, u, v, w)
        return u, v, w, p, info

    def check_nondivergence(self, u, v, w) -> jnp.ndarray:
        """Recompute the divergence of corrected velocities; should be at
        machine zero (nhydro_check_nondivergence, nhydro.f90:105-134).
        Returns max |div|."""
        b = self.rhs(u, v, w)
        return jnp.max(jnp.abs(b))
