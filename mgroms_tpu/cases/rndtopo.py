"""Random-topography benchmark case.

Port of ``setup_rndtopo`` (src/mg_setup_tests.f90:160-211; driver
src/mg_testrndtopo.f90 is diff-identical to the seamount driver): depth is
uniform-random in [0, 0.2*Htot].  Note the reference writes ``h(i,j)``
(transposed index order, :199) — a latent bug in a random field with a
symmetric domain, with no effect on the solver's behaviour; we generate the
random field directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .seamount import CaseSetup


def setup_rndtopo(nx: int = 64, ny: int = 64, nz: int = 64,
                  Lx: float = 1.0e4, Ly: float = 1.0e4, Htot: float = 4.0e3,
                  hc: float = 4.0e3, theta_b: float = 0.0,
                  theta_s: float = 0.0, seed: int = 0,
                  dtype=jnp.float64) -> CaseSetup:
    key = jax.random.PRNGKey(seed)
    h = Htot * 0.2 * jax.random.uniform(key, (ny, nx), dtype=dtype)
    dx = jnp.full((ny, nx), Lx / nx, dtype=dtype)
    dy = jnp.full((ny, nx), Ly / ny, dtype=dtype)
    zeta = jnp.zeros((ny, nx), dtype=dtype)
    return CaseSetup(dx, dy, zeta, h, hc, theta_b, theta_s)
