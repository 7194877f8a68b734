"""Analytic right-hand sides for solver-only testing.

Port of ``src/mg_define_rhs.f90`` — the reference's library of synthetic
RHS fields for exercising the multigrid solver without a velocity field:
  - ``rhs_seamount`` (:12-63): a vertical dipole of Gaussians,
  - ``rhs_random`` (:66-95): uniform random in [-1, 1),
  - ``setup_random_patches`` (:97-163): sum of 100 random Gaussian blobs.

(The reference file is stale — it references removed globals and is
excluded from the build, src/Makefile.am:38-97 — but the three generators
are part of the component inventory and are genuinely useful for solver
unit tests, so they live on here in working form.)

All generators return interior (nz, ny, nx) arrays on the unit cube scaled
by the domain dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _coords(nx, ny, nz, Lx, Ly, Htot, dtype):
    x = ((jnp.arange(nx, dtype=dtype) + 0.5) / nx) * Lx
    y = ((jnp.arange(ny, dtype=dtype) + 0.5) / ny) * Ly
    z = -Htot + ((jnp.arange(nz, dtype=dtype) + 0.5) / nz) * Htot
    return (x[None, None, :], y[None, :, None], z[:, None, None])


def rhs_seamount(nx: int, ny: int, nz: int,
                 Lx: float = 1.0e4, Ly: float = 1.0e4, Htot: float = 4.0e3,
                 dtype=jnp.float64) -> jnp.ndarray:
    """Vertical dipole of Gaussians centred mid-domain
    (mg_define_rhs.f90:33-60): zero net integral, smooth, excites all
    scales — the classic multigrid smoke RHS."""
    X, Y, Z = _coords(nx, ny, nz, Lx, Ly, Htot, dtype)
    x0, y0 = 0.5 * Lx, 0.5 * Ly
    z1, z2 = -Htot / 3.0, -2.0 * Htot / 3.0
    sigh = (0.1 * Lx) ** 2
    sigv = (0.1 * Htot) ** 2
    blob = lambda zc: jnp.exp(-((X - x0) ** 2 + (Y - y0) ** 2) / sigh
                              - (Z - zc) ** 2 / sigv)
    return blob(z1) - blob(z2)


def rhs_random(nx: int, ny: int, nz: int, seed: int = 0,
               dtype=jnp.float64) -> jnp.ndarray:
    """Uniform random RHS in [-1, 1) (mg_define_rhs.f90:66-95)."""
    key = jax.random.PRNGKey(seed)
    return 2.0 * jax.random.uniform(key, (nz, ny, nx), dtype=dtype) - 1.0


def random_patches(nx: int, ny: int, nz: int, npatches: int = 100,
                   Lx: float = 1.0e4, Ly: float = 1.0e4,
                   Htot: float = 4.0e3, seed: int = 0,
                   dtype=jnp.float64) -> jnp.ndarray:
    """Sum of ``npatches`` random Gaussian blobs with random amplitude in
    [-1, 1) and random width (mg_define_rhs.f90:97-163)."""
    key = jax.random.PRNGKey(seed)
    kc, ka, kw = jax.random.split(key, 3)
    centers = jax.random.uniform(kc, (npatches, 3), dtype=dtype)
    amps = 2.0 * jax.random.uniform(ka, (npatches,), dtype=dtype) - 1.0
    widths = jax.random.uniform(kw, (npatches,), dtype=dtype,
                                minval=0.02, maxval=0.15)
    X, Y, Z = _coords(nx, ny, nz, Lx, Ly, Htot, dtype)

    def one(c, a, w):
        return a * jnp.exp(-(((X - c[0] * Lx) / (w * Lx)) ** 2
                             + ((Y - c[1] * Ly) / (w * Ly)) ** 2
                             + ((Z + c[2] * Htot) / (w * Htot)) ** 2))

    return jnp.sum(jax.vmap(one)(centers, amps, widths), axis=0)
