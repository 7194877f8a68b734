"""Staggered velocity-array utilities.

Equivalent of ``src/mg_mpi_exchange_ijk.f90`` (``fill_halo_ijk``): the
reference exchanges/fills halos of arrays kept in the host model's (i,j,k)
layout with u/v/w staggering — used only by test setup.  Here the solver
works on global arrays (GSPMD owns shard seams), so what remains is the
physical-edge fill and shape adaptation for standalone use.

Array shapes (see ops/rhs.py):
  u: (nz, ny+2, nx+1), v: (nz, ny+1, nx+2), w: (nz+1, ny+2, nx+2)
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def velocities_from_interior(ui: jnp.ndarray, vi: jnp.ndarray,
                             wi: jnp.ndarray
                             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build solver-layout velocity arrays from interior-only fields.

    Inputs: ui (nz, ny, nx+1) u-faces, vi (nz, ny+1, nx) v-faces,
    wi (nz+1, ny, nx) w-faces.  Halo rows/columns are filled with the
    zero-gradient (edge-copy) rule — the value a host model's own halo
    exchange would leave at a physical boundary.
    """
    u = jnp.pad(ui, ((0, 0), (1, 1), (0, 0)), mode="edge")
    v = jnp.pad(vi, ((0, 0), (0, 0), (1, 1)), mode="edge")
    w = jnp.pad(wi, ((0, 0), (1, 1), (1, 1)), mode="edge")
    return u, v, w


def fill_velocity_halos(u: jnp.ndarray, v: jnp.ndarray, w: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Overwrite the physical-edge halos of solver-layout arrays with the
    edge-copy rule (fill_halo_ijk's MPI_PROC_NULL branch)."""
    u = u.at[:, 0, :].set(u[:, 1, :])
    u = u.at[:, -1, :].set(u[:, -2, :])
    v = v.at[:, :, 0].set(v[:, :, 1])
    v = v.at[:, :, -1].set(v[:, :, -2])
    for ax in (1, 2):
        w = w.at[(slice(None),) * ax + (0,)].set(
            w[(slice(None),) * ax + (1,)])
        w = w.at[(slice(None),) * ax + (-1,)].set(
            w[(slice(None),) * ax + (-2,)])
    return u, v, w
