"""Fused Pallas relaxation kernel vs the jnp reference path.

Runs in Pallas interpreter mode on CPU; the same kernel compiles for TPU
(exercised by bench.py / __graft_entry__ on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgroms_tpu import NHModel, SolverConfig
from mgroms_tpu.cases.seamount import initial_velocities, setup_seamount
from mgroms_tpu.ops import relax as relax_ops
from mgroms_tpu.ops.pallas import fits_vmem, fused_relax
from mgroms_tpu.bc import extend_h1


def _setup(nx=16, ny=16, nz=16, dtype="float32"):
    m = NHModel(nx, ny, nz, cfg=SolverConfig(dtype=dtype))
    c = setup_seamount(nx, ny, nz)
    m.set_matrices(c.dx, c.dy, c.zeta, c.h, hc=c.hc,
                   theta_b=c.theta_b, theta_s=c.theta_s)
    u, v, w = initial_velocities(nx, ny, nz, dtype=jnp.dtype(dtype))
    b = m.rhs(u, v, w)
    return m, b


@pytest.mark.parametrize("kind", ["RB", "FC", "GS"])
def test_fused_relax_matches_jnp(kind):
    m, b = _setup()
    cA = m.ops[0].cA
    p0 = jnp.zeros_like(b)
    ref = relax_ops.relax(p0, b, cA, 2, kind, True, extend_fn=extend_h1)
    out = fused_relax(p0, b, cA, 2, kind, True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6 * np.abs(ref).max())


def test_fused_relax_in_solver():
    """use_pallas=True (interpret on CPU) converges like the jnp path."""
    nx = ny = nz = 16
    m = NHModel(nx, ny, nz, cfg=SolverConfig(dtype="float32",
                                             use_pallas=True))
    c = setup_seamount(nx, ny, nz)
    m.set_matrices(c.dx, c.dy, c.zeta, c.h, hc=c.hc,
                   theta_b=c.theta_b, theta_s=c.theta_s)
    u, v, w = initial_velocities(nx, ny, nz, dtype=jnp.float32)
    b = m.rhs(u, v, w)
    p, info = m.pressure_solve(b, tol=5e-5, maxiter=10)
    assert info.res <= 5e-5, info.history


def test_fits_vmem_gate():
    assert fits_vmem(64, 64, 64)
    assert not fits_vmem(64, 1024, 1024)
