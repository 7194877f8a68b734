"""Tiled Pallas kernels == their jnp references (interpret mode on CPU).

TPU-hardware numerics are additionally validated by the ad-hoc scripts in
scripts/ (the kernels are TPU-gated in the backend; on CPU the solver
never selects them, so these interpret-mode checks are the CI coverage).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mgroms_tpu import NHModel, SolverConfig
from mgroms_tpu.bc import extend_h1
from mgroms_tpu.cases.seamount import setup_seamount
from mgroms_tpu.ops import stencil
from mgroms_tpu.ops.relax_compact import relax_compact
from mgroms_tpu.ops.pallas.relax_tiled import relax_compact_tiled
from mgroms_tpu.ops.pallas.stencil_tiled import residual_tiled


def _operator(nx, ny, nz):
    m = NHModel(nx, ny, nz, cfg=SolverConfig())
    c = setup_seamount(nx, ny, nz)
    m.set_matrices(c.dx, c.dy, c.zeta, c.h, hc=c.hc,
                   theta_b=c.theta_b, theta_s=c.theta_s)
    return m.ops[0].cA


def test_residual_tiled_matches_stencil():
    nz, ny, nx = 8, 32, 64
    cA = _operator(nx, ny, nz)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((nz, ny, nx)))
    b = jnp.asarray(rng.standard_normal((nz, ny, nx)))
    want = stencil.residual(extend_h1(p), b, cA, True)
    got = residual_tiled(extend_h1(p), b, cA, True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-10)


def test_relax_tiled_matches_compact():
    nz, ny, nx = 8, 32, 64
    cA = _operator(nx, ny, nz)
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.standard_normal((nz, ny, nx)))
    b = jnp.asarray(rng.standard_normal((nz, ny, nx)))
    for kind in ("RB", "FC"):
        want = relax_compact(p, b, cA, 2, kind, True)
        got = relax_compact_tiled(p, b, cA, 2, kind, True, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-13, atol=1e-13)


def test_thomas_unrolled_matches_scan():
    from mgroms_tpu.ops.pallas.relax_tiled import _thomas_unrolled
    from mgroms_tpu.ops.relax import tridiag
    rng = np.random.default_rng(2)
    for nz in (1, 2, 8, 64):
        d = jnp.asarray(rng.uniform(2.0, 3.0, (nz, 4, 8)))
        ud = jnp.asarray(rng.uniform(-1.0, -0.5, (max(nz - 1, 0), 4, 8)))
        b = jnp.asarray(rng.standard_normal((nz, 4, 8)))
        np.testing.assert_allclose(np.asarray(_thomas_unrolled(d, ud, b)),
                                   np.asarray(tridiag(d, ud, b)),
                                   rtol=1e-13, atol=1e-14)
