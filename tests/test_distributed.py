"""Distributed-vs-single-device equivalence on a simulated 8-device CPU mesh.

The reference's multi-node test strategy is small MPI runs on one node
(SURVEY.md section 4); ours is the XLA equivalent: an 8-device virtual CPU
mesh, asserting the distributed solve reproduces the single-device iterates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgroms_tpu import NHModel, SolverConfig
from mgroms_tpu.cases.seamount import initial_velocities, setup_seamount
from mgroms_tpu.levels import build_level_plan
from mgroms_tpu.parallel import MeshPlan, make_mesh

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 virtual devices")


def _solve(nx, ny, nz, mesh_shape=None, **cfg_kw):
    m = NHModel(nx, ny, nz, cfg=SolverConfig(**cfg_kw))
    c = setup_seamount(nx, ny, nz)
    m.set_matrices(c.dx, c.dy, c.zeta, c.h, hc=c.hc,
                   theta_b=c.theta_b, theta_s=c.theta_s)
    if mesh_shape is not None:
        m.distribute(*mesh_shape)
    u, v, w = initial_velocities(nx, ny, nz)
    b = m.rhs(u, v, w)
    p, info = m.pressure_solve(b, tol=1e-10, maxiter=12)
    return np.asarray(p), info


@needs8
def test_mesh_plan_deshards_coarse_levels():
    mesh = make_mesh(4, 2)
    levels = build_level_plan(32, 32, 32)
    plan = MeshPlan.create(mesh, levels, nsmall=8)
    # 32/4=8 local at level 0 -> sharded; 16/4=4 < 8 -> replicated below
    assert plan.shards[0].sharded
    assert not plan.shards[1].sharded


@needs8
def test_distributed_matches_single_2x2():
    p1, i1 = _solve(16, 16, 16)
    p2, i2 = _solve(16, 16, 16, mesh_shape=(2, 2))
    assert i2.res <= 1e-10
    np.testing.assert_allclose(p2, p1, rtol=1e-9, atol=1e-9 * np.abs(p1).max())
    # same convergence history to fp round-off (distributed reductions
    # reorder sums, so tiny residuals differ in the last digits)
    np.testing.assert_allclose(i1.history, i2.history, rtol=1e-4)


@needs8
def test_distributed_matches_single_4x2():
    p1, i1 = _solve(32, 16, 8, mesh_shape=None)
    p2, i2 = _solve(32, 16, 8, mesh_shape=(4, 2))
    # this shallow grid (nz=8, 3 levels) converges ~4.7x/cycle
    assert i2.res <= 1e-8
    assert abs(i2.res - i1.res) < 1e-12
    np.testing.assert_allclose(p2, p1, rtol=1e-9, atol=1e-9 * np.abs(p1).max())
