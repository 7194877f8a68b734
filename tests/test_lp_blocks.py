"""Low-precision (bf16) smoother blocks for the tiled/XLA compact paths.

Round-5 probe: the tiled color update is ~91% input-DMA-bound with the
wide gather-block stream dominating, so storing the SMOOTHER's blocks in
bfloat16 halves the dominant stream.  Convergence safety reuses the
round-4 machinery: row-sum-consistent rebuilt pivots
(sweep_fused.consistent_pivots) + defect-correction outer form
(solver.cycle_step).  Residual paths keep the true f32 operator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgroms_tpu.ops.relax_compact import (
    _TKEYS, attach_lp, build_compact_pack, gather_blocks, block_views,
    relax_compact_quads, split_quads)


def _problem(nz, ny, nx, seed=0, dtype=jnp.float32):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 3)
    cA = jax.random.uniform(ks[0], (8, nz, ny + 2, nx + 2), dtype,
                            -0.1, 0.1)
    cA = cA.at[0].add(-4.0)
    p = jax.random.normal(ks[1], (nz, ny, nx), dtype)
    b = jax.random.normal(ks[2], (nz, ny, nx), dtype)
    return cA, p, b


@pytest.mark.parametrize("real_matrix", [True, False])
def test_attach_lp_preserves_row_sums(real_matrix):
    """A'·1 == A·1: the rebuilt diagonal compensates the block rounding
    exactly (the property whose violation collapsed convergence in the
    round-3 negative result)."""
    cA, _, _ = _problem(6, 8, 10, dtype=jnp.float32)
    pack = build_compact_pack(cA, real_matrix)
    packl = attach_lp(pack)
    for m, (a, b) in enumerate(_TKEYS):
        nz, H, W = pack.d[m].shape
        ones = jnp.ones((nz, H + 2, W + 2), jnp.float32)
        e1 = {t: ones for t in _TKEYS}
        g = gather_blocks(e1, block_views(pack, m), a, b, real_matrix)
        g_lp = gather_blocks(
            e1, tuple(v.astype(jnp.float32)
                      for v in block_views(packl, m, lp=True)),
            a, b, real_matrix)
        # d' = 1/bet'[0] at the surface (no vertical term from below)
        d2_0 = 1.0 / packl.lp[2][m][0]
        np.testing.assert_allclose(np.asarray(d2_0 + g_lp[0]),
                                   np.asarray(pack.d[m][0] + g[0]),
                                   rtol=2e-6, atol=2e-6)


def test_lp_tiled_interpret_matches_xla():
    """The tiled kernel reading bf16 blocks (interpret mode) matches the
    XLA compact path on the same lp pack."""
    from mgroms_tpu.ops.pallas.relax_tiled import relax_compact_tiled_quads
    # quads must be >= 16 rows: bf16 blocks need a 16-row tile (smaller
    # shapes silently fall back to the f32 operator)
    cA, p, b = _problem(4, 32, 32, seed=2, dtype=jnp.float32)
    pack = attach_lp(build_compact_pack(cA, True))
    q0, bq = split_quads(p), split_quads(b)
    q_x = relax_compact_quads(q0, bq, pack, 2, "RB", True)
    q_t = relax_compact_tiled_quads(q0, bq, pack, 2, "RB", True,
                                    interpret=True)
    for t in _TKEYS:
        np.testing.assert_allclose(np.asarray(q_t[t]), np.asarray(q_x[t]),
                                   rtol=1e-5, atol=1e-6)


def test_solver_f32_lp_blocks_converge_like_f32():
    """End-to-end f32 solve with fused_bands_bf16 (lp blocks on the
    XLA compact path + defect-correction outer loop) converges to the
    same tolerance in at most one extra cycle."""
    from mgroms_tpu import NHModel, SolverConfig
    from mgroms_tpu.cases.seamount import initial_velocities, setup_seamount

    def run(**kw):
        m = NHModel(16, 16, 8, cfg=SolverConfig(dtype="float32", **kw))
        c = setup_seamount(16, 16, 8, dtype=jnp.float32)
        m.set_matrices(c.dx, c.dy, c.zeta, c.h, hc=c.hc,
                       theta_b=c.theta_b, theta_s=c.theta_s)
        u, v, w = initial_velocities(16, 16, 8, dtype=jnp.float32)
        b = m.rhs(u, v, w)
        p, info = m.pressure_solve(b, tol=3e-5, maxiter=12)
        return info

    i_lp = run(fused_bands_bf16=True)
    i_f32 = run()
    assert i_f32.res <= 3e-5
    assert i_lp.res <= 3e-5
    assert i_lp.niter <= i_f32.niter + 1


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
