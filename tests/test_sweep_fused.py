"""Color-fused sweep kernel vs the XLA quad-compact smoother.

The fused kernel recomputes a one-row overhang of color 0 per tile and
feeds color 1 from in-VMEM values; these tests pin that the iterates match
the XLA relax_compact_quads path to 1 ulp (same terms, same order, same
factored Thomas — the residual difference is FMA contraction, which XLA
chooses independently per program) across tile boundaries, domain edges,
both cmatrix flavours, and multiple sweeps — in Pallas interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgroms_tpu.ops.relax_compact import (
    QuadField, build_compact_pack, relax_compact_quads, split_quads)
from mgroms_tpu.ops.pallas.sweep_fused import (
    build_sweep_operator, relax_fused_sweep)


def _random_problem(nz, ny, nx, seed=0, dtype=jnp.float64):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 3)
    # SPD-ish synthetic bands: strong diagonal, small couplings (the kernel
    # is a linear pass — any band data pins the arithmetic)
    cA = jax.random.uniform(ks[0], (8, nz, ny + 2, nx + 2), dtype,
                            -0.1, 0.1)
    cA = cA.at[0].add(-4.0)             # diagonal
    p = jax.random.normal(ks[1], (nz, ny, nx), dtype)
    b = jax.random.normal(ks[2], (nz, ny, nx), dtype)
    return cA, p, b


@pytest.mark.parametrize("real_matrix", [True, False])
@pytest.mark.parametrize("nsweeps", [1, 3])
def test_fused_sweep_bitwise_matches_xla(real_matrix, nsweeps):
    nz, ny, nx = 5, 32, 32              # H=16 -> 2 j-tiles at tj=8
    cA, p, b = _random_problem(nz, ny, nx)
    pack = build_compact_pack(cA, real_matrix)
    H, W = ny // 2, nx // 2
    sop = build_sweep_operator(cA, pack, nz, H, W)
    assert sop is not None and H % sop.tj == 0
    pack = pack._replace(sweep=sop)

    q0, bq = split_quads(p), split_quads(b)
    ref = relax_compact_quads(q0, bq, pack, nsweeps, "RB", real_matrix)
    out = relax_fused_sweep(q0, bq, pack, nsweeps, real_matrix,
                            interpret=True)
    for t in ref:
        np.testing.assert_allclose(np.asarray(ref[t]), np.asarray(out[t]),
                                   rtol=1e-13, atol=1e-13)


def test_fused_sweep_single_tile_grid():
    """H == tj: one tile, first and last fixes both active."""
    nz, ny, nx = 4, 16, 48
    cA, p, b = _random_problem(nz, ny, nx, seed=3)
    pack = build_compact_pack(cA, True)
    pack = pack._replace(sweep=build_sweep_operator(
        cA, pack, nz, ny // 2, nx // 2))
    q0, bq = split_quads(p), split_quads(b)
    ref = relax_compact_quads(q0, bq, pack, 2, "RB", True)
    out = relax_fused_sweep(q0, bq, pack, 2, True, interpret=True)
    for t in ref:
        np.testing.assert_allclose(np.asarray(ref[t]), np.asarray(out[t]),
                                   rtol=1e-13, atol=1e-13)


def test_fused_sweep_bf16_bands_match_rounded_xla():
    """bf16 band storage: the kernel matches (to f32 FMA noise) an XLA
    path whose gather bands were rounded identically (the upcast multiply
    is exact); the tridiag factors stay at state precision."""
    nz, ny, nx = 4, 32, 32
    dtype = jnp.float32
    cA, p, b = _random_problem(nz, ny, nx, seed=5, dtype=dtype)
    # round gather bands (3..8) to bf16 in the reference operator too
    cA_r = cA.at[2:].set(
        cA[2:].astype(jnp.bfloat16).astype(dtype))
    pack_r = build_compact_pack(cA_r, True)
    pack_r = pack_r._replace(sweep=build_sweep_operator(
        cA, pack_r, nz, ny // 2, nx // 2, band_dtype=jnp.bfloat16))
    q0, bq = split_quads(p.astype(dtype)), split_quads(b.astype(dtype))
    ref = relax_compact_quads(q0, bq, pack_r, 1, "RB", True)
    out = relax_fused_sweep(q0, bq, pack_r, 1, True, interpret=True)
    for t in ref:
        np.testing.assert_allclose(np.asarray(ref[t]), np.asarray(out[t]),
                                   rtol=2e-5, atol=2e-5)


def test_solver_uses_fused_sweep_and_converges():
    """End-to-end: the single-device backend picks the fused-sweep kernel
    on quad-persistent levels (pallas_interpret exercises the TPU path on
    CPU) and the solve matches the default path's history."""
    from mgroms_tpu import NHModel, SolverConfig
    from mgroms_tpu.cases.seamount import initial_velocities, setup_seamount

    def run(**kw):
        m = NHModel(16, 16, 16, cfg=SolverConfig(**kw))
        c = setup_seamount(16, 16, 16)
        m.set_matrices(c.dx, c.dy, c.zeta, c.h, hc=c.hc,
                       theta_b=c.theta_b, theta_s=c.theta_s)
        u, v, w = initial_velocities(16, 16, 16)
        return m, m.solve(u, v, w)

    m1, (_, _, _, p1, info1) = run(pallas_interpret=True)
    assert any(getattr(pk, "sweep", None) is not None
               for pk in m1.backend.packs), "fused sweep never built"
    m0, (_, _, _, p0, info0) = run()
    assert all(pk is None or pk.sweep is None for pk in m0.backend.packs)
    assert info1.niter == info0.niter
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                               rtol=1e-8, atol=1e-8)
