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


@pytest.mark.parametrize("real_matrix", [True, False])
@pytest.mark.parametrize("nchunks", [2, 4])
def test_fused_sweep_chunked_bitwise_matches_xla(real_matrix, nchunks):
    """Lane-chunked plans (the CUC level-0 enabler): color 0 recomputes a
    one-column overhang at chunk seams, so iterates are bitwise independent
    of nchunks — pinned against the XLA quad path across seams, domain
    edges and multiple sweeps."""
    nz, ny, nx = 5, 32, 64              # W=32 -> chunks of 16 / 8
    cA, p, b = _random_problem(nz, ny, nx, seed=7)
    pack = build_compact_pack(cA, real_matrix)
    H, W = ny // 2, nx // 2
    sop = build_sweep_operator(cA, pack, nz, H, W,
                               force_chunks=nchunks, min_chunk=8)
    assert sop is not None and sop.plan.nchunks == nchunks
    pack = pack._replace(sweep=sop)

    q0, bq = split_quads(p), split_quads(b)
    ref = relax_compact_quads(q0, bq, pack, 2, "RB", real_matrix)
    out = relax_fused_sweep(q0, bq, pack, 2, real_matrix, interpret=True)
    for t in ref:
        np.testing.assert_allclose(np.asarray(ref[t]), np.asarray(out[t]),
                                   rtol=1e-13, atol=1e-13)


def test_fused_sweep_cuc_l0_gating_is_measurement_based():
    """CUC level 0 (quads 64x512x512): only CHUNKED plans fit VMEM there.
    Hardware measurement (round 4): chunked full-precision-band plans
    LOSE to the per-color tiled path (17.0 vs 12.6 ms/sweep) — the
    chunked window pattern runs at a much lower effective HBM rate — so
    f32 must NOT take the fused path at L0, while bf16 bands (the
    competitive case) keep their chunked fully-double-buffered plan."""
    from mgroms_tpu.ops.pallas.sweep_fused import _pick_plan, supports
    assert not supports(64, 512, 512, 4, 4)       # f32 bands: tiled wins
    assert supports(64, 512, 512, 4, 2)           # bf16 bands: chunked ok
    plan = _pick_plan(512, 64, 512, 4, 2)
    assert plan.nchunks > 1 and plan.sbuf >= 2 and plan.bbuf >= 2, plan
    # CUC levels 1+ stay on the unchunked fused plans (the round-3 win)
    p1 = _pick_plan(256, 32, 256, 4, 4, force_chunks=1)
    assert p1 is not None and p1.sbuf >= 2, p1


def test_fused_sweep_bf16_bands_match_rounded_xla():
    """bf16 band storage: the kernel matches (to f32 FMA noise) an XLA
    path whose gather bands were rounded identically (the upcast multiply
    is exact) and whose Thomas pivots are the same row-sum-consistent
    rebuilt factors (sweep_fused.consistent_pivots)."""
    nz, ny, nx = 4, 32, 32
    dtype = jnp.float32
    cA, p, b = _random_problem(nz, ny, nx, seed=5, dtype=dtype)
    pack = build_compact_pack(cA, True)
    sop = build_sweep_operator(cA, pack, nz, ny // 2, nx // 2,
                               band_dtype=jnp.bfloat16)
    # XLA image of the same perturbed operator: rounded gather bands
    # (rounding a band then slicing == rounding the persisted blocks)
    # plus the consistent pivots
    from mgroms_tpu.ops.pallas.sweep_fused import consistent_pivots
    bet2, gam2 = consistent_pivots(pack, jnp.bfloat16)
    cA_r = cA.at[2:].set(cA[2:].astype(jnp.bfloat16).astype(dtype))
    pack_r = build_compact_pack(cA_r, True)
    pack_r = pack_r._replace(bet=bet2, gam=gam2)
    pack_f = pack._replace(sweep=sop)
    q0, bq = split_quads(p.astype(dtype)), split_quads(b.astype(dtype))
    ref = relax_compact_quads(q0, bq, pack_r, 1, "RB", True)
    out = relax_fused_sweep(q0, bq, pack_f, 1, True, interpret=True)
    for t in ref:
        np.testing.assert_allclose(np.asarray(ref[t]), np.asarray(out[t]),
                                   rtol=2e-5, atol=2e-5)


def test_consistent_pivots_preserve_row_sums():
    """The low-precision smoother operator A' (rounded gather bands +
    rebuilt diagonal) must satisfy A'·1 == A·1 to f32 roundoff — the
    identity (diag = -(row sum) + surface terms, mg_define_matrix.f90:
    615-657) whose violation caused the round-3 convergence collapse."""
    from mgroms_tpu.ops.relax_compact import gather_blocks, _TKEYS
    from mgroms_tpu.ops.pallas.sweep_fused import consistent_pivots
    from mgroms_tpu.ops.relax import thomas_factor

    nz, ny, nx = 6, 16, 16
    cA, _, _ = _random_problem(nz, ny, nx, seed=11, dtype=jnp.float32)
    pack = build_compact_pack(cA, True)
    bet2, gam2 = consistent_pivots(pack, jnp.bfloat16)
    bd = jnp.bfloat16
    for m, (a, b_) in enumerate(_TKEYS):
        nzq, H, W = pack.d[m].shape
        ones = jnp.ones((nzq, H + 2, W + 2), jnp.float32)
        e1 = {t: ones for t in _TKEYS}
        k0 = (jax.lax.broadcasted_iota(jnp.int32, (nzq, 1, 1), 0) == 0
              ).astype(jnp.float32)
        # recover d' from the returned pivots: bet' = 1/d' at k=0
        d2_k0 = 1.0 / bet2[m][0]
        from mgroms_tpu.ops.relax_compact import block_views
        blks = block_views(pack, m)
        rounded = tuple(x.astype(bd).astype(jnp.float32) for x in blks)
        s_orig = gather_blocks(e1, blks, a, b_, True, k0)
        s_round = gather_blocks(e1, rounded, a, b_, True, k0)
        # row sum at k=0 (no vertical term from below): d + s must match
        np.testing.assert_allclose(
            np.asarray(d2_k0 + s_round[0]),
            np.asarray(pack.d[m][0] + s_orig[0]), rtol=2e-6, atol=2e-6)


def test_solver_bf16_bands_convergence_matches_f32():
    """End-to-end with fused_bands_bf16: the consistent perturbed smoother
    must converge like the f32 one (same iteration count to tolerance +1;
    round 3's inconsistent variant stalled at rel residual ~0.17)."""
    from mgroms_tpu import NHModel, SolverConfig
    from mgroms_tpu.cases.seamount import initial_velocities, setup_seamount

    def run(**kw):
        m = NHModel(16, 16, 16, cfg=SolverConfig(dtype="float32",
                                                 solver_prec=1e-4, **kw))
        c = setup_seamount(16, 16, 16)
        m.set_matrices(c.dx, c.dy, c.zeta, c.h, hc=c.hc,
                       theta_b=c.theta_b, theta_s=c.theta_s)
        u, v, w = initial_velocities(16, 16, 16)
        return m, m.solve(u, v, w)

    m1, (_, _, _, _, info1) = run(pallas_interpret=True,
                                  fused_bands_bf16=True)
    assert any(getattr(pk, "sweep", None) is not None
               and pk.sweep.ebands[0][0].dtype == jnp.bfloat16
               for pk in m1.backend.packs), \
        "low-precision sweep operator never built"
    m0, (_, _, _, _, info0) = run()
    assert info0.res <= 1e-4
    assert info1.res <= 1e-4, (info1.res, info1.history)
    assert info1.niter <= info0.niter + 1, (info1.history, info0.history)


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
