"""Round-5 roofline decomposition of the CUC level-0 smoother kernel.

VERDICT r4 weak #4: the "VPU-compute-bound" conclusion was asserted from
a perf-neutral DMA change, never accounted.  This script measures the
decomposition directly on hardware:

  1. `update_real`     — the shipping tiled color-update kernel.
  2. `dma_only_*`      — the SAME pallas_call signatures with a trivial
     body (copy bq -> out): pure input-pipeline time, no gather/Thomas.
     Variants stream all inputs / only the 3 Element state windows /
     only the wide block stream.  With double-buffering the real kernel
     runs at ~max(dma, compute), so comparing T_full against T_dma
     decides DMA- vs compute-bound without a flop model.
  3. `vpu_fma_gflops`  — a pure-FMA Pallas kernel on a VMEM-resident
     block (8 independent accumulator chains to cover FMA latency):
     the empirical VPU ceiling the compute side is judged against.
  4. `gather_flops_est`— analytic: FMA count of one color update, turned
     into an implied "pure-flop" time at the measured VPU rate.
  5. `mxu_dot16`       — the (points x 16) . (16) contraction form of
     the gather (VERDICT item 1) as an XLA dot_general, against the
     elementwise multiply-add form on identical data: there is no
     stationary operand, so the MXU cannot help; this records the
     measured cost of trying.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/micro_roofline.py
"""

import functools
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_z = np.int32(0)


def main():
    from mgroms_tpu.ops.pallas import relax_tiled as rt
    from mgroms_tpu.ops.relax_compact import gather_keys
    from mgroms_tpu.utils.timing import time_device_fn

    nz, H, W = 64, 512, 512
    dt = jnp.float32
    key = jax.random.PRNGKey(0)
    rows = {}

    def arr(*shape):
        nonlocal key
        key, k = jax.random.split(key)
        return jax.random.uniform(k, shape, dt, 0.5, 1.5)

    def emit(name, val):
        rows[name] = val
        print(json.dumps({name: val}), flush=True)

    real = True
    nkeys = len(gather_keys(False))          # 12 wide base keys
    blocks = arr(nz, H, nkeys * W)
    rb = arr(1, H, 2 * W)                    # single-plane real-only pair
    ud, bet, gam = arr(nz - 1, H, W), arr(nz, H, W), arr(nz - 1, H, W)
    bq = arr(nz, H, W)
    e3 = tuple(arr(nz, H + 2, W + 2) for _ in range(3))

    # ALL operator arrays ride in the timing carry: a closed-over array
    # becomes a multi-MB HLO constant and the remote compile never
    # finishes (CLAUDE.md; the first run of this script died that way)
    opc = (blocks, ud, bet, gam, rb)

    # -- 1. the real kernel ------------------------------------------------
    def step_full(c):
        e3_, bq_, (blocks_, ud_, bet_, gam_, rb_) = c
        out = rt.color_update_tiled(e3_, bq_, blocks_, ud_, bet_,
                                    (0, 0), real, rb_t=rb_)
        e3n = (e3_[0].at[0, 0, 0].set(out[0, 0, 0]),) + e3_[1:]
        return (e3n, bq_, (blocks_, ud_, bet_, gam_, rb_))

    emit("update_real_ms",
         round(time_device_fn(step_full, (e3, bq, opc), iters=30) * 1e3,
               3))

    # -- 2. DMA-only variants ----------------------------------------------
    tj = rt._pick_tj(H, nz, W, nkeys, 4)
    wpad = rt._roundup8(tj + 2)
    extra = (H - tj + wpad) - (H + 2)

    def win_spec():
        return pl.BlockSpec((pl.Element(nz), pl.Element(wpad),
                             pl.Element(W + 2)),
                            lambda i: (_z, i * tj, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(2))

    def blk_spec(lead):
        return pl.BlockSpec((lead, tj, W), lambda i: (_z, i, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(2))

    def wide_spec():
        return pl.BlockSpec((nz, tj, nkeys * W), lambda i: (_z, i, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(2))

    bq_spec = pl.BlockSpec((nz, tj, W), lambda i: (_z, i, _z),
                           memory_space=pltpu.VMEM)

    def copy_kernel(*refs):
        # touch ONE sublane/lane of every input so no stream can be
        # dead-code-eliminated, while adding negligible compute
        acc = refs[-2][:]
        for r in refs[:-2]:
            acc = acc.at[0:1, 0:1, 0:1].add(r[0:1, 0:1, 0:1])
        refs[-1][:] = acc

    e3p = tuple(rt._pad_rows(x, extra, 1) for x in e3)

    @functools.partial(jax.jit, static_argnames=("which",))
    def dma_only(e3_, bq_, blocks_, ud_, bet_, gam_, which):
        if which == "all":
            ins = ([win_spec() for _ in range(3)] + [wide_spec()]
                   + [blk_spec(nz - 1), blk_spec(nz), blk_spec(nz - 1),
                      bq_spec])
            ops = (*e3_, blocks_, ud_, bet_, gam_, bq_)
        elif which == "windows":
            ins = [win_spec() for _ in range(3)] + [bq_spec]
            ops = (*e3_, bq_)
        else:   # blocks
            ins = [wide_spec(), bq_spec]
            ops = (blocks_, bq_)
        return pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct((nz, H, W), dt),
            grid=(H // tj,),
            in_specs=ins,
            out_specs=pl.BlockSpec((nz, tj, W), lambda i: (_z, i, _z),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=rt.VMEM_LIMIT),
        )(*ops)

    for which in ("all", "windows", "blocks"):
        def step(c, which=which):
            e3_, bq_, (blocks_, ud_, bet_, gam_, rb_) = c
            out = dma_only(e3_, bq_, blocks_, ud_, bet_, gam_, which)
            e3n = (e3_[0].at[0, 0, 0].set(out[0, 0, 0]),) + e3_[1:]
            return (e3n, bq_, (blocks_, ud_, bet_, gam_, rb_))
        emit(f"dma_only_{which}_ms",
             round(time_device_fn(step, (e3p, bq, opc), iters=30) * 1e3,
                   3))

    # bytes per color update, for effective-rate context
    win_bytes = 3 * nz * (H + 2 + extra) * (W + 2) * 4
    blk_bytes = nz * H * nkeys * W * 4
    piv_bytes = (3 * nz - 2) * H * W * 4 + nz * H * W * 4  # ud+bet+gam+bq
    emit("bytes_windows_mb", round(win_bytes / 1e6, 1))
    emit("bytes_blocks_mb", round(blk_bytes / 1e6, 1))
    emit("bytes_pivots_mb", round(piv_bytes / 1e6, 1))

    # -- 2b. fused-residual piece costs (round-5 wiring diagnosis) ---------
    # emit kernel vs plain color update, the XLA patch+zsum epilogue, and
    # one fresh XLA target residual: where the fused rr's time goes.
    from mgroms_tpu.ops.relax_compact import (CompactPack,
                                              _patch_emitted_residual,
                                              _residual_one, extend_quads,
                                              wide_slices)

    d_blk = arr(nz, H, W)
    pack1 = CompactPack(blocks=(blocks,) * 4, d=(d_blk,) * 4,
                        ud=(ud,) * 4, bet=(bet,) * 4, gam=(gam,) * 4,
                        real_matrix=real, rblocks=(rb,) * 4)

    def step_emit(c):
        e3_, bq_, (blocks_, ud_, bet_, gam_, rb_, d_) = c
        sol, res = rt.color_update_tiled_emit(e3_, bq_, blocks_, ud_, bet_,
                                              d_, (0, 0), real,
                                              rb_t=rb_)
        e3n = (e3_[0].at[0, 0, 0].set(sol[0, 0, 0] + res[0, 0, 0]),) \
            + e3_[1:]
        return (e3n, bq_, (blocks_, ud_, bet_, gam_, rb_, d_))

    emit("update_emit_ms",
         round(time_device_fn(step_emit, (e3, bq, opc + (d_blk,)),
                              iters=30) * 1e3, 3))

    q4 = {t: arr(nz, H, W) for t in
          ((0, 0), (0, 1), (1, 0), (1, 1))}

    from mgroms_tpu.ops.relax_compact import _patched_zsum

    @jax.jit
    def epilogue(q, bq_, r_raw, pk):
        e2 = extend_quads(q)
        r = _patch_emitted_residual(e2, bq_, pk, 1, (0, 1), real, r_raw)
        return r[0::2] + r[1::2]

    @jax.jit
    def epilogue_zfirst(q, bq_, r_raw, pk):
        e2 = extend_quads(q)
        return _patched_zsum(e2, bq_, pk, 1, (0, 1), real, r_raw)

    r_raw0 = arr(nz, H, W)
    for name, fn in (("patch_zsum_epilogue_ms", epilogue),
                     ("patch_zsum_zfirst_ms", epilogue_zfirst)):
        def step_epi(c, fn=fn):
            q, bq_, r_raw, pk = c
            out = fn(q, bq_, r_raw, pk)
            r2 = r_raw.at[0, 0, 0].set(out[0, 0, 0])
            return (q, bq_, r2, pk)
        emit(name,
             round(time_device_fn(step_epi, (q4, bq, r_raw0, pack1),
                                  iters=30) * 1e3, 3))

    @jax.jit
    def fresh_one(q, bq_, pk):
        e2 = extend_quads(q)
        return _residual_one(e2, bq_, pk, 0, (0, 0), real)

    def step_fresh(c):
        q, bq_, pk = c
        out = fresh_one(q, bq_, pk)
        q2 = dict(q)
        q2[(0, 0)] = q[(0, 0)].at[0, 0, 0].set(out[0, 0, 0])
        return (q2, bq_, pk)

    emit("fresh_residual_one_target_ms",
         round(time_device_fn(step_fresh, (q4, bq, pack1), iters=30) * 1e3,
               3))

    def step_rr_one(c):
        q, bq_, (blocks_, ud_, bet_, gam_, rb_, d_) = c
        e2 = extend_quads(q)
        e4 = tuple(e2[k] for k in ((0, 0), (0, 1), (1, 0), (1, 1)))
        out = rt._rr_one(e4, bq_, blocks_, d_, ud_, (0, 0), real, rb_t=rb_)
        q2 = dict(q)
        q2[(0, 0)] = q[(0, 0)].at[0, 0, 0].set(out[0, 0, 0])
        return (q2, bq_, (blocks_, ud_, bet_, gam_, rb_, d_))

    emit("rr_one_target_ms",
         round(time_device_fn(step_rr_one, (q4, bq, opc + (d_blk,)),
                              iters=30) * 1e3, 3))

    # -- 3. empirical VPU FMA ceiling --------------------------------------
    NCH, REPS = 8, 64           # independent chains x chained FMAs
    bz, bj, bw = 8, 8, 512

    def fma_kernel(x_ref, o_ref):
        x = x_ref[:]
        accs = [x * (1.0 + 0.001 * i) for i in range(NCH)]
        for _ in range(REPS):
            for i in range(NCH):
                accs[i] = accs[i] * 1.000001 + x
        s = accs[0]
        for i in range(1, NCH):
            s = s + accs[i]
        o_ref[:] = s

    NTILE = 256
    x0 = arr(bz, bj, bw)

    @jax.jit
    def fma_run(x):
        return pl.pallas_call(
            fma_kernel,
            out_shape=jax.ShapeDtypeStruct((bz, bj, bw), dt),
            grid=(NTILE,),
            in_specs=[pl.BlockSpec((bz, bj, bw), lambda i: (_z, _z, _z),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bz, bj, bw), lambda i: (_z, _z, _z),
                                   memory_space=pltpu.VMEM),
        )(x)

    def step_fma(c):
        (x,) = c
        out = fma_run(x)
        return (x.at[0, 0, 0].set(out[0, 0, 0]),)

    t = time_device_fn(step_fma, (x0,), iters=20)
    flops = 2.0 * NCH * REPS * NTILE * bz * bj * bw   # FMA = 2 flop
    emit("vpu_fma_gflops", round(flops / t / 1e9, 1))

    # -- 4. analytic flop count of one color update ------------------------
    # base gather 12 mul + 11 add, rhs 1, real plane-0 terms ~9/nz,
    # Thomas substitution ~5 -> per-point flops:
    per_point = 12 + 11 + 1 + 5 + 9.0 / nz
    total = per_point * nz * H * W
    emit("gather_flops_per_update_gflop", round(total / 1e9, 3))
    if rows.get("vpu_fma_gflops"):
        emit("implied_pure_flop_ms",
             round(total / (rows["vpu_fma_gflops"] * 1e6), 3))

    # -- 5. the MXU contraction form of the gather -------------------------
    P = nz * H * W // 64
    bl16 = arr(P, 16)
    st16 = arr(P, 16)

    @jax.jit
    def dot_form(b_, s_):
        return jax.lax.dot_general(b_[:, None, :], s_[:, :, None],
                                   (((2,), (1,)), ((0,), (0,))))[:, 0, 0]

    @jax.jit
    def ew_form(b_, s_):
        return jnp.sum(b_ * s_, axis=1)

    for name, fn in (("mxu_dot16_ms", dot_form), ("ew_sum16_ms", ew_form)):
        def step(c, fn=fn):
            b_, s_ = c
            out = fn(b_, s_)
            return (b_.at[0, 0].set(out[0]), s_)
        emit(name, round(time_device_fn(step, (bl16, st16), iters=20) * 1e3,
                         3))

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
