"""Bisect the EXPERIMENTAL packed fused sweep (ops/pallas/sweep_packed).

The v3 packed-stream kernel measured 24.6 ms/sweep at CUC level 0 f32 —
3x its traffic model.  This times (a) ONLY the per-sweep state+rhs
packing (XLA), (b) ONLY the pallas kernel on prebuilt packed inputs, to
locate the regression.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/micro_packed_parts.py
"""

import json
import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    from mgroms_tpu.ops.relax_compact import (_TKEYS, build_compact_pack,
                                              extend_quads, split_quads)
    from mgroms_tpu.ops.pallas import sweep_packed as sf
    from mgroms_tpu.utils.timing import time_device_fn

    nz = int(os.environ.get("MS_NZ", 64))
    ny = int(os.environ.get("MS_NY", 1024))
    nx = int(os.environ.get("MS_NX", 1024))
    dt = jnp.float32
    key = jax.random.PRNGKey(0)

    def arr(*shape):
        nonlocal key
        key, k = jax.random.split(key)
        return jax.random.uniform(k, shape, dt, 0.5, 1.5)

    cA = arr(8, nz, ny + 2, nx + 2) * 0.1
    cA = cA.at[0].add(-4.0)
    real = True

    pack = jax.block_until_ready(
        jax.jit(lambda c: build_compact_pack(c, real))(cA))
    sop = jax.block_until_ready(jax.jit(
        lambda c, p: sf.build_sweep_operator(c, p, nz, ny // 2, nx // 2)
    )(cA, pack))
    print(json.dumps({"plan": str(sop.plan)}), flush=True)
    q = split_quads(arr(nz, ny, nx))
    bq = split_quads(arr(nz, ny, nx))
    slimpiv = (pack.bet, pack.gam, pack.ud)
    del cA, pack

    plan = sop.plan
    tj, C = plan.tj, plan.nchunks
    H, W = ny // 2, nx // 2
    Wc = W // C
    ntiles = H // tj

    def pack_state(q):
        e = extend_quads(q)
        out = []
        for c in range(C):
            sl = [sf._pad_rows(sf._pad_cols(e[t], 1), 1, H + 4)[
                :, :, c * Wc: c * Wc + Wc + 4] for t in _TKEYS]
            out.append(sf._tile_pack(sl, ntiles, tj, tj + 4))
        return tuple(out)

    # (a) packing only
    def step_pack(c):
        q, psts = c
        psts = pack_state(q)
        # feed back: perturb q from psts so the loop body chains
        q = {t: q[t] + psts[0][0, _TKEYS.index(t) * nz, 0, 0] * 1e-30
             for t in _TKEYS}
        return (q, psts)

    psts0 = pack_state(q)
    t = time_device_fn(step_pack, (q, psts0), iters=10)
    print(json.dumps({"state_pack_ms": round(t * 1e3, 2)}), flush=True)

    # rhs packing once (per call in prod)
    bq_full = [sf._pad_rows(bq[t], 1, H + 2) for t in sf._PTARGETS]
    pbq_c, pqs_c = [], []
    for c in range(C):
        sl = [x[:, :, c * Wc: (c + 1) * Wc] for x in bq_full]
        pbq_c.append(sf._tile_pack(sl, ntiles, tj, tj + 2))
        se = []
        for t in sf._COLOR0:
            x = sf._pad_cols(sf._pad_rows(bq[t], 1, H + 2), 1)
            se.append(jnp.concatenate(
                [x[:, :, c * Wc: c * Wc + 1],
                 x[:, :, c * Wc + Wc + 1: c * Wc + Wc + 2]], axis=2))
        pqs_c.append(sf._tile_pack(se, ntiles, tj, tj + 2))
    pbq_c, pqs_c = jax.block_until_ready((tuple(pbq_c), tuple(pqs_c)))

    # (b) kernel only, prebuilt packed state
    def step_kern(c):
        psts, outs = c
        parts = []
        for ch in range(C):
            parts.append(sf._sweep_chunk(
                psts[ch], sop.pband[ch], sop.ppiv[ch], sop.pseam[ch],
                pbq_c[ch], pqs_c[ch], plan, nz, real,
                (ch == 0, ch == C - 1)))
        if C == 1:
            outs2 = parts[0]
        else:
            outs2 = tuple(jnp.concatenate(
                [parts[ch][m] for ch in range(C)], axis=2)
                for m in range(4))
        # chain
        psts = tuple(p + outs2[0][0, 0, 0] * 1e-30 for p in psts)
        return (psts, outs2)

    outs0 = tuple(jnp.zeros((nz, H, Wc * C), dt) for _ in range(4))
    # NB: sop/pbq ride in the closure here — acceptable for a one-off
    # micro (they are device arrays, jit treats closed-over arrays as
    # constants only when hashable; jax.Array closures become captured
    # constants via jit... keep them as explicit args instead
    def step_kern_args(c):
        psts, outs, pband, ppiv, pseam, pbqs, pqss = c
        parts = []
        for ch in range(C):
            parts.append(sf._sweep_chunk(
                psts[ch], pband[ch], ppiv[ch], pseam[ch],
                pbqs[ch], pqss[ch], plan, nz, real,
                (ch == 0, ch == C - 1)))
        if C == 1:
            outs2 = parts[0]
        else:
            outs2 = tuple(jnp.concatenate(
                [parts[ch][m] for ch in range(C)], axis=2)
                for m in range(4))
        psts = tuple(p + outs2[0][0, 0, 0] * 1e-30 for p in psts)
        return (psts, outs2, pband, ppiv, pseam, pbqs, pqss)

    carry = (psts0, outs0, sop.pband, sop.ppiv, sop.pseam, pbq_c, pqs_c)
    t = time_device_fn(step_kern_args, carry, iters=10)
    print(json.dumps({"kernel_only_ms": round(t * 1e3, 2)}), flush=True)

    # (c) concat-outputs only (the per-sweep x-concat of 4 quads)
    def step_cat(c):
        parts, y = c
        outs2 = tuple(jnp.concatenate(
            [parts[ch][m] for ch in range(C)], axis=2) for m in range(4))
        parts = tuple(tuple(pp + outs2[0][0, 0, 0] * 1e-30 for pp in p)
                      for p in parts)
        return (parts, outs2)

    if C > 1:
        parts0 = tuple(tuple(jnp.zeros((nz, H, Wc), dt) for _ in range(4))
                       for _ in range(C))
        t = time_device_fn(step_cat, (parts0, outs0), iters=10)
        print(json.dumps({"out_concat_ms": round(t * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
