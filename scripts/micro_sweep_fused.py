"""One-off: fused-sweep kernel vs the per-color tiled path at CUC level-0
shapes (synthetic operator data — timing depends only on shapes).

Round-4 measured results (one v5e chip, CUC level 0): tiled 12.5-13.4
ms/sweep; fused v2 Element-window chunked 17.0 f32 / 14.3 bf16; fused v3
packed-stream 22.7 f32 — the traffic model's predicted win never
materializes because the fused access patterns run at a lower effective
HBM rate (docs/kernel_dma_notes.md).  Level 1 (MS_NZ=32 MS_NY=512
MS_NX=512): tiled 1.57, packed 2.1.  The script remains the harness for
any future kernel variant.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/micro_sweep_fused.py
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    from mgroms_tpu.ops.relax_compact import (
        _TKEYS, CompactPack, build_compact_pack, relax_compact_quads,
        split_quads)
    from mgroms_tpu.ops.pallas.relax_tiled import relax_compact_tiled_quads
    from mgroms_tpu.ops.pallas.sweep_fused import (
        build_sweep_operator, relax_fused_sweep)
    from mgroms_tpu.utils.timing import time_device_fn

    import os
    nz = int(os.environ.get("MS_NZ", 64))
    ny = int(os.environ.get("MS_NY", 1024))     # CUC level 0 default
    nx = int(os.environ.get("MS_NX", 1024))
    # HBM at CUC scale cannot hold cA + pack + two sweep operators at
    # once; select modes per process (e.g. MS_MODES=tiled,f32 then
    # MS_MODES=bf16)
    modes = os.environ.get("MS_MODES", "tiled,f32,bf16").split(",")
    dt = jnp.float32
    key = jax.random.PRNGKey(0)

    def arr(*shape):
        nonlocal key
        key, k = jax.random.split(key)
        return jax.random.uniform(k, shape, dt, 0.5, 1.5)

    cA = arr(8, nz, ny + 2, nx + 2) * 0.1
    cA = cA.at[0].add(-4.0)
    real = True

    @jax.jit
    def build(cA):
        return build_compact_pack(cA, real)

    pack = jax.block_until_ready(build(cA))
    p, b = arr(nz, ny, nx), arr(nz, ny, nx)

    @jax.jit
    def mk_quads(p, b):
        return split_quads(p), split_quads(b)

    q, bq = jax.block_until_ready(mk_quads(p, b))
    del p, b                      # HBM is the constraint at CUC scale
    rows = {}

    def t(name, step, carry, iters=20):
        rows[name] = round(time_device_fn(step, carry, iters=iters) * 1e3, 2)
        print(json.dumps({name: rows[name]}), flush=True)

    # NB: the pack/sweep operator rides in the CARRY — closed-over operator
    # arrays become HLO constants (4.6 GB here) and wreck remote compiles
    # (CLAUDE.md).  CompactPack is a registered pytree.

    # baseline: the per-color tiled path (2 pallas_calls + extends / sweep)
    def step_tiled(c):
        q, bq, pk = c
        q = relax_compact_tiled_quads(q, bq, pk, 1, "RB", real)
        return (q, bq, pk)

    if "tiled" in modes:
        t("tiled_sweep", step_tiled, (q, bq, pack))

    def step_fused(c):
        q, bq, pk = c
        q = relax_fused_sweep(q, bq, pk, 1, real)
        return (q, bq, pk)

    # correctness spot-check on-device (f32 vs XLA reference path) —
    # defined before the timing loop so it runs while the f32 sweep
    # operator is still alive, then the operator is dropped to make HBM
    # room for the bf16 one (cA + pack + two sweep operators + state do
    # not fit 16 GB together)
    @jax.jit
    def both(q, bq, pack, packs):
        a = relax_compact_quads(q, bq, pack, 1, "RB", real)
        c = relax_fused_sweep(q, bq, packs, 1, real)
        err = max_rel = jnp.float32(0)
        for t_ in _TKEYS:
            d = jnp.max(jnp.abs(a[t_] - c[t_]))
            s = jnp.max(jnp.abs(a[t_]))
            err = jnp.maximum(err, d)
            max_rel = jnp.maximum(max_rel, d / s)
        return err, max_rel

    # the fused path reads pack.bet/gam/ud + the sweep operator only;
    # dropping the persisted gather blocks from its carry keeps the
    # timing honest and frees ~3.7 GB of what the tiled baseline used
    slim = pack._replace(blocks=tuple(() for _ in _TKEYS))

    for bd, label in ((None, "fused_sweep_f32"),
                      (jnp.bfloat16, "fused_sweep_bf16")):
        if label.split("_")[-1] not in modes:
            continue
        @jax.jit
        def build_sop(cA, pack, bd=bd):
            return build_sweep_operator(cA, pack, nz, ny // 2, nx // 2,
                                        band_dtype=bd)

        sop = build_sop(cA, pack)
        if sop is None:
            print(json.dumps({label: "unsupported (VMEM budget)"}),
                  flush=True)
            continue
        packs = slim._replace(sweep=jax.block_until_ready(sop))
        if "check" in modes and bd is None:
            err, rel = both(q, bq, pack, packs)
            print(json.dumps({"max_abs_err": float(err),
                              "max_rel_err": float(rel)}), flush=True)
        if len([m for m in modes if m in ("f32", "bf16")]) == 1 \
                and "check" not in modes and "tiled" not in modes:
            # single-variant run: the band stack and the full pack are
            # build-time-only — freeing them (~6 GB) makes the timing fit
            del cA, pack
        t(label, step_fused, (q, bq, packs))
        del packs, sop
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
