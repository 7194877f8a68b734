"""One-off: cost structure of the tiled color-update kernel at CUC level-0
shapes (synthetic operator data — timing only depends on shapes).

Separates DMA from compute hypotheses: real vs base key count (traffic
-12%, compute -25% of gather), tj=8 vs 16 (window junk 2x -> 1.5x).

Usage: PYTHONPATH=/root/.axon_site:. python scripts/micro_relax_kernel.py
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    from mgroms_tpu.ops.pallas import relax_tiled as rt
    from mgroms_tpu.ops.relax_compact import gather_keys
    from mgroms_tpu.utils.timing import time_device_fn

    nz, H, W = 64, 512, 512
    dt = jnp.float32
    key = jax.random.PRNGKey(0)

    def arr(*shape):
        nonlocal key
        key, k = jax.random.split(key)
        return jax.random.uniform(k, shape, dt, 0.5, 1.5)

    rows = {}

    def run(name, real_matrix, iters=30):
        nkeys = len(gather_keys(real_matrix))
        blocks = arr(nz, H, nkeys * W)   # wide lane-concatenated form
        ud, bet, gam = arr(nz - 1, H, W), arr(nz, H, W), arr(nz - 1, H, W)
        bq = arr(nz, H, W)
        e3 = tuple(arr(nz, H + 2, W + 2) for _ in range(3))

        def step(c):
            e3_, bq_, blocks_, ud_, bet_, gam_ = c
            out = rt.color_update_tiled(e3_, bq_, blocks_, ud_, bet_, gam_,
                                        (0, 0), real_matrix)
            # feed output back so the loop body isn't hoisted (one-element
            # in-place update, free inside the loop)
            e3n = (e3_[0].at[0, 0, 0].set(out[0, 0, 0]),) + e3_[1:]
            return (e3n, bq_, blocks_, ud_, bet_, gam_)

        c0 = (e3, bq, blocks, ud, bet, gam)
        rows[name] = round(
            time_device_fn(step, c0, iters=iters) * 1e3, 3)
        print(json.dumps({name: rows[name]}), flush=True)

    import os
    if os.environ.get("MICRO_BASE", "1") != "0":
        run("update_real", True)
        run("update_base", False)

        # tj=16: shrink window junk from 2x to 1.5x (budget raised)
        rt._PICK_BUDGET = 124 * 1024 * 1024
        run("update_real_tj16", True)
        rt._PICK_BUDGET = 100 * 1024 * 1024

    # compute/DMA split diagnostics (monkeypatched gather — recompiles):
    import mgroms_tpu.ops.relax_compact as rc
    base_terms, qread = rc._BASE_TERMS, rc._qread

    # (a) 4 gather terms instead of 12: traffic -35%, gather compute -66%
    rc._BASE_TERMS = base_terms[:4]
    run("update_4terms", False)
    rc._BASE_TERMS = base_terms

    # (b) no x-shifted reads (lane rotations): same traffic and quad keys,
    # but every intra-quad column shift clamped to 0 (aligned lane reads)
    def qread_nox(e, a, b, dj, di, dk=0):
        a2, b2 = (a + dj) % 2, (b + di) % 2
        rj = (a + dj - a2) // 2
        x = e[(a2, b2)]
        H, W = x.shape[-2] - 2, x.shape[-1] - 2
        return rc._kshift(x[:, 1 + rj:1 + rj + H, 1:1 + W], dk)
    rc._qread = qread_nox
    rt.color_update_tiled.clear_cache()   # same static signature as above
    run("update_noxshift", True)

    # (c) fully aligned reads (no lane OR sublane shifts): isolates the
    # total in-VMEM shuffle cost of the stencil reads
    def qread_aligned(e, a, b, dj, di, dk=0):
        a2, b2 = (a + dj) % 2, (b + di) % 2
        x = e[(a2, b2)]
        H, W = x.shape[-2] - 2, x.shape[-1] - 2
        return rc._kshift(x[:, 1:1 + H, 1:1 + W], dk)
    rc._qread = qread_aligned
    rt.color_update_tiled.clear_cache()
    run("update_aligned", True)
    rc._qread = qread
    rt.color_update_tiled.clear_cache()

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
