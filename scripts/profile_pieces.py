"""One-off: time individual level-0 pieces at CUC scale on the TPU.

Separates prolong from residual_restrict, measures the quad split/merge
round trip, and the marginal sweep cost (relax(3) - relax(1)) to see how
much of a relax call is per-call overhead.  Everything rides in the carry
(never a closure — see CLAUDE.md on HLO constants).

Usage: PYTHONPATH=/root/.axon_site:. python scripts/profile_pieces.py
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    nx = ny = 1024
    nz = 64
    from mgroms_tpu import NHModel, SolverConfig
    from mgroms_tpu.cases.cuc import setup_cuc_synthetic
    from mgroms_tpu.utils.timing import time_device_fn

    dt = jnp.float32
    case = setup_cuc_synthetic(nx, ny, nz, dtype=dt)
    cfg = SolverConfig(dtype="float32", coarsest="direct")
    m = NHModel(nx, ny, nz, cfg=cfg)
    m.set_matrices(case.dx, case.dy, case.zeta, case.h, hc=case.hc,
                   theta_b=case.theta_b, theta_s=case.theta_s)
    m.offload_metrics()
    be = m.backend

    p = jnp.zeros((nz, ny, nx), dt)
    b = jnp.ones((nz, ny, nx), dt)
    pc = jnp.ones((nz // 2, ny // 2, nx // 2), dt)

    rows = {}

    def t(name, step, carry, iters=10):
        rows[name] = round(time_device_fn(step, carry, iters=iters) * 1e3, 2)
        print(json.dumps({name: rows[name]}), flush=True)

    # fine->coarse via strided slice keeps the carry shape fixed
    t("prolong0", lambda c: (c[0], c[0].prolong(0, c[1])[::2, ::2, ::2]),
      (be, pc))
    t("restrict0", lambda c: (c[0], c[1], c[0].restrict(0, c[1])),
      (be, p, pc))
    t("rr0", lambda c: (c[0], c[1], c[0].residual_restrict(0, c[1], c[1])),
      (be, p, pc))
    t("residual0", lambda c: (c[0], c[0].residual(0, c[1], c[2]), c[2]),
      (be, p, b))
    t("sweep1", lambda c: (c[0], c[0].relax(0, c[1], c[2], 1), c[2]),
      (be, p, b))
    t("sweep3", lambda c: (c[0], c[0].relax(0, c[1], c[2], 3), c[2]),
      (be, p, b), iters=6)

    from mgroms_tpu.ops.relax_compact import merge_quads, split_quads
    t("split_merge", lambda c: (merge_quads(split_quads(c[0])),), (p,))

    rows["marginal_sweep"] = round((rows["sweep3"] - rows["sweep1"]) / 2, 2)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
