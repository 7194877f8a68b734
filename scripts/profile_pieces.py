"""One-off: time individual pieces of the QUAD-PERSISTENT cycle at CUC
scale on the TPU (the post-quad profile: what composes an F-cycle today).

Times the quad-native entry points the V-cycle actually runs on the
compact levels (state in/out as QuadField), the F-cycle-boundary
conversions, the solve_step full residual, and the whole F-cycle — so the
breakdown sums against the end-to-end number.  Everything rides in the
carry (never a closure — see CLAUDE.md on HLO constants).

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
    from mgroms_tpu.ops.relax_compact import QuadField
    from mgroms_tpu.utils.timing import time_device_fn

    dt = jnp.float32
    case = setup_cuc_synthetic(nx, ny, nz, dtype=dt)
    cfg = SolverConfig(dtype="float32", coarsest="direct")
    m = NHModel(nx, ny, nz, cfg=cfg)
    m.set_matrices(case.dx, case.dy, case.zeta, case.h, hc=case.hc,
                   theta_b=case.theta_b, theta_s=case.theta_s)
    m.offload_metrics()
    be = m.backend
    print("state_quads per level:",
          [be.state_quads(l) for l in range(be.nlevs)], flush=True)

    p = jnp.zeros((nz, ny, nx), dt)
    b = jnp.ones((nz, ny, nx), dt)
    pc = jnp.ones((nz // 2, ny // 2, nx // 2), dt)

    @jax.jit
    def mkq(x):
        return QuadField.split(x)

    pq, bq = mkq(p), mkq(b)
    pcq, bcq = mkq(pc), mkq(pc)

    rows = {}

    def t(name, step, carry, iters=10):
        rows[name] = round(time_device_fn(step, carry, iters=iters) * 1e3, 2)
        print(json.dumps({name: rows[name]}), flush=True)

    def feed(s, field):
        """Inject a scalar dependency on the previous iteration's OUTPUT
        into an input (a one-element in-place add, free inside the loop) —
        without it XLA hoists the loop-invariant op out of the timing loop
        and the row reads ~0."""
        if isinstance(field, QuadField):
            qs = list(field.quads)
            qs[0] = qs[0].at[0, 0, 0].add(s * jnp.asarray(1e-38, s.dtype))
            return QuadField(qs)
        return field.at[0, 0, 0].add(s * jnp.asarray(1e-38, s.dtype))

    # -- level 0, quad-native hot ops (what the V-cycle runs) --------------
    t("sweep1_q0", lambda c: (c[0], c[0].relax(0, c[1], c[2], 1), c[2]),
      (be, pq, bq))
    t("sweep3_q0", lambda c: (c[0], c[0].relax(0, c[1], c[2], 3), c[2]),
      (be, pq, bq), iters=6)
    t("rr_q0", lambda c: (c[0], feed(c[3].quads[0][0, 0, 0], c[1]), c[2],
                          c[0].residual_restrict(0, c[1], c[2],
                                                 as_quads=True)),
      (be, pq, bq, pcq))
    t("prolong_q0", lambda c: (c[0], feed(c[2].quads[0][0, 0, 0], c[1]),
                               c[0].prolong(0, c[1], as_quads=True)),
      (be, pcq, pq))
    t("residual_q0", lambda c: (c[0], c[0].residual(0, c[1], c[2]), c[2]),
      (be, pq, bq))

    # -- level 1 (quads are (32, 256, 256)) ---------------------------------
    t("sweep1_q1", lambda c: (c[0], c[0].relax(1, c[1], c[2], 1), c[2]),
      (be, pcq, bcq))
    t("sweep3_q1", lambda c: (c[0], c[0].relax(1, c[1], c[2], 3), c[2]),
      (be, pcq, bcq), iters=6)

    # -- F-cycle boundary + outer-loop pieces -------------------------------
    from mgroms_tpu.ops.relax_compact import merge_quads, split_quads
    t("split_merge0", lambda c: (merge_quads(split_quads(c[0])),), (p,))
    t("residual0_full", lambda c: (c[0], c[0].residual(0, c[1], c[2]), c[2]),
      (be, p, b))

    # -- the whole F-cycle (the end-to-end number the rows sum against) -----
    from mgroms_tpu.solver import fcycle

    def fc(c):
        be, p_, b_, r_ = c
        p_ = fcycle(be, p_, b_, r_, cfg, keep_state=True)
        r_ = be.residual(0, p_, b_)
        return (be, p_, b_, r_)

    t("fcycle_plus_residual", fc, (be, pq, bq, bq), iters=6)

    rows["marginal_sweep_q0"] = round((rows["sweep3_q0"] - rows["sweep1_q0"])
                                      / 2, 2)
    rows["marginal_sweep_q1"] = round((rows["sweep3_q1"] - rows["sweep1_q1"])
                                      / 2, 2)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
