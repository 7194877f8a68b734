"""Post-quad per-(level, section) F-cycle breakdown at CUC scale — THE
profiling surface (VERDICT r3 items 2/5: one table, produced by the same
machinery as ``drivers/* --profile``).

Runs utils/tictoc.profile_fcycle on the real backend: one eager F-cycle
through the InstrumentedBackend records every per-level op call with its
ACTUAL argument layout (QuadField on quad-persistent levels — the ops the
compiled cycle really runs), then each distinct (op, level, signature) is
re-timed device-resident (utils/timing.time_device_fn — the only honest
timer over the tunnel).  The whole F-cycle is also timed as one program so
the per-section rows can be reconciled against it.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/profile_cuc.py \
           [--nx 1024 --ny 1024 --nz 64] [--iters 5]

Reference: the per-(level,routine) table of mg_tictoc.f90:114-153,
bracketed at mg_relax.f90:128,146,167,188 and mg_solvers.f90:45,82,108,124.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=1024)
    ap.add_argument("--ny", type=int, default=1024)
    ap.add_argument("--nz", type=int, default=64)
    ap.add_argument("--case", default="cuc")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chunks", type=int, default=None,
                    help="force fused-sweep lane-chunk count (1 = "
                         "unchunked plans only, the round-3 gating, for "
                         "before/after comparisons)")
    args = ap.parse_args()

    from mgroms_tpu import NHModel, SolverConfig
    from mgroms_tpu.solver import cycle_step
    from mgroms_tpu.utils.tictoc import TicToc, profile_fcycle
    from mgroms_tpu.utils.timing import time_device_fn

    dt = jnp.float32
    if args.case == "cuc":
        from mgroms_tpu.cases.cuc import setup_cuc_synthetic as setup
    else:
        from mgroms_tpu.cases.seamount import setup_seamount as setup
    case = setup(args.nx, args.ny, args.nz, dtype=dt)
    cfg = SolverConfig(dtype="float32", coarsest="direct",
                       fused_sweep_chunks=args.chunks)
    m = NHModel(args.nx, args.ny, args.nz, cfg=cfg)
    m.set_matrices(case.dx, case.dy, case.zeta, case.h, hc=case.hc,
                   theta_b=case.theta_b, theta_s=case.theta_s)
    m.offload_metrics()
    be = m.backend
    b = jnp.ones((args.nz, args.ny, args.nx), dt)

    # whole F-cycle as ONE program (the bench step, for reconciliation)
    def step(c):
        be, p, b, r = c
        p, r = cycle_step(be, p, b, r, cfg)
        return (be, p, b, r)

    q = bool(be.state_quads(0))
    p0 = be.zeros(0, as_quads=q)
    bs = be.to_state(0, b)
    r0 = be.residual(0, p0, bs)
    t_fcycle = time_device_fn(step, (be, p0, bs, r0), iters=args.iters)
    print(json.dumps({"fcycle_ms": round(t_fcycle * 1e3, 2)}), flush=True)

    tt = TicToc()
    profile_fcycle(be, b, cfg, device_timer=True, iters=args.iters,
                   tictoc=tt)
    print(tt.report(), flush=True)

    rows = []
    for (lev, op), (secs, calls) in sorted(tt.table.items()):
        rows.append({"lev": lev, "op": op, "ms": round(secs * 1e3, 3),
                     "calls": calls})
        print(json.dumps(rows[-1]), flush=True)
    implied = sum(r["ms"] for r in rows)
    print(json.dumps({
        "implied_fcycle_ms": round(implied, 2),
        "measured_fcycle_ms": round(t_fcycle * 1e3, 2),
        "note": "implied = sum of per-section rows (one F-cycle + the "
                "outer loop's residual, timed as separate programs); "
                "measured = the same work fused into one program"}))


if __name__ == "__main__":
    main()
