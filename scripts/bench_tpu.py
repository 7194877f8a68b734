"""Ad-hoc single-chip TPU benchmark: F-cycle time for any case/size/config.

Usage:
  python scripts/bench_tpu.py --case seamount --n 64
  python scripts/bench_tpu.py --case cuc --nx 1024 --ny 1024 --nz 64 \
      --no-compact

One compiled program, dynamic trip count, D2H-forced timing (see
utils/timing notes in CLAUDE.md — block_until_ready is unreliable over the
axon tunnel).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="seamount",
                    choices=["seamount", "cuc", "rndtopo"])
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--ny", type=int, default=64)
    ap.add_argument("--nz", type=int, default=64)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--no-compact", action="store_true")
    ap.add_argument("--fused-experimental", action="store_true",
                    dest="pallas",
                    help="whole-level VMEM-resident fused relax kernel "
                         "(measured parity with XLA at 64^3, not a win; "
                         "takes precedence over the compact/tiled paths)")
    ap.add_argument("--no-fused-sweep", action="store_true",
                    help="disable the color-fused sweep kernel "
                         "(ops/pallas/sweep_fused)")
    ap.add_argument("--bf16-bands", action="store_true",
                    help="store the fused-sweep gather bands in bfloat16 "
                         "with row-sum-consistent rebuilt pivots "
                         "(sweep_fused.consistent_pivots); the outer loop "
                         "then runs in defect-correction form "
                         "(solver.cycle_step)")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--ns-pre", type=int, default=None,
                    help="smoothing schedule override (parity default 3; "
                         "the round-5 schedule sweep measured lighter "
                         "schedules reaching the f32 floor faster — "
                         "docs/schedule_sweep_r5.md)")
    ap.add_argument("--ns-post", type=int, default=None)
    ap.add_argument("--coarsest", default="direct")
    ap.add_argument("--tridiag", default="thomas", choices=["thomas", "pcr"])
    ap.add_argument("--refine", action="store_true",
                    help="mixed-precision defect correction: f32 cycles on "
                         "the device, f64 residuals on host; targets 1e-12")
    args = ap.parse_args()

    from mgroms_tpu import NHModel, SolverConfig
    from mgroms_tpu.solver import cycle_step

    if args.refine:
        return run_refine(args)

    dt = jnp.dtype(args.dtype)
    if args.case == "seamount":
        from mgroms_tpu.cases.seamount import setup_seamount
        case = setup_seamount(args.nx, args.ny, args.nz, dtype=dt)
    elif args.case == "rndtopo":
        from mgroms_tpu.cases.rndtopo import setup_rndtopo
        case = setup_rndtopo(args.nx, args.ny, args.nz, dtype=dt)
    else:
        from mgroms_tpu.cases.cuc import setup_cuc_synthetic
        case = setup_cuc_synthetic(args.nx, args.ny, args.nz, dtype=dt)

    sched = {}
    if args.ns_pre is not None:
        sched["ns_pre"] = args.ns_pre
    if args.ns_post is not None:
        sched["ns_post"] = args.ns_post
    cfg = SolverConfig(dtype=args.dtype, compact=not args.no_compact,
                       use_pallas=args.pallas, coarsest=args.coarsest,
                       tridiag=args.tridiag,
                       pallas_fused_sweep=not args.no_fused_sweep,
                       fused_bands_bf16=args.bf16_bands, **sched)
    m = NHModel(args.nx, args.ny, args.nz, cfg=cfg)
    m.set_matrices(case.dx, case.dy, case.zeta, case.h, hc=case.hc,
                   theta_b=case.theta_b, theta_s=case.theta_s)
    from mgroms_tpu.cases.seamount import initial_velocities
    u, v, w = initial_velocities(args.nx, args.ny, args.nz, dtype=dt)
    b = m.rhs(u, v, w)
    b.block_until_ready()
    del u, v, w, case
    m.offload_metrics()      # ~2 GB HBM back at CUC scale
    be = m.backend

    @jax.jit
    def run(be, b, n):
        # state carried in level 0's canonical layout (solver.solve_step)
        q = bool(getattr(be, "state_quads", lambda lev: False)(0))
        to_state = getattr(be, "to_state", lambda lev, x: x)
        p = be.zeros(0, as_quads=q)
        bs = to_state(0, b)
        r = be.residual(0, p, bs)

        def body(i, state):
            p, r = state
            p, r = cycle_step(be, p, bs, r, cfg)
            return (p, r)

        p, r = jax.lax.fori_loop(0, n, body, (p, r))
        return jnp.sqrt(be.norm_sq(0, r)) / jnp.sqrt(be.norm_sq(0, b))

    def timed(n):
        t0 = time.perf_counter()
        res = float(run(be, b, jnp.int32(n)))
        return time.perf_counter() - t0, res

    timed(1)                      # compile + warm
    t1, _ = timed(1)
    tN, res = timed(args.reps + 1)
    dtc = max((tN - t1) / args.reps, 1e-9)
    dof = args.nx * args.ny * args.nz
    print(json.dumps({
        "case": args.case, "grid": [args.nz, args.ny, args.nx],
        "dtype": args.dtype, "compact": not args.no_compact,
        "pallas": args.pallas, "tridiag": args.tridiag,
        "fused_sweep": not args.no_fused_sweep,
        "bf16_bands": args.bf16_bands,
        "fcycle_ms": round(dtc * 1e3, 3),
        "mdof_per_s": round(dof / dtc / 1e6, 1),
        "rel_residual_after_reps": res,
        "platform": jax.devices()[0].platform,
    }))


def run_refine(args):
    from mgroms_tpu import SolverConfig
    from mgroms_tpu.refine import (build_pair, refined_pressure_solve,
                                   require_x64)
    from mgroms_tpu.cases.seamount import initial_velocities
    import jax.numpy as jnp

    require_x64()        # before any f64 array is created
    if args.case == "seamount":
        from mgroms_tpu.cases.seamount import setup_seamount as setup
    elif args.case == "rndtopo":
        from mgroms_tpu.cases.rndtopo import setup_rndtopo as setup
    else:
        from mgroms_tpu.cases.cuc import setup_cuc_synthetic as setup
    case = setup(args.nx, args.ny, args.nz, dtype=jnp.float64)
    cfg32 = SolverConfig(dtype="float32", compact=not args.no_compact,
                         coarsest=args.coarsest)
    m32, m64 = build_pair(args.nx, args.ny, args.nz, case, cfg32)
    u, v, w = initial_velocities(args.nx, args.ny, args.nz,
                                 dtype=jnp.float64)
    b64 = m64.rhs(u, v, w)
    p64, info = refined_pressure_solve(m32, m64, b64, tol=1e-12,
                                       max_rounds=8, verbose=True)
    print(json.dumps({
        "case": args.case, "grid": [args.nz, args.ny, args.nx],
        "mode": "defect-correction f32 cycles + f64 residuals",
        "rounds": info.rounds,
        "final_f64_rel_residual": info.res,
        "history": [float(h) for h in info.history],
        "inner_fcycles": list(info.inner_cycles),
        "time_s": round(info.time_s, 3),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
