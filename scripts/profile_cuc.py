"""Per-op F-cycle breakdown at CUC scale on the attached TPU.

Times each backend op (relax sweep, residual, residual_restrict, prolong)
per level with the tunnel-honest device timer (utils/timing), then prints
the implied F-cycle composition next to the measured whole-F-cycle time.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/profile_cuc.py \
           [--nx 1024 --ny 1024 --nz 64] [--levels 0 1 2]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--maxlev", type=int, default=3,
                    help="profile levels 0..maxlev-1 (coarser are cheap)")
    args = ap.parse_args()

    from mgroms_tpu import NHModel, SolverConfig
    from mgroms_tpu.utils.timing import time_device_fn

    dt = jnp.float32
    if args.case == "cuc":
        from mgroms_tpu.cases.cuc import setup_cuc_synthetic as setup
    else:
        from mgroms_tpu.cases.seamount import setup_seamount as setup
    case = setup(args.nx, args.ny, args.nz, dtype=dt)
    cfg = SolverConfig(dtype="float32", coarsest="direct")
    m = NHModel(args.nx, args.ny, args.nz, cfg=cfg)
    m.set_matrices(case.dx, case.dy, case.zeta, case.h, hc=case.hc,
                   theta_b=case.theta_b, theta_s=case.theta_s)
    m.offload_metrics()
    be = m.backend

    rows = []
    for lev in range(min(args.maxlev, be.nlevs - 1)):
        spec = be.levels[lev]
        shape = (spec.nzg, spec.nyg, spec.nxg)
        p = jnp.zeros(shape, dt)
        b = jnp.ones(shape, dt)

        # the backend rides in the CARRY, never in a closure: closed-over
        # operator arrays become multi-GB HLO constants (minutes of remote
        # compile; see CLAUDE.md).  The timer's final |leaf| sum then also
        # covers the operator arrays — a constant cost present in both the
        # n=1 and n=N runs, removed by the subtraction.
        t_sweep = time_device_fn(
            lambda c: (c[0], c[0].relax(lev, c[1], c[2], 1), c[2]),
            (be, p, b), iters=args.iters)
        t_res = time_device_fn(
            lambda c: (c[0], c[0].residual(lev, c[1], c[2]), c[2]),
            (be, p, b), iters=args.iters)
        t_rr = time_device_fn(
            lambda c: (c[0], c[0].prolong(
                lev, c[0].residual_restrict(lev, c[1], c[2])), c[2]),
            (be, p, b), iters=args.iters)
        rows.append({
            "lev": lev, "shape": list(shape),
            "sweep_ms": round(t_sweep * 1e3, 2),
            "residual_ms": round(t_res * 1e3, 2),
            "rr_plus_prolong_ms": round(t_rr * 1e3, 2),
            "compact": be._use_compact(lev),
            "tiled": be._use_tiled(lev, "relax"),
        })
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"note": "rr_plus_prolong = residual_restrict + "
                              "prolong fused in one timed step"}))


if __name__ == "__main__":
    main()
