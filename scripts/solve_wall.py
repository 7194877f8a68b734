"""CUC solve-to-floor wall time, host loop vs on-device loop.

VERDICT r3 item 7 artifact: the host convergence loop pays one D2H sync
per F-cycle (the reference's per-iteration ALLREDUCE, ~free on its
cluster, is a full RTT over the axon tunnel); cfg.device_loop runs the
whole loop as one lax.while_loop program with in-device history.  Same
iterates, same history (pinned by test_solver.py).

Usage: PYTHONPATH=/root/.axon_site:. python scripts/solve_wall.py \
           [--nx 1024 --ny 1024 --nz 64 --tol 1e-4 --reps 3]
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
    ap.add_argument("--nx", type=int, default=1024)
    ap.add_argument("--ny", type=int, default=1024)
    ap.add_argument("--nz", type=int, default=64)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--maxiter", type=int, default=12)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from mgroms_tpu import NHModel, SolverConfig
    from mgroms_tpu.cases.cuc import setup_cuc_synthetic
    from mgroms_tpu.cases.seamount import initial_velocities
    from mgroms_tpu.solver import solve_p

    dt = jnp.float32
    case = setup_cuc_synthetic(args.nx, args.ny, args.nz, dtype=dt)
    cfg = SolverConfig(dtype="float32", coarsest="direct")
    m = NHModel(args.nx, args.ny, args.nz, cfg=cfg)
    m.set_matrices(case.dx, case.dy, case.zeta, case.h, hc=case.hc,
                   theta_b=case.theta_b, theta_s=case.theta_s)
    u, v, w = initial_velocities(args.nx, args.ny, args.nz, dtype=dt)
    b = m.rhs(u, v, w)
    b.block_until_ready()
    del u, v, w, case
    m.offload_metrics()

    for device_loop in (False, True):
        times = []
        info = None
        for rep in range(args.reps + 1):
            t0 = time.perf_counter()
            p, info = solve_p(m.backend, b, m.cfg, tol=args.tol,
                              maxiter=args.maxiter,
                              device_loop=device_loop)
            dtw = time.perf_counter() - t0
            if rep > 0:          # rep 0 pays compile
                times.append(dtw)
        print(json.dumps({
            "device_loop": device_loop,
            "niter": info.niter,
            "final_rel_residual": info.res,
            "history": [float(h) for h in info.history],
            "wall_s_per_solve": round(sum(times) / len(times), 3),
            "wall_s_all": [round(t, 3) for t in times],
        }), flush=True)


if __name__ == "__main__":
    main()
