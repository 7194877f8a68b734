"""Smoothing-schedule sweep at CUC scale: time-to-floor, not ms/cycle.

Round-4 finding: level-0 smoothing is compute-bound at ~13.5 ms/sweep
and takes 51% of the F-cycle, so the cheapest convergence lever is
running FEWER level-0 sweeps per cycle if the convergence factor holds.
The reference schedule (ns_pre=3, ns_post=2, mg_namelist.f90:13-15)
stays the parity default; this measures the alternatives on the
reference's own figure of merit (time per decade of residual reduction).

The model (operators + packs) is built ONCE and shared across schedule
configs — the schedule only changes trace-time loop counts, and keeping
one copy of the CUC operators in HBM avoids the OOM that killed the
first run of this sweep (two models do not fit).

Usage: PYTHONPATH=/root/.axon_site:. python scripts/schedule_sweep.py
"""

import dataclasses
import gc
import json
import math
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    from mgroms_tpu import NHModel, SolverConfig
    from mgroms_tpu.cases.cuc import setup_cuc_synthetic
    from mgroms_tpu.cases.seamount import initial_velocities
    from mgroms_tpu.solver import SingleDeviceBackend, cycle_step
    from mgroms_tpu.utils.timing import time_device_fn

    nx = ny = 1024
    nz = 64
    dt = jnp.float32
    case = setup_cuc_synthetic(nx, ny, nz, dtype=dt)
    u, v, w = initial_velocities(nx, ny, nz, dtype=dt)

    cfg0 = SolverConfig(dtype="float32", coarsest="direct")
    m = NHModel(nx, ny, nz, cfg=cfg0)
    m.set_matrices(case.dx, case.dy, case.zeta, case.h, hc=case.hc,
                   theta_b=case.theta_b, theta_s=case.theta_s)
    b = m.rhs(u, v, w)
    b.block_until_ready()
    m.offload_metrics()
    del u, v, w
    base = m.backend

    for ns_pre, ns_post in ((3, 2), (2, 1), (2, 2), (1, 1)):
        cfg = dataclasses.replace(cfg0, ns_pre=ns_pre, ns_post=ns_post)
        # same operator/pack arrays, different trace-time schedule
        be = SingleDeviceBackend(list(base.levels), list(base.ops), cfg,
                                 platform=base.platform,
                                 packs=list(base.packs))

        # residual history over 6 cycles (one program)
        @jax.jit
        def hist6(be, b):
            q = bool(be.state_quads(0))
            p = be.zeros(0, as_quads=q)
            bs = be.to_state(0, b)
            r = be.residual(0, p, bs)
            bn = jnp.sqrt(be.norm_sq(0, b))
            hs = []
            for _ in range(6):
                p, r = cycle_step(be, p, bs, r, cfg)
                hs.append(jnp.sqrt(be.norm_sq(0, r)) / bn)
            return jnp.stack(hs)

        hist = [float(h) for h in hist6(be, b)]

        def step(c):
            be, p, bs, r = c
            p, r = cycle_step(be, p, bs, r, cfg)
            return (be, p, bs, r)

        q = bool(be.state_quads(0))
        p0 = be.zeros(0, as_quads=q)
        bs = be.to_state(0, b)
        r0 = be.residual(0, p0, bs)
        t = time_device_fn(step, (be, p0, bs, r0), iters=10)

        # cycles to reach 1e-4 relative (the bench tolerance)
        ncyc = next((i + 1 for i, h in enumerate(hist) if h <= 1e-4), None)
        floor = min(hist)
        decades = -math.log10(max(floor, 1e-30))
        print(json.dumps({
            "ns_pre": ns_pre, "ns_post": ns_post,
            "fcycle_ms": round(t * 1e3, 2),
            "history": [f"{h:.3e}" for h in hist],
            "cycles_to_1e-4": ncyc,
            "time_to_1e-4_ms": round(t * 1e3 * ncyc, 1) if ncyc else None,
            "ms_per_decade_at_floor": round(t * 1e3 * 6 / decades, 1),
        }), flush=True)
        del be, p0, bs, r0, hist6, step
        jax.clear_caches()
        gc.collect()


if __name__ == "__main__":
    main()
