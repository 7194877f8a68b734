"""Benchmark driver: seamount solve throughput on the current backend.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric: multigrid throughput in DOF/s — fine-grid degrees of
freedom processed per second of F-cycle (each F-cycle visits every level;
DOF/s counts fine-grid points per cycle per second, the standard multigrid
figure).  Also reports the reference's own "rescaled performance"
(core-seconds per DOF per decade of residual reduction,
src/mg_solvers.f90:84-97) — lower is better — and cycles to convergence.

The reference publishes no numbers (BASELINE.md: `published: {}`), so
vs_baseline is reported against the metric definition only (1.0).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    if on_tpu:
        nx = ny = nz = 64
        dtype = "float32"
        tol = 1e-4          # f32 relative-residual floor is ~4e-5
    else:
        nx = ny = nz = 32
        dtype = "float64"
        tol = 1e-9

    from mgroms_tpu import NHModel, SolverConfig
    from mgroms_tpu.cases.seamount import initial_velocities, setup_seamount
    from mgroms_tpu.solver import fcycle

    cfg = SolverConfig(dtype=dtype,
                       coarsest="direct" if on_tpu else "relax")
    m = NHModel(nx, ny, nz, cfg=cfg)
    c = setup_seamount(nx, ny, nz, dtype=jnp.dtype(dtype))
    m.set_matrices(c.dx, c.dy, c.zeta, c.h, hc=c.hc,
                   theta_b=c.theta_b, theta_s=c.theta_s)
    u, v, w = initial_velocities(nx, ny, nz, dtype=jnp.dtype(dtype))
    b = m.rhs(u, v, w)
    be = m.backend

    @jax.jit
    def step(be, p, b, r):
        p = fcycle(be, p, b, r, cfg)
        r = be.residual(0, p, b)
        return p, r, jnp.sqrt(be.norm_sq(0, r))

    @jax.jit
    def init(be, b):
        p = be.zeros(0)
        r = be.residual(0, p, b)
        return p, r, jnp.sqrt(be.norm_sq(0, r)), jnp.sqrt(be.norm_sq(0, b))

    # convergence run (counts cycles to tol)
    p, r, rn, bn = init(be, b)
    bnorm = float(bn)
    res = float(rn) / bnorm
    res0 = res
    ncyc = 0
    history = [res]
    while res > tol and ncyc < 30:
        p, r, rn = step(be, p, b, r)
        res = float(rn) / bnorm
        history.append(res)
        ncyc += 1

    # timed steady-state F-cycles, device-resident (block_until_ready is
    # unreliable on tunneled backends — see utils/timing.py)
    from mgroms_tpu.utils.timing import time_device_fn
    p, r, _, _ = init(be, b)

    def one_cycle(carry):
        # backend and b ride in the carry so they are traced args, not
        # HLO constants
        be, p, b, r = carry
        p = fcycle(be, p, b, r, cfg)
        r = be.residual(0, p, b)
        return (be, p, b, r)

    dt = time_device_fn(one_cycle, (be, p, b, r),
                        iters=20 if on_tpu else 3)

    dof = nx * ny * nz
    dof_per_s = dof / dt
    import math
    decades = -math.log10(max(res / res0, 1e-300))
    rescaled = (ncyc * dt) / max(decades, 1e-9) / dof  # 1 "core" (chip)

    print(json.dumps({
        "metric": f"seamount{nx}_fcycle_dof_per_s",
        "value": round(dof_per_s, 1),
        "unit": "dof/s",
        "vs_baseline": 1.0,
        "extra": {
            "platform": platform,
            "dtype": dtype,
            "grid": [nz, ny, nx],
            "fcycle_seconds": dt,
            "cycles_to_tol": ncyc,
            "tol": tol,
            "final_rel_residual": res,
            "residual_history": history[:12],
            "rescaled_perf_core_s_per_dof_per_decade": rescaled,
        },
    }))


if __name__ == "__main__":
    main()
