"""Benchmark driver: seamount solve throughput on the current backend.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric: multigrid throughput in DOF/s — fine-grid degrees of
freedom processed per second of F-cycle (each F-cycle visits every level).
Also reports the reference's own "rescaled performance" (core-seconds per
DOF per decade of residual reduction, src/mg_solvers.f90:84-97; lower is
better) and cycles to tolerance.

Implementation notes for remote-attached TPU backends: everything runs in
ONE compiled program with a dynamic cycle count (compiles are minutes over
the tunnel), and timing forces a device-to-host fetch
(``block_until_ready`` is unreliable there — utils/timing.py).

The reference publishes no numbers (BASELINE.md: `published: {}`), so
vs_baseline is 1.0 by definition.
"""

import json
import math
import sys
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
    from mgroms_tpu.solver import cycle_step

    cfg = SolverConfig(dtype=dtype,
                       coarsest="direct" if on_tpu else "relax")
    m = NHModel(nx, ny, nz, cfg=cfg)
    c = setup_seamount(nx, ny, nz, dtype=jnp.dtype(dtype))
    m.set_matrices(c.dx, c.dy, c.zeta, c.h, hc=c.hc,
                   theta_b=c.theta_b, theta_s=c.theta_s)
    u, v, w = initial_velocities(nx, ny, nz, dtype=jnp.dtype(dtype))
    b = m.rhs(u, v, w)
    be = m.backend

    MAXC = 24

    @jax.jit
    def run(be, b, n):
        """n F-cycles from p=0, recording ||r||/||b|| after each.  State
        (p, b, r) rides in level 0's canonical layout (QuadField on
        quad-persistent levels) exactly like solver.solve_step."""
        q = bool(getattr(be, "state_quads", lambda lev: False)(0))
        to_state = getattr(be, "to_state", lambda lev, x: x)
        p = be.zeros(0, as_quads=q)
        bs = to_state(0, b)
        r = be.residual(0, p, bs)
        bnorm = jnp.sqrt(be.norm_sq(0, b))
        hist0 = jnp.zeros((MAXC + 1,), dtype=b.dtype)
        hist0 = hist0.at[0].set(jnp.sqrt(be.norm_sq(0, r)) / bnorm)

        def body(i, state):
            p, r, hist = state
            p, r = cycle_step(be, p, bs, r, cfg)
            hist = hist.at[i + 1].set(jnp.sqrt(be.norm_sq(0, r)) / bnorm)
            return (p, r, hist)

        p, r, hist = jax.lax.fori_loop(0, n, body, (p, r, hist0))
        return hist

    # convergence history (one dispatch)
    hist = [float(h) for h in run(be, b, jnp.int32(12))][:13]
    res0 = hist[0]
    ncyc = next((i for i, h in enumerate(hist) if h <= tol and i > 0), 12)
    res = hist[min(ncyc, 12)]

    # timing: same compiled program, dynamic n; subtract the n=1 run to
    # remove dispatch RTT + setup.  Three independent batches; the MEDIAN
    # batch is the reported number (tunnel timing varies ~+-15% run to run,
    # CLAUDE.md) — method stated in `extra` for reproducibility.
    def timed(n):
        t0 = time.perf_counter()
        float(run(be, b, jnp.int32(n))[0])
        return time.perf_counter() - t0

    timed(1)
    reps = 20 if on_tpu else 3
    nbatch = 5 if on_tpu else 1
    # one robust n=1 baseline shared by every batch: per-batch subtraction
    # lets a single slow n=1 dispatch (tunnel RTT spike) swallow the whole
    # batch and clamp it to ~0 (the round-2 0.68 ms outlier batch)
    t1s = sorted(timed(1) for _ in range(3 if on_tpu else 1))
    t1 = t1s[len(t1s) // 2]
    batches = [max((timed(reps + 1) - t1) / reps, 1e-9)
               for _ in range(nbatch)]
    batches.sort()
    dt = batches[len(batches) // 2]

    dof = nx * ny * nz
    decades = -math.log10(max(res / res0, 1e-300))
    rescaled = (ncyc * dt) / max(decades, 1e-9) / dof

    spread = ((batches[-1] - batches[0]) / dt) if on_tpu else 0.0
    extra = {
        "platform": platform,
        "dtype": dtype,
        "grid": [nz, ny, nx],
        "fcycle_seconds": dt,
        "timing_method": f"median of {len(batches)} batches of {reps} "
                         "F-cycles in one on-device fori_loop, n=1 run "
                         "subtracted (dispatch RTT)",
        "batch_fcycle_seconds": batches,
        "batch_spread_rel": round(spread, 3),
        "cycles_to_tol": ncyc,
        "tol": tol,
        "final_rel_residual": res,
        "residual_history": hist[:10],
        "rescaled_perf_core_s_per_dof_per_decade": rescaled,
        # the measured program's configuration (beyond-reference options on)
        "config": {
            "coarsest": cfg.coarsest,
            "compact": cfg.compact,
            "pallas_tiled": cfg.pallas_tiled,
            "pallas_tiled_relax": cfg.pallas_tiled_relax,
            "tridiag": cfg.tridiag,
            "relax_kind": cfg.relax_kind,
            "cycle": "fcycle(keep_state=True); state in quad layout on "
                     "quad-persistent levels",
        },
    }

    # flagship-scale row (CUC 1024^2 x 64, the reference's testcuc grid):
    # on by default with a hard wall-clock guard (the remote compile is
    # ~4 min over the tunnel; skip cleanly on timeout).  MGROMS_BENCH_CUC=0
    # opts out.
    import os
    if on_tpu and os.environ.get("MGROMS_BENCH_CUC", "1") != "0":
        import subprocess

        def cuc_row(*flags):
            out = subprocess.run(
                [sys.executable, "scripts/bench_tpu.py", "--case", "cuc",
                 "--nx", "1024", "--ny", "1024", "--nz", "64",
                 "--reps", "5", *flags],
                capture_output=True, text=True, timeout=1800)
            return json.loads(out.stdout.strip().splitlines()[-1])

        try:
            extra["cuc_1024x1024x64"] = cuc_row()
        except Exception as e:           # pragma: no cover
            extra["cuc_1024x1024x64"] = {"skipped": repr(e)}
        # perf mode: bf16 smoother blocks (consistent pivots +
        # defect-correction outer loop, converges to the same f32 floor)
        # + the time-to-floor-optimal V(1,1) schedule
        # (docs/schedule_sweep_r5.md; parity keeps the reference 3/2 and
        # the f32 operator — the default row above)
        try:
            extra["cuc_1024x1024x64_perf"] = cuc_row(
                "--bf16-bands", "--ns-pre", "1", "--ns-post", "1")
        except Exception as e:           # pragma: no cover
            extra["cuc_1024x1024x64_perf"] = {"skipped": repr(e)}

    print(json.dumps({
        "metric": f"seamount{nx}_fcycle_dof_per_s",
        "value": round(dof / dt, 1),
        "unit": "dof/s",
        "vs_baseline": 1.0,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
