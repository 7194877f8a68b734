"""Fused multi-sweep relaxation — the Pallas TPU hot kernel.

The reference's hot loop (mg_relax.f90:151-190) is: per sweep, per color,
update the colored z-columns then refresh halos.  The XLA path replays that
structure as ~2*nsweeps separate fused kernels, each re-reading the 8
coefficient bands from HBM (~9 MB at 64^3 f32) — the smoother is pure HBM
bandwidth.

This kernel keeps the ENTIRE level resident in VMEM for the whole relax
call: one read of (p, b, cA), then nsweeps x ncolors in-register color
updates (halo extension, 13-band neighbour gather, exact z-line Thomas
solve, masked commit), one write of p.  HBM traffic drops by ~2*nsweeps.
(The z-line solve is the unrolled Thomas — bitwise the jnp path's
recurrence.  An earlier PCR variant measured 2x slower at CUC scale AND
degraded the f32 residual floor to ~5e-3; PCR's divisions amplify
roundoff.  Thomas everywhere.)

Physical-boundary semantics are identical to the jnp path: the in-kernel
extension is the same edge-copy mirror, so this kernel is valid whenever
the block IS the whole (sub)domain — single-chip levels, or the replicated
coarse levels of a distributed run.  The neighbour-gather and Thomas code
is *shared* with the jnp path (ops/stencil.py, ops/relax.py): pure
shifted-slice jnp traces the same way inside a Pallas kernel.

VMEM budget: roughly 12 copies of one level field; `fits_vmem` gates usage
(large fine levels stay on the XLA path until the tiled variant lands).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..relax import thomas_unrolled
from ..stencil import offdiag_columns

# conservative per-core VMEM budget (bytes) for the resident working set
VMEM_BUDGET = 100 * 1024 * 1024


def fits_vmem(nz: int, ny: int, nx: int, itemsize: int = 4) -> bool:
    """Working set: cA (8 fields) + p/b/out + ~6 temporaries."""
    field = nz * (ny + 2) * (nx + 2) * itemsize
    return 18 * field <= VMEM_BUDGET


def _extend_edge(p: jnp.ndarray) -> jnp.ndarray:
    """Halo-1 edge-copy extension (bc.extend_h1) via explicit concats
    (Pallas-friendly: no jnp.pad)."""
    p = jnp.concatenate([p[:, :1, :], p, p[:, -1:, :]], axis=1)
    p = jnp.concatenate([p[:, :, :1], p, p[:, :, -1:]], axis=2)
    return p


def _kernel(p_ref, b_ref, cA_ref, out_ref, *, nsweeps: int, kind: str,
            real_matrix: bool):
    p = p_ref[:]
    b = b_ref[:]
    cA = cA_ref[:]
    nz, ny, nx = p.shape
    dt = p.dtype

    jj = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    ncolor = {"RB": 2, "FC": 4, "GS": 1}[kind]

    def color_mask(c):
        # arithmetic mask from the (traced) step index — no dynamic_slice
        # in Pallas TPU lowering
        if kind == "RB":
            return ((jj + ii + c) % 2 == 0).astype(dt)
        if kind == "FC":
            return (((ii % 2) == (c // 2)) & ((jj % 2) == (c % 2))
                    ).astype(dt)
        return jnp.ones((ny, nx), dtype=dt)

    d = cA[0, :, 1:-1, 1:-1]
    ud = cA[1][1:, 1:-1, 1:-1]

    def body(i, p):
        mask = color_mask(i % ncolor)
        pe = _extend_edge(p)
        rhs = b - offdiag_columns(pe, cA, real_matrix)
        sol = thomas_unrolled(d, ud, rhs)
        return p + mask * (sol - p)

    # fori_loop (not unrolled) so each step's temporaries share one VMEM
    # allocation instead of coexisting on the scoped stack
    out_ref[:] = jax.lax.fori_loop(0, nsweeps * ncolor, body, p)


@functools.partial(jax.jit, static_argnames=("nsweeps", "kind",
                                             "real_matrix", "interpret"))
def fused_relax(p: jnp.ndarray, b: jnp.ndarray, cA: jnp.ndarray,
                nsweeps: int, kind: str, real_matrix: bool,
                interpret: bool = False) -> jnp.ndarray:
    """nsweeps of colored line relaxation, entirely VMEM-resident.

    ``p``, ``b``: interior (nz, ny, nx); ``cA``: extended (8, nz, ny+2,
    nx+2).  Valid when the arrays span the whole (sub)domain with physical
    boundaries on every side.
    """
    kern = functools.partial(_kernel, nsweeps=nsweeps, kind=kind,
                             real_matrix=real_matrix)
    kwargs = {}
    if not interpret:
        # raise the scoped-VMEM ceiling: the resident set (cA + p + b +
        # one step's temporaries) exceeds the 16 MB default at 64^3
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(p, b, cA)
