"""Tiled Pallas fused color update — the compact smoother's hot kernel.

One red-black color update = (16-term neighbour gather -> tridiagonal RHS
-> exact Thomas solve) on the active color's columns.  The XLA lowering
leaves ~6x on the table at CUC scale (61 ms per sweep vs a ~10 ms HBM
roofline): the gather terms don't fuse into one pass, and the scan-based
Thomas serializes 2*nz tiny kernels.  This kernel streams j-tiles of the
quad-parity arrays through VMEM — every operand byte crosses HBM ~once per
color update — and runs the gather + a fully unrolled in-register Thomas
solve (bitwise the reference recurrence, mg_relax.f90:308-334) per tile.

Layout: quad-extended arrays (see ops/relax_compact.py); target rows
J in [j0, j0+TJ) read quad rows [j0, j0+TJ+2) — overlapping windows via
``pl.Element`` block dims, rounded up to a multiple of 8 (Mosaic sublane
alignment) with junk pad rows the kernel never reads.

VMEM discipline: one kernel call updates ONE target quad, and its band
input is a 16-entry pack of exactly the (band, quad) pairs that target's
gather touches — 20 windows total fit the 128 MB VMEM where the full
(8 bands x 4 quads) + both targets did not.  The gather math is
relax_compact._offdiag_quad verbatim, traced on the packed VMEM windows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..relax import thomas_unrolled as _thomas_unrolled
from ..relax_compact import (_RB_TARGETS, _FC_TARGETS, _offdiag_quad,
                             extend_quads, merge_quads, quad_ext_bands,
                             split_quads)

VMEM_LIMIT = 128 * 1024 * 1024
# real VMEM pressure: 4 pe windows (single-buffered) + 16 pack windows
# DOUBLE-buffered (pl.Buffered(2) below = 32 window-equivalents) + ~8
# window-sized temps = ~44 windows.  The budget keeps the measured CUC
# tiling (tj=8 at 1024^2x64 f32 -> 92.6 MB) inside the 128 MB hardware VMEM.
_PICK_BUDGET = 100 * 1024 * 1024


def _band_pairs(a: int, b: int, ):
    """The 16 (band, quad) pairs the gather for target quad (a, b) reads
    (the B() calls of relax_compact._offdiag_quad plus bands 1-2 for the
    in-column tridiagonal)."""
    oa, ob = 1 - a, 1 - b
    return (
        (1, (a, b)), (2, (a, b)),
        (3, (a, b)), (3, (oa, b)),
        (4, (a, b)), (4, (oa, b)),
        (5, (a, b)), (5, (oa, b)), (5, (oa, ob)),
        (6, (a, b)), (6, (a, ob)),
        (7, (a, b)), (7, (a, ob)),
        (8, (a, b)), (8, (a, ob)), (8, (oa, ob)),
    )


def _roundup8(n: int) -> int:
    return (n + 7) // 8 * 8


def _pad_rows(a: jnp.ndarray, extra: int, axis: int) -> jnp.ndarray:
    if extra == 0:
        return a
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(-1, None)
    tail = jnp.concatenate([a[tuple(idx)]] * extra, axis=axis)
    return jnp.concatenate([a, tail], axis=axis)


def _kernel(pe_ref, bq_ref, pack_ref, out_ref, *, target, real_matrix, tj):
    a, b = target
    # windows carry WPAD rows (Mosaic sublane alignment); the stencil uses
    # the true tj+2
    e = {(qa_, qb_): pe_ref[2 * qa_ + qb_, :, : tj + 2, :]
         for qa_ in (0, 1) for qb_ in (0, 1)}
    qa = [dict() for _ in range(8)]
    for m, (n, quad) in enumerate(_band_pairs(a, b)):
        qa[n - 1][quad] = pack_ref[m, :, : tj + 2, :]
    nz = pe_ref.shape[1]
    dt = out_ref.dtype
    k0 = (jax.lax.broadcasted_iota(jnp.int32, (nz, 1, 1), 0) == 0
          ).astype(dt) if real_matrix else None
    rhs = bq_ref[:] - _offdiag_quad(e, qa, a, b, real_matrix, k0)
    d = qa[0][(a, b)][:, 1:-1, 1:-1]
    ud = qa[1][(a, b)][1:, 1:-1, 1:-1]
    out_ref[:] = _thomas_unrolled(d, ud, rhs)


def _pick_tj(H: int, nz: int, We: int, itemsize: int):
    """Row tile (multiple of 8 for the b/out blocks): 4 pe windows +
    16 pack windows x2 (double-buffered) + ~8 window-sized temps."""
    for cand in (16, 8):
        wpad = _roundup8(cand + 2)
        if (H % cand == 0 and (44 * nz * wpad * We
                + 4 * nz * cand * (We - 2)) * itemsize <= _PICK_BUDGET):
            return cand
    return None


def supports(nz: int, H: int, W: int, itemsize: int = 4) -> bool:
    return _pick_tj(H, nz, W + 2, itemsize) is not None


@functools.partial(jax.jit,
                   static_argnames=("target", "real_matrix", "interpret"))
def color_update_tiled(pe_q: jnp.ndarray, bq_t: jnp.ndarray,
                       pack: jnp.ndarray, target, real_matrix: bool,
                       interpret: bool = False) -> jnp.ndarray:
    """Update ONE target quad.  ``pe_q``: (4, nz, H+2, W+2) quad-extended
    state (quad index q = 2a+b); ``bq_t``: (nz, H, W) the target's RHS
    quad; ``pack``: (16, nz, H+2, W+2) quad-extended bands in
    ``_band_pairs(target)`` order.  Returns the new quad (nz, H, W)."""
    nz, H, W = bq_t.shape
    We = W + 2
    tj = _pick_tj(H, nz, We, jnp.dtype(bq_t.dtype).itemsize)
    assert tj is not None, f"relax tiled kernel unsupported for H={H}"
    wpad = _roundup8(tj + 2)
    extra = (H - tj + wpad) - (H + 2)
    pe_q = _pad_rows(pe_q, extra, 2)
    pack = _pad_rows(pack, extra, 2)
    kern = functools.partial(_kernel, target=target,
                             real_matrix=real_matrix, tj=tj)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nz, H, W), bq_t.dtype),
        grid=(H // tj,),
        in_specs=[
            # windowed inputs: all dims Element (Mosaic all-or-none rule),
            # single-buffered (double buffering would double the window
            # VMEM; the DMA stream still overlaps across grid steps)
            pl.BlockSpec((pl.Element(4), pl.Element(nz), pl.Element(wpad),
                          pl.Element(We)),
                         lambda i: (0, 0, i * tj, 0),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(1)),
            pl.BlockSpec((nz, tj, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            # the pack is the bulk of the traffic: double-buffer it so its
            # DMA overlaps the gather+Thomas compute (pe stays single —
            # 36 double-buffered windows would blow the 128 MB VMEM)
            pl.BlockSpec((pl.Element(16), pl.Element(nz), pl.Element(wpad),
                          pl.Element(We)),
                         lambda i: (0, 0, i * tj, 0),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(2)),
        ],
        out_specs=pl.BlockSpec((nz, tj, W), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(pe_q, bq_t, pack)


def relax_compact_tiled(p: jnp.ndarray, b: jnp.ndarray, cA: jnp.ndarray,
                        nsweeps: int, kind: str, real_matrix: bool,
                        interpret: bool = False) -> jnp.ndarray:
    """``nsweeps`` RB/FC sweeps with the tiled fused kernel per (color,
    target quad).

    Same iterates as ops/relax_compact.relax_compact (the kernel reuses
    its gather; the unrolled Thomas matches the scan's op order).  Quad
    halo extension between colors stays in XLA (cheap concats); both
    targets of a color read the same pre-color extension.
    """
    targets_by_color = _RB_TARGETS if kind == "RB" else _FC_TARGETS
    qa = [quad_ext_bands(cA[n]) for n in range(cA.shape[0])]
    packs = {}
    for targets in targets_by_color:
        for (a, b_) in targets:
            packs[(a, b_)] = jnp.stack(
                [qa[n - 1][quad] for (n, quad) in _band_pairs(a, b_)])
    bq = split_quads(b)
    keys = [(a, b_) for a in (0, 1) for b_ in (0, 1)]

    def color_update(q, targets):
        e = extend_quads(q)
        pe_q = jnp.stack([e[k] for k in keys])
        q = dict(q)
        for t in targets:
            q[t] = color_update_tiled(pe_q, bq[t], packs[t], t,
                                      real_matrix, interpret=interpret)
        return q

    def sweep(q):
        for targets in targets_by_color:
            q = color_update(q, targets)
        return q

    q0 = split_quads(p)
    if nsweeps <= 1:
        q = q0
        for _ in range(nsweeps):
            q = sweep(q)
        return merge_quads(q)

    def body(i, flat):
        q = sweep(dict(zip(keys, flat)))
        return tuple(q[k] for k in keys)

    flat = jax.lax.fori_loop(0, nsweeps, body, tuple(q0[k] for k in keys))
    return merge_quads(dict(zip(keys, flat)))
