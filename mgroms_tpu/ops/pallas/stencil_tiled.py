"""Tiled Pallas residual — fused 15-point stencil, one HBM pass.

The XLA lowering of ops/stencil.residual at CUC scale (1024^2 x 64 f32)
measures 35.5 ms against a ~3 ms HBM-bandwidth roofline: the ~14 band
products don't fuse into one pass, so p and the accumulator are re-read
per term.  This kernel streams j-tiles through VMEM — each operand byte
crosses HBM ~once — and evaluates the full stencil in registers.

Windowing: residual rows j in [j0, j0+TJ) read pe/cA rows [j0, j0+TJ+2)
(halo-extended arrays: every dj in {-1,0,1} lands inside the window).
``pl.Element`` block dims express the overlapping windows; Mosaic requires
the block's second-minor dim to be a multiple of 8, so the window is
rounded up to WPAD = roundup(TJ+2, 8) and the source arrays are padded
with WPAD-TJ-2 junk rows the kernel never reads (slight extra DMA traffic,
~1.6x at TJ=8 — still ~5x under the unfused XLA path).  The stencil math
is ops/stencil.residual verbatim: pure shifted-slice jnp traces
identically inside a Pallas kernel (reference: compute_residual_3D_8,
mg_relax.f90:421-515).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import stencil

_z = np.int32(0)   # index maps must return i32: literal ints trace as
                   # i64 under jax_enable_x64 (refine pairs an f64 host
                   # model with the f32 TPU solve) and Mosaic fails to
                   # legalize the i64 func.return

VMEM_LIMIT = 128 * 1024 * 1024
# picker budget: measured Mosaic usage runs ~1.5x the naive field-count
# estimate (lane padding to 128 multiples + pipeline state), so the tile
# chooser works against a conservative fraction of the hardware VMEM
_PICK_BUDGET = 64 * 1024 * 1024


def _roundup8(n: int) -> int:
    return (n + 7) // 8 * 8


def _pad_rows(a: jnp.ndarray, extra: int, axis: int) -> jnp.ndarray:
    """Append ``extra`` junk rows (edge copies) along ``axis``."""
    if extra == 0:
        return a
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(-1, None)
    tail = jnp.concatenate([a[tuple(idx)]] * extra, axis=axis)
    return jnp.concatenate([a, tail], axis=axis)


def supports(nz: int, ny: int, nx: int, itemsize: int = 4) -> bool:
    for cand in (16, 8):
        wpad = _roundup8(cand + 2)
        if (ny % cand == 0 and (12 * nz * wpad * (nx + 2)
                + 6 * nz * cand * nx) * itemsize <= _PICK_BUDGET):
            return True
    return False


def _kernel(pe_ref, b_ref, cA_ref, out_ref, *, real_matrix, tj):
    pe = pe_ref[:, : tj + 2, :]
    cA = cA_ref[:, :, : tj + 2, :]
    out_ref[:] = stencil.residual(pe, b_ref[:], cA, real_matrix)


@functools.partial(jax.jit, static_argnames=("real_matrix", "interpret"))
def residual_tiled(pe: jnp.ndarray, b: jnp.ndarray, cA: jnp.ndarray,
                   real_matrix: bool, interpret: bool = False
                   ) -> jnp.ndarray:
    """r = b - A p, streaming j-tiles.  ``pe``: (nz, ny+2, nx+2) extended,
    ``b``: (nz, ny, nx), ``cA``: (8, nz, ny+2, nx+2)."""
    nz, ny, nx = b.shape
    nxe = nx + 2
    itemsize = jnp.dtype(b.dtype).itemsize
    # Mosaic: b/out block second-minor dim (tj) must be a multiple of 8
    tj = None
    for cand in (16, 8):
        wpad = _roundup8(cand + 2)
        if (ny % cand == 0 and (12 * nz * wpad * nxe
                + 6 * nz * cand * (nxe - 2)) * itemsize <= _PICK_BUDGET):
            tj = cand
            break
    assert tj is not None, f"residual_tiled unsupported for ny={ny}"
    wpad = _roundup8(tj + 2)
    extra = (ny - tj + wpad) - (ny + 2)
    pe = _pad_rows(pe, extra, 1)
    cA = _pad_rows(cA, extra, 2)

    kern = functools.partial(_kernel, real_matrix=real_matrix, tj=tj)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), b.dtype),
        grid=(ny // tj,),
        in_specs=[
            # windowed inputs: all dims Element (Mosaic requires all-or-none)
            pl.BlockSpec((pl.Element(nz), pl.Element(wpad),
                          pl.Element(nxe)),
                         lambda i: (_z, i * tj, _z),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(1)),
            pl.BlockSpec((nz, tj, nx), lambda i: (_z, i, _z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pl.Element(8), pl.Element(nz), pl.Element(wpad),
                          pl.Element(nxe)),
                         lambda i: (_z, _z, i * tj, _z),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(1)),
        ],
        out_specs=pl.BlockSpec((nz, tj, nx), lambda i: (_z, i, _z),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(pe, b, cA)
