"""Tiled Pallas fused color update — the compact smoother's hot kernel.

One red-black color update = (16-term neighbour gather -> tridiagonal RHS
-> exact solve) on the active color's columns.  This kernel streams j-tiles
of the quad-parity state and the PERSISTED gather-block operator
(ops/relax_compact.CompactPack) through VMEM and evaluates the gather plus
a fully unrolled division-free Thomas substitution per tile (bitwise the
reference recurrence, mg_relax.f90:237-334, with pivots precomputed by
ops/relax.thomas_factor).

v2 design (vs the round-1 kernel):
  - operator reads are ALIGNED blocks of the pre-sliced pack, not
    overlapping ``pl.Element`` windows of the extended bands: no wpad junk
    rows, ~2x less band DMA, and the per-call ``quad_ext_bands`` pass (a
    multi-GB HBM transient at CUC scale) is gone entirely;
  - the in-column solve is the factored substitution: no divisions, no
    forward elimination — roughly half the Thomas VPU work;
  - only the 4 extended STATE quads still use Element windows (their
    values change per color; they are ~1/5 of the traffic).

Layout: target rows J in [j0, j0+TJ) read state-quad rows [j0, j0+TJ+2)
(windows rounded up to a multiple of 8 with junk pad rows the kernel never
reads) and pack-block rows [j0, j0+TJ) exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..relax import thomas_factored_unrolled
from ..relax_compact import (_FC_TARGETS, _RB_TARGETS, _TKEYS, CompactPack,
                             _kshift, build_compact_pack, extend_quads,
                             gather_blocks, gather_keys, merge_quads,
                             split_quads, wide_slices)

_z = np.int32(0)   # index maps must return i32: literal ints trace as
                   # i64 under jax_enable_x64 (refine pairs an f64 host
                   # model with the f32 TPU solve) and Mosaic fails to
                   # legalize the i64 func.return

VMEM_LIMIT = 128 * 1024 * 1024
_PICK_BUDGET = 100 * 1024 * 1024


def _roundup8(n: int) -> int:
    return (n + 7) // 8 * 8


def _pad_rows(a: jnp.ndarray, extra: int, axis: int) -> jnp.ndarray:
    if extra == 0:
        return a
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(-1, None)
    tail = jnp.concatenate([a[tuple(idx)]] * extra, axis=axis)
    return jnp.concatenate([a, tail], axis=axis)


def _pick_tj(H: int, nz: int, W: int, nkeys: int, itemsize: int,
             nwin: int = 3, win_buf: int = 2, extra_blk: int = 0,
             band_itemsize: int = None):
    """Row tile (multiple of 8 for the aligned blocks).  VMEM: ``nwin``
    state windows (x ``win_buf`` pipeline buffers) + (nkeys+4) aligned
    operator/rhs blocks double-buffered + out + ~10 block-sized temps
    (gather accumulator, unrolled-Thomas state).  ``extra_blk`` adds
    block-sized buffers (the residual-emitting kernel's d input and
    second output, double-buffered).  ``band_itemsize`` sizes the wide
    block stream separately (bf16 smoother bands); sub-f32 bands need a
    16-row tile (bf16 sublane tiling)."""
    if band_itemsize is None:
        band_itemsize = itemsize
    We = W + 2
    cands = (16,) if band_itemsize < 4 else (16, 8)
    for cand in cands:
        if H % cand:
            continue
        wpad = _roundup8(cand + 2)
        win = nz * wpad * We
        blk = nz * cand * W
        need = ((nwin * win_buf * win
                 + (8 + extra_blk + 12) * blk) * itemsize
                + 2 * nkeys * blk * band_itemsize)
        if need <= _PICK_BUDGET:
            return cand
    return None


def supports(nz: int, H: int, W: int, itemsize: int = 4,
             real_matrix: bool = True) -> bool:
    nkeys = len(gather_keys(real_matrix))
    return _pick_tj(H, nz, W, nkeys, itemsize) is not None


def _gather_quads(target) -> tuple:
    """The 3 quads the neighbour gather for ``target`` actually reads:
    the y-sibling, the x-sibling, and the diagonal sibling.  The target's
    OWN quad never appears (every off-column coupling flips at least one
    parity), so the relax kernel skips its window entirely — 25% less
    state-window DMA and the VMEM headroom that double-buffers the rest."""
    a, b = target
    return ((1 - a) % 2, b), (a, (1 - b) % 2), ((1 - a) % 2, (1 - b) % 2)


def _ref_views(wide_ref, rb_ref, nkeys, dt=None):
    """Per-key block views from the kernel refs: the wide
    lane-concatenated base stream (one (nz, tj, nkeys*W) DMA per step
    runs at the wide-aligned HBM rate where nkeys separate streams ran
    at ~1/3 of it — micro_dma_probe) plus, for cmatrix='real', the
    single-plane real-only pair (1, tj, 2W).  Low-precision blocks
    (cfg.fused_bands_bf16 smoother operator) are converted to ``dt`` at
    read — the stream crosses HBM at half width, the compute stays
    f32."""
    base = wide_slices(wide_ref, nkeys)
    if dt is not None and base[0].dtype != dt:
        base = tuple(v.astype(dt) for v in base)
    if rb_ref is None:
        return base
    rb = rb_ref[:]
    if dt is not None and rb.dtype != dt:
        rb = rb.astype(dt)
    W = rb.shape[2] // 2
    return base + (rb[:, :, :W], rb[:, :, W:])


def _kernel(*refs, target, real_matrix, tj, nkeys):
    a, b = target
    e = {key: refs[i][:, : tj + 2, :]
         for i, key in enumerate(_gather_quads(target))}
    n = 4 + int(real_matrix)
    ud_ref, bet_ref, bq_ref, out_ref = refs[n:]
    blocks = _ref_views(refs[3], refs[4] if real_matrix else None, nkeys,
                        dt=out_ref.dtype)
    rhs = bq_ref[:] - gather_blocks(e, blocks, a, b, real_matrix)
    # gam recomputed in-kernel (see thomas_factored_unrolled): one fewer
    # operator stream on a DMA-bound pipeline
    out_ref[:] = thomas_factored_unrolled(bet_ref[:], None,
                                          ud_ref[:], rhs)


@functools.partial(jax.jit,
                   static_argnames=("target", "real_matrix", "interpret"))
def color_update_tiled(e3: tuple, bq_t: jnp.ndarray, blocks_w,
                       ud_t, bet_t, target, real_matrix: bool,
                       interpret: bool = False,
                       rb_t=None) -> jnp.ndarray:
    """Update ONE target quad.  ``e3``: the three quad-extended state
    arrays the gather reads (nz, H+2, W+2) in ``_gather_quads(target)``
    order; ``bq_t``: (nz, H, W) the target's RHS quad; ``blocks_w``
    (the wide lane-concatenated gather blocks, (nz, H, nkeys*W), f32 or
    the bf16 lp copy)/``ud_t``/``bet_t``: the target's persisted pack
    fields (gam is recomputed in-kernel); ``rb_t`` the single-plane
    real-only pair.  Returns the new quad (nz, H, W)."""
    nz, H, W = bq_t.shape
    nkeys = blocks_w.shape[2] // W
    tj = _pick_tj(H, nz, W, nkeys, jnp.dtype(bq_t.dtype).itemsize,
                  band_itemsize=jnp.dtype(blocks_w.dtype).itemsize)
    assert tj is not None, f"relax tiled kernel unsupported for H={H}"
    wpad = _roundup8(tj + 2)
    extra = (H - tj + wpad) - (H + 2)
    e3 = tuple(_pad_rows(x, extra, 1) for x in e3)

    def win_spec():
        # windowed state input: all dims Element (Mosaic all-or-none rule),
        # double-buffered — dropping the unread own-quad window freed the
        # VMEM; single-buffering serialized the window DMA behind compute
        return pl.BlockSpec((pl.Element(nz), pl.Element(wpad),
                             pl.Element(W + 2)),
                            lambda i: (_z, i * tj, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(2))

    def blk_spec(lead):
        return pl.BlockSpec((lead, tj, W), lambda i: (_z, i, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(2))

    kern = functools.partial(_kernel, target=target,
                             real_matrix=real_matrix, tj=tj, nkeys=nkeys)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT)
    def wide_spec():
        return pl.BlockSpec((nz, tj, nkeys * W), lambda i: (_z, i, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(2))

    rb_in = [] if rb_t is None else [rb_t]
    rb_specs = [] if rb_t is None else [
        pl.BlockSpec((1, tj, 2 * W), lambda i: (_z, i, _z),
                     memory_space=pltpu.VMEM,
                     pipeline_mode=pl.Buffered(2))]
    in_specs = ([win_spec() for _ in range(3)]
                + [wide_spec()] + rb_specs
                + [blk_spec(nz - 1), blk_spec(nz),
                   pl.BlockSpec((nz, tj, W), lambda i: (_z, i, _z),
                                memory_space=pltpu.VMEM)])
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nz, H, W), bq_t.dtype),
        grid=(H // tj,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nz, tj, W), lambda i: (_z, i, _z),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(*e3, blocks_w, *rb_in, ud_t, bet_t, bq_t)


def _kernel_emit(*refs, target, real_matrix, tj, nkeys):
    """Color update that ALSO emits the target's residual from its own
    gather (ops/relax_compact.residual_from_gather, same expression
    order): for the sweep's last color the emitted value equals a fresh
    residual except on the boundary mirror ring and the 'real' plane-0
    same-color couplings, which the caller patches
    (relax_compact._patch_emitted_residual)."""
    a, b = target
    e = {key: refs[i][:, : tj + 2, :]
         for i, key in enumerate(_gather_quads(target))}
    n = 4 + int(real_matrix)
    ud_ref, bet_ref, d_ref, bq_ref, sol_ref, res_ref = refs[n:]
    blocks = _ref_views(refs[3], refs[4] if real_matrix else None, nkeys,
                        dt=sol_ref.dtype)
    g = gather_blocks(e, blocks, a, b, real_matrix)
    bq = bq_ref[:]
    sol = thomas_factored_unrolled(bet_ref[:], None, ud_ref[:],
                                   bq - g)
    sol_ref[:] = sol
    ud = ud_ref[:]
    z1 = jnp.zeros_like(ud[:1])
    lo2 = jnp.concatenate([z1, ud], axis=0)
    hi2 = jnp.concatenate([ud, z1], axis=0)
    res_ref[:] = (bq
                  - d_ref[:] * sol
                  - lo2 * _kshift(sol, -1)
                  - hi2 * _kshift(sol, 1)
                  - g)


@functools.partial(jax.jit,
                   static_argnames=("target", "real_matrix", "interpret"))
def color_update_tiled_emit(e3: tuple, bq_t: jnp.ndarray, blocks_w,
                            ud_t, bet_t, d_t, target,
                            real_matrix: bool, interpret: bool = False,
                            rb_t=None):
    """:func:`color_update_tiled` + in-kernel residual emission.  Returns
    ``(new quad, raw residual)``, both (nz, H, W); the residual's plane-0
    'real' couplings still reflect pre-update same-color values."""
    nz, H, W = bq_t.shape
    nkeys = blocks_w.shape[2] // W
    tj = _pick_tj(H, nz, W, nkeys, jnp.dtype(bq_t.dtype).itemsize,
                  extra_blk=4)
    assert tj is not None, f"emit relax kernel unsupported for H={H}"
    wpad = _roundup8(tj + 2)
    extra = (H - tj + wpad) - (H + 2)
    e3 = tuple(_pad_rows(x, extra, 1) for x in e3)

    def win_spec():
        return pl.BlockSpec((pl.Element(nz), pl.Element(wpad),
                             pl.Element(W + 2)),
                            lambda i: (_z, i * tj, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(2))

    def blk_spec(lead):
        return pl.BlockSpec((lead, tj, W), lambda i: (_z, i, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(2))

    def wide_spec():
        return pl.BlockSpec((nz, tj, nkeys * W), lambda i: (_z, i, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(2))

    kern = functools.partial(_kernel_emit, target=target,
                             real_matrix=real_matrix, tj=tj, nkeys=nkeys)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT)
    rb_in = [] if rb_t is None else [rb_t]
    rb_specs = [] if rb_t is None else [
        pl.BlockSpec((1, tj, 2 * W), lambda i: (_z, i, _z),
                     memory_space=pltpu.VMEM,
                     pipeline_mode=pl.Buffered(2))]
    in_specs = ([win_spec() for _ in range(3)]
                + [wide_spec()] + rb_specs
                + [blk_spec(nz - 1), blk_spec(nz),
                   blk_spec(nz),
                   pl.BlockSpec((nz, tj, W), lambda i: (_z, i, _z),
                                memory_space=pltpu.VMEM)])
    out_spec = pl.BlockSpec((nz, tj, W), lambda i: (_z, i, _z),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((nz, H, W), bq_t.dtype),
                   jax.ShapeDtypeStruct((nz, H, W), bq_t.dtype)),
        grid=(H // tj,),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        interpret=interpret,
        **kwargs,
    )(*e3, blocks_w, *rb_in, ud_t, bet_t, d_t, bq_t)


def _rr_kernel(*refs, target, real_matrix, tj, nkeys):
    """Fused residual + 8-child restriction for one target quad: emits the
    z-pair sums of r_quad — the target's contribution to the coarse RHS.
    Residual math is ops/stencil.residual in quad form (same term order);
    restriction is fine2coarse_3D's child sum (mg_intergrids.f90:139-162)."""
    a, b_ = target
    e = {key: refs[i][:, : tj + 2, :] for i, key in enumerate(_TKEYS)}
    n = 5 + int(real_matrix)
    blocks = _ref_views(refs[4], refs[5] if real_matrix else None, nkeys)
    d_ref, ud_ref, bq_ref, out_ref = refs[n:]
    nz = d_ref.shape[0]
    pq = e[(a, b_)][:, 1: tj + 1, 1:-1]       # own-quad interior
    ud = ud_ref[:]
    z1 = jnp.zeros_like(ud[:1])
    lo2 = jnp.concatenate([z1, ud], axis=0)   # cA2(k),   couples p(k-1)
    hi2 = jnp.concatenate([ud, z1], axis=0)   # cA2(k+1), couples p(k+1)
    r = (bq_ref[:]
         - d_ref[:] * pq
         - lo2 * _kshift(pq, -1)
         - hi2 * _kshift(pq, 1)
         - gather_blocks(e, blocks, a, b_, real_matrix))
    # z-pair sum via static per-plane adds (a strided leading-dim slice
    # lowers to an unsupported 3-D gather in Mosaic)
    out_ref[:] = jnp.stack([r[2 * k] + r[2 * k + 1] for k in range(nz // 2)],
                           axis=0)


@functools.partial(jax.jit,
                   static_argnames=("target", "real_matrix", "interpret"))
def _rr_one(e4: tuple, bq_t, blocks_w, d_t, ud_t, target,
            real_matrix: bool, interpret: bool = False,
            rb_t=None) -> jnp.ndarray:
    """One target's fused residual+restrict: (nz, H, W) quad data ->
    (nz/2, H, W) z-paired residual sums."""
    nz, H, W = bq_t.shape
    nkeys = blocks_w.shape[2] // W
    tj = _pick_tj(H, nz, W, nkeys, jnp.dtype(bq_t.dtype).itemsize,
                  nwin=4, win_buf=2)
    assert tj is not None, f"residual_restrict kernel unsupported for H={H}"
    wpad = _roundup8(tj + 2)
    extra = (H - tj + wpad) - (H + 2)
    e4 = tuple(_pad_rows(x, extra, 1) for x in e4)

    def win_spec():
        return pl.BlockSpec((pl.Element(nz), pl.Element(wpad),
                             pl.Element(W + 2)),
                            lambda i: (_z, i * tj, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(2))

    def blk_spec(lead):
        return pl.BlockSpec((lead, tj, W), lambda i: (_z, i, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(2))

    kern = functools.partial(_rr_kernel, target=target,
                             real_matrix=real_matrix, tj=tj, nkeys=nkeys)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT)
    def wide_spec():
        return pl.BlockSpec((nz, tj, nkeys * W), lambda i: (_z, i, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(2))

    rb_in = [] if rb_t is None else [rb_t]
    rb_specs = [] if rb_t is None else [
        pl.BlockSpec((1, tj, 2 * W), lambda i: (_z, i, _z),
                     memory_space=pltpu.VMEM,
                     pipeline_mode=pl.Buffered(2))]
    in_specs = ([win_spec() for _ in range(4)]
                + [wide_spec()] + rb_specs
                + [blk_spec(nz), blk_spec(nz - 1),
                   pl.BlockSpec((nz, tj, W), lambda i: (_z, i, _z),
                                memory_space=pltpu.VMEM)])
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nz // 2, H, W), bq_t.dtype),
        grid=(H // tj,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nz // 2, tj, W), lambda i: (_z, i, _z),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(*e4, blocks_w, *rb_in, d_t, ud_t, bq_t)


def residual_restrict_tiled(p: jnp.ndarray, b: jnp.ndarray,
                            pack: CompactPack, real_matrix: bool,
                            interpret: bool = False, cA=None,
                            extend_fn=None) -> jnp.ndarray:
    """Coarse b = restrict(b - A p) in ONE pass over the fine level: the
    V-cycle down-leg residual is never materialized in HBM (it is consumed
    only by fine2coarse there — mg_relax.f90:337/mg_intergrids.f90:16).

    The coarse cell (K, J, I) sums the 8 children = the four target quads'
    z-pair sums at (J, I); the summation tree matches transfer.restrict_3d
    ((j-pairs) then (i-pairs)) for identical rounding.

    ``extend_fn`` maps the quad dict to its halo-extended form; default is
    the single-shard physical mirror (extend_quads).  The shard_map backend
    passes the ppermute seam exchange (parallel/exchange.extend_quads_shard)
    so the kernel runs on per-device local blocks.
    """
    if pack is None:
        assert cA is not None, "need a CompactPack or the band stack"
        pack = build_compact_pack(cA, real_matrix)
    assert p.shape[0] % 2 == 0, "fused residual+restrict needs even nz"
    return residual_restrict_tiled_quads(split_quads(p), split_quads(b),
                                         pack, real_matrix,
                                         interpret=interpret,
                                         extend_fn=extend_fn)


def residual_restrict_tiled_quads(q, bq, pack: CompactPack,
                                  real_matrix: bool, interpret: bool = False,
                                  extend_fn=None) -> jnp.ndarray:
    """Quad-native form of :func:`residual_restrict_tiled` (quad state in,
    FULL coarse array out — the four targets' z-pair sums at (J, I) are the
    8 children of coarse cell (K, J, I))."""
    ti = {t: i for i, t in enumerate(_TKEYS)}
    e = (extend_fn or extend_quads)(q)
    e4 = tuple(e[k] for k in _TKEYS)
    zs = {}
    for t in _TKEYS:
        m = ti[t]
        zs[t] = _rr_one(e4, bq[t], pack.blocks[m], pack.d[m], pack.ud[m],
                        t, real_matrix, interpret=interpret,
                        rb_t=pack.rblocks[m] if real_matrix else None)
    return ((zs[(0, 0)] + zs[(1, 0)]) + (zs[(0, 1)] + zs[(1, 1)]))


def relax_compact_tiled(p: jnp.ndarray, b: jnp.ndarray, pack: CompactPack,
                        nsweeps: int, kind: str, real_matrix: bool,
                        interpret: bool = False, cA=None,
                        extend_fn=None) -> jnp.ndarray:
    """``nsweeps`` RB/FC sweeps with the tiled fused kernel per (color,
    target quad).

    Same iterates as ops/relax_compact.relax_compact (the kernel reuses its
    gather and factored Thomas on the same persisted pack).  Quad halo
    extension between colors stays in XLA (cheap concats, or the ppermute
    seam exchange when ``extend_fn`` is the shard_map form); both targets of
    a color read the same pre-color extension.
    """
    if pack is None:
        assert cA is not None, "need a CompactPack or the band stack"
        pack = build_compact_pack(cA, real_matrix)
    q = relax_compact_tiled_quads(split_quads(p), split_quads(b), pack,
                                  nsweeps, kind, real_matrix,
                                  interpret=interpret, extend_fn=extend_fn)
    return merge_quads(q)


def relax_compact_tiled_quads(q0, bq, pack: CompactPack, nsweeps: int,
                              kind: str, real_matrix: bool,
                              interpret: bool = False, extend_fn=None):
    """Quad-native core of :func:`relax_compact_tiled` (state in/out in
    quad-parity layout — the quad-persistent V-cycle path)."""
    extend = extend_fn or extend_quads
    targets_by_color = _RB_TARGETS if kind == "RB" else _FC_TARGETS
    ti = {t: i for i, t in enumerate(_TKEYS)}

    lp = getattr(pack, "lp", None)
    if lp is not None:
        # bf16 blocks need 16-row tiles (bf16 sublane tiling); shapes
        # that cannot support one keep the f32 operator
        nzq, Hq, Wq = pack.d[0].shape
        nk = lp[0][0].shape[2] // Wq
        if _pick_tj(Hq, nzq, Wq, nk, jnp.dtype(pack.d[0].dtype).itemsize,
                    band_itemsize=jnp.dtype(lp[0][0].dtype).itemsize
                    ) is None:
            lp = None

    def color_update(q, targets):
        e = extend(q)
        q = dict(q)
        for t in targets:
            m = ti[t]
            e3 = tuple(e[k] for k in _gather_quads(t))
            if lp is not None:
                blocks_m = lp[0][m]
                rb_m = lp[1][m] if real_matrix else None
                bet_m = lp[2][m]
            else:
                blocks_m = pack.blocks[m]
                rb_m = pack.rblocks[m] if real_matrix else None
                bet_m = pack.bet[m]
            q[t] = color_update_tiled(
                e3, bq[t], blocks_m, pack.ud[m], bet_m, t,
                real_matrix, interpret=interpret, rb_t=rb_m)
        return q

    def sweep(q):
        for targets in targets_by_color:
            q = color_update(q, targets)
        return q

    if nsweeps <= 1:
        q = dict(q0)
        for _ in range(nsweeps):
            q = sweep(q)
        return q

    def body(i, flat):
        q = sweep(dict(zip(_TKEYS, flat)))
        return tuple(q[k] for k in _TKEYS)

    flat = jax.lax.fori_loop(0, nsweeps, body, tuple(q0[k] for k in _TKEYS))
    return dict(zip(_TKEYS, flat))


def _tiled_fused_parts(bq, pack, real_matrix, interpret, extend_fn):
    """The tiled sweep_fn / color_update_fn / rr_fn plugged into the
    relax_compact fused-residual orchestrators."""
    from ..relax_compact import _TKEYS as TK
    ti = {t: i for i, t in enumerate(TK)}
    extend = extend_fn or extend_quads

    def sweep_fn(q, n):
        return relax_compact_tiled_quads(q, bq, pack, n, "RB", real_matrix,
                                         interpret=interpret,
                                         extend_fn=extend_fn)

    def color_update(q, targets, emit):
        e = extend(q)
        q = dict(q)
        info = {}
        for t in targets:
            m = ti[t]
            e3 = tuple(e[k] for k in _gather_quads(t))
            rb = pack.rblocks[m] if real_matrix else None
            if emit:
                q[t], info[t] = color_update_tiled_emit(
                    e3, bq[t], pack.blocks[m], pack.ud[m], pack.bet[m],
                    pack.d[m], t, real_matrix,
                    interpret=interpret, rb_t=rb)
            else:
                q[t] = color_update_tiled(
                    e3, bq[t], pack.blocks[m], pack.ud[m], pack.bet[m],
                    t, real_matrix, interpret=interpret,
                    rb_t=rb)
        return q, info

    def rr_fn(e2, t):
        m = ti[t]
        e4 = tuple(e2[k] for k in TK)
        return _rr_one(e4, bq[t], pack.blocks[m], pack.d[m], pack.ud[m],
                       t, real_matrix, interpret=interpret,
                       rb_t=pack.rblocks[m] if real_matrix else None)

    return sweep_fn, color_update, rr_fn


def relax_residual_tiled_quads(q0, bq, pack: CompactPack, nsweeps: int,
                               real_matrix: bool, interpret: bool = False,
                               extend_fn=None):
    """Tiled-kernel form of relax_compact.relax_residual_compact_quads:
    ``nsweeps`` RB sweeps + fresh residual, the last color's residual
    emitted by :func:`color_update_tiled_emit` and the first color's
    computed fresh (XLA quad form).  Returns (q, rq); equal to
    relax_compact_tiled_quads followed by residual_quads in exact
    arithmetic (~1 ulp of recompilation noise across the peeled
    final sweep)."""
    from ..relax_compact import relax_residual_compact_quads
    sweep_fn, color_update, _ = _tiled_fused_parts(
        bq, pack, real_matrix, interpret, extend_fn)
    return relax_residual_compact_quads(
        q0, bq, pack, nsweeps, real_matrix, extend_fn=extend_fn,
        sweep_fn=sweep_fn, color_update_fn=color_update)


def relax_residual_restrict_tiled_quads(q0, bq, pack: CompactPack,
                                        nsweeps: int, real_matrix: bool,
                                        interpret: bool = False,
                                        extend_fn=None):
    """Tiled-kernel form of the fused V-cycle down-leg triple: ``nsweeps``
    RB sweeps + restrict(b - A p) in one orchestration — the last color's
    residual comes from its color update, the first color's from the
    fused residual+restrict kernel (`_rr_one`).  Returns (q, coarse_b);
    equal to relax_compact_tiled_quads followed by
    residual_restrict_tiled_quads in exact arithmetic."""
    from ..relax_compact import relax_residual_restrict_compact_quads
    sweep_fn, color_update, rr_fn = _tiled_fused_parts(
        bq, pack, real_matrix, interpret, extend_fn)
    return relax_residual_restrict_compact_quads(
        q0, bq, pack, nsweeps, real_matrix, extend_fn=extend_fn,
        sweep_fn=sweep_fn, color_update_fn=color_update, rr_fn=rr_fn)
