"""Color-fused red-black sweep: ONE Pallas pass per smoother sweep.

The per-(color, target) tiled kernel (relax_tiled.py) reads the persisted
gather blocks per color — and the two colors' four targets together touch
every quad of every band, so each operator band streams from HBM TWICE per
sweep (~4.6 GB of the ~7 GB/sweep at CUC level 0; measured 13.6 ms/sweep,
scripts/micro_relax_kernel.py).  This kernel performs the WHOLE sweep
(color 0 then color 1, mg_relax.f90:151-206's two-color loop) per j-tile in
one pallas_call, so each extended band quad is resident once and serves all
four targets' reads at its static (row, col, k) offsets: operator traffic
halves, and the state is read once per sweep instead of once per color.

Cross-color dependency is handled by a one-row recompute overhang: color 0
is evaluated on rows [J0-1, J0+TJ] (the tile's rows plus one on each side,
recomputed redundantly by the adjacent tiles — deterministic, so the copies
are bitwise identical), and color 1 consumes those in-VMEM values.  Domain
halos need no special data path: the Neumann mirror maps row/col -1 -> 0
and n -> n-1, which always flips the checkerboard parity — every halo read
of a color-0 quad during color 1 is a COLOR-1 value, i.e. the pre-sweep
state already in the window (bc.extend_h1 semantics; the two where-fixes
below patch the first/last tile's overhang row from it).

Iterates are bitwise relax_compact.relax_compact_quads (same term order,
same factored-Thomas recurrence) when the bands are stored at state
precision; with ``band_dtype=bfloat16`` the gather coefficients are rounded
once at build time (the upcast multiply is exact, so the kernel still
bitwise-matches an XLA path reading the same rounded bands — see
tests/test_sweep_fused.py).

Reference hot loop: mg_relax.f90:237-334.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..relax import thomas_factored_unrolled
from ..relax_compact import (_BASE_TERMS, _REAL_TERMS, _TKEYS, CompactPack,
                             _kshift, extend_quads, quad_ext_bands)

_z = np.int32(0)   # index maps must return i32: literal ints trace as
                   # i64 under jax_enable_x64 (refine pairs an f64 host
                   # model with the f32 TPU solve) and Mosaic fails to
                   # legalize the i64 func.return

VMEM_LIMIT = 128 * 1024 * 1024
# calibrated against Mosaic's own VMEM report at CUC level-0 shapes (the
# tier model below matched its 137.6 MiB to 0.3%); leave ~2.5 MiB headroom
_PICK_BUDGET = 126 * 1024 * 1024

_TI = {t: i for i, t in enumerate(_TKEYS)}
_COLOR0 = ((0, 0), (1, 1))     # (i + j) even — updated first (phase 0)
_COLOR1 = ((0, 1), (1, 0))
_NBANDS = 6                    # gather bands 3..8 (cA indices 2..7)


def _roundup8(n: int) -> int:
    return (n + 7) // 8 * 8


def _pick_tj(H: int, nz: int, W: int, itemsize: int, band_itemsize: int):
    """Row tile and pipeline buffering.  VMEM: 4 state Element windows +
    24 band Element windows (wpad_s rows), the phase-0 targets' 8
    tridiag/rhs windows (wpad_t, single-buffered), the phase-1 targets' 8
    aligned blocks, 4 outputs, 4 e1 scratch tiles, ~14 tile-sized temps
    (gather accumulator, phase-0 values, unrolled-Thomas state).

    Returns (tj, band_buf, state_buf, block_buf, out_buf).  Buffering tiers
    are dropped from the most traffic-heavy stream last: double-buffered
    everything, then single-buffer bands, then the phase-1 blocks, then the
    state windows, then the outputs (the largest shapes still fit fully
    serialized — the kernel stays a big win over two per-color passes even
    without overlap, relax_tiled streams every band twice).  The temp count
    (28 tile-sized live values: gather accumulator, band_read temps,
    phase-0 values, unrolled-Thomas state) is calibrated against Mosaic's
    VMEM report at CUC level-0 shapes."""
    We = W + 2
    for cand in (16, 8):
        if H % cand:
            continue
        ws, wt = _roundup8(cand + 4), _roundup8(cand + 2)
        sw = nz * ws * We * itemsize
        bw = nz * ws * We * band_itemsize
        tw = nz * wt * W * itemsize
        blk = nz * cand * W * itemsize
        scr = nz * _roundup8(cand + 2) * We * itemsize     # 4 e1 scratch
        for bbuf, sbuf, kbuf, obuf in ((2, 2, 2, 2), (1, 2, 2, 2),
                                       (1, 2, 1, 2), (1, 1, 1, 2),
                                       (1, 1, 1, 1)):
            need = (4 * sbuf * sw + 24 * bbuf * bw + 8 * tw
                    + 8 * kbuf * blk + 4 * obuf * blk + 28 * blk
                    + 4 * scr)
            if need <= _PICK_BUDGET:
                return cand, bbuf, sbuf, kbuf, obuf
    return None, None, None, None, None


def supports(nz: int, H: int, W: int, itemsize: int = 4,
             band_itemsize: int = 4) -> bool:
    """True when the fused sweep both fits VMEM and keeps the state
    windows double-buffered.  The fully-serialized tier (sbuf == 1) fits
    but LOSES to the per-color tiled path on hardware (measured at CUC
    level 0: 15.8 ms/sweep vs 13.3 tiled — no DMA/compute overlap), so it
    is not offered.  bf16 bands DO restore the double-buffered fit at CUC
    level 0 and measure 117 ms/F-cycle (vs 130.5 f32) — but they BREAK
    convergence (rel residual 0.168 after 6 F-cycles vs 5.1e-05): rounding
    the gather bands to 8-bit mantissas while the Thomas pivots keep the
    f32 diagonal destroys the row-sum consistency (diag = −Σ off-diags,
    mg_define_matrix.f90) the smoother's contraction depends on.
    ``fused_bands_bf16`` therefore stays opt-in/experimental."""
    tj, _, sbuf, _, _ = _pick_tj(H, nz, W, itemsize, band_itemsize)
    return tj is not None and sbuf >= 2


class SweepOperator(NamedTuple):
    """Per-level fused-sweep operator: 24 pre-padded extended band quads,
    shared by all four targets' gather reads.  The factored Thomas pivots
    stay in the CompactPack (phase 1 reads them aligned; phase 0's
    window-padded copies are built per relax call — cheap, amortized over
    nsweeps, and no duplicated HBM).  ``tj`` is the build-time row tile
    (static)."""

    ebands: tuple    # 24 x (nz, Hs, W+2), band-major then _TKEYS order
    tj: int


jax.tree_util.register_pytree_node(
    SweepOperator,
    lambda s: ((s.ebands,), s.tj),
    lambda tj, c: SweepOperator(*c, tj=tj))


def _pad_window(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Top-pad 1 edge-dup row (so windows starting at the first tile stay
    in bounds) and tail-pad to ``rows`` total (last tile's window)."""
    x = jnp.concatenate([x[:, :1], x], axis=1)
    extra = rows - x.shape[1]
    if extra > 0:
        tail = jnp.concatenate([x[:, -1:]] * extra, axis=1)
        x = jnp.concatenate([x, tail], axis=1)
    return x


def build_sweep_operator(cA: jnp.ndarray, pack: CompactPack, nz: int,
                         H: int, W: int, band_dtype=None,
                         itemsize: int = 4) -> SweepOperator | None:
    """One-time per-level build (jit alongside assembly).  ``cA`` is the
    extended band stack (8, nz, ny+2, nx+2); ``pack`` is kept for the
    Thomas pivots at relax time."""
    bd = jnp.dtype(band_dtype) if band_dtype is not None else cA.dtype
    if not supports(nz, H, W, itemsize, bd.itemsize):
        return None
    tj = _pick_tj(H, nz, W, itemsize, bd.itemsize)[0]
    if tj is None:
        return None
    hs = H - tj + _roundup8(tj + 4)      # padded rows, state/band geometry
    ebands = []
    for n in range(2, 8):                # bands 3..8
        qe = quad_ext_bands(cA[n])
        for t in _TKEYS:
            ebands.append(_pad_window(qe[t].astype(bd), hs))
    return SweepOperator(ebands=tuple(ebands), tj=tj)


def _kernel(*refs, tj, real_matrix, band_lp):
    sw = {t: refs[i] for i, t in enumerate(_TKEYS)}
    bands = refs[4:28]
    # phase-0 targets: window-padded tridiag/rhs (rows [J0-1, J0+TJ]);
    # phase-1 targets: aligned blocks (rows [J0, J0+TJ) exactly)
    c0 = {t: {"bet": refs[28 + i], "gam": refs[30 + i], "ud": refs[32 + i],
              "bq": refs[34 + i]} for i, t in enumerate(_COLOR0)}
    c1 = {t: {"bet": refs[36 + i], "gam": refs[38 + i], "ud": refs[40 + i],
              "bq": refs[42 + i]} for i, t in enumerate(_COLOR1)}
    outs = refs[44:48]
    scratch = refs[48:]
    nz = outs[0].shape[0]
    W = outs[0].shape[2]
    We = W + 2
    dt = outs[0].dtype
    k0 = (jax.lax.broadcasted_iota(jnp.int32, (nz, 1, 1), 0) == 0
          ).astype(dt) if real_matrix else None

    def band_read(n, boff, a, b, o, nrows):
        bk, bj, bi = boff
        kb = ((a + bj) % 2, (b + bi) % 2)
        rjb = (a + bj - kb[0]) // 2
        rib = (b + bi - kb[1]) // 2
        x = bands[(n - 3) * 4 + _TI[kb]][
            :, o + rjb + 2: o + rjb + 2 + nrows, 1 + rib: 1 + rib + W]
        if band_lp:
            x = x.astype(dt)
        return _kshift(x, bk)

    def gather(a, b, o, nrows, reader):
        # exact _BASE_TERMS/_REAL_TERMS summation order of
        # relax_compact.gather_blocks (bitwise-stable)
        s = None
        for n, boff, poff in _BASE_TERMS:
            t = band_read(n, boff, a, b, o, nrows) * reader(poff, a, b)
            s = t if s is None else s + t
        if real_matrix:
            x = None
            for n, boff, poff in _REAL_TERMS:
                t = band_read(n, boff, a, b, o, nrows) * reader(poff, a, b)
                x = t if x is None else x + t
            s = s + k0 * x
        return s

    # -- phase 0 (color 0) on rows [J0-1, J0+TJ] ----------------------------
    n0 = tj + 2

    def read_p0(poff, a, b):
        pk, pj, pi = poff
        kp = ((a + pj) % 2, (b + pi) % 2)
        rj = (a + pj - kp[0]) // 2
        ri = (b + pi - kp[1]) // 2
        x = sw[kp][:, rj + 1: rj + 1 + n0, 1 + ri: 1 + ri + W]
        return _kshift(x, pk)

    p0 = {}
    for t in _COLOR0:
        a, b = t
        r = c0[t]
        rhs = r["bq"][:, 0:n0, :] - gather(a, b, -1, n0, read_p0)
        p0[t] = thomas_factored_unrolled(
            r["bet"][:, 0:n0, :], r["gam"][:, 0:n0, :],
            r["ud"][:, 0:n0, :], rhs)
        outs[_TI[t]][:] = p0[t][:, 1: tj + 1, :]

    # -- phase 1 (color 1) on rows [J0, J0+TJ) ------------------------------
    # e1: color-0 quads in halo-extended tile form, materialized in VMEM
    # SCRATCH via stores (in-kernel lane-dim concatenate does not lower —
    # Mosaic "offset mismatch on non-concat dimension").  Interior = the
    # in-VMEM phase-0 values (incl. the overhang rows); x-halos and the
    # first/last tile's out-of-domain row come from the PRE-sweep windows —
    # the mirror rule maps them to color-1 points, untouched by phase 0.
    i = pl.program_id(0)
    first = i == 0
    last = i == pl.num_programs(0) - 1
    scr = {(0, 0): scratch[0], (1, 1): scratch[1]}
    for t in _COLOR0:
        swt, s = sw[t], scr[t]
        s[:, :, 1: W + 1] = p0[t]
        s[:, :, 0:1] = swt[:, 1: n0 + 1, 0:1]
        s[:, :, W + 1: We] = swt[:, 1: n0 + 1, We - 1: We]
        if t == (1, 1):
            # row J0-1 at the first tile is the j=-1 halo
            @pl.when(first)
            def _fix_first(swt=swt, s=s):
                s[:, 0:1, :] = swt[:, 1:2, :We]
        else:
            # row J0+TJ at the last tile is the j=ny halo
            @pl.when(last)
            def _fix_last(swt=swt, s=s):
                s[:, n0 - 1: n0, :] = swt[:, n0: n0 + 1, :We]

    # the real-matrix diagonal terms read the color-1 SIBLING: interior
    # values are pre-color (the documented same-color-read deviation), but
    # its halo ring mirrors to COLOR-0 points — post-phase-0 values.  The
    # patched halo column/row is exactly a column/row of the e1 scratch.
    if real_matrix:
        s10, s01 = sw[(1, 0)], sw[(0, 1)]
        e10, e01 = scratch[2], scratch[3]
        e10[:, :, 0: W + 1] = s10[:, 1: n0 + 1, 0: W + 1]
        e10[:, :, W + 1: We] = scr[(1, 1)][:, :, W: W + 1]

        @pl.when(first)
        def _fix_e10():
            e10[:, 0:1, :] = scr[(0, 0)][:, 1:2, :]

        e01[:, :, 1: We] = s01[:, 1: n0 + 1, 1: We]
        e01[:, :, 0:1] = scr[(0, 0)][:, :, 1:2]

        @pl.when(last)
        def _fix_e01():
            e01[:, n0 - 1: n0, :] = scr[(1, 1)][:, n0 - 2: n0 - 1, :]

        scr[(1, 0)], scr[(0, 1)] = e10, e01

    def read_p1(poff, a, b):
        pk, pj, pi = poff
        kp = ((a + pj) % 2, (b + pi) % 2)
        rj = (a + pj - kp[0]) // 2
        ri = (b + pi - kp[1]) // 2
        x = scr[kp][:, rj + 1: rj + 1 + tj, 1 + ri: 1 + ri + W]
        return _kshift(x, pk)

    for t in _COLOR1:
        a, b = t
        r = c1[t]
        rhs = r["bq"][:] - gather(a, b, 0, tj, read_p1)
        outs[_TI[t]][:] = thomas_factored_unrolled(
            r["bet"][:], r["gam"][:], r["ud"][:], rhs)


@functools.partial(jax.jit, static_argnames=("real_matrix", "interpret"))
def _sweep_once(eP: tuple, sop: SweepOperator, t0: tuple, t1: tuple,
                real_matrix: bool, interpret: bool = False) -> tuple:
    """One fused sweep.  ``eP``: the 4 window-padded extended state quads
    (_TKEYS order); ``t0``: the phase-0 targets' window-padded
    (bet, bet, gam, gam, ud, ud, bq, bq); ``t1``: the phase-1 targets'
    aligned (unpadded) same.  Returns the 4 updated interior quads."""
    tj = sop.tj
    nz, _, We = eP[0].shape
    W = We - 2
    ws, wt = _roundup8(tj + 4), _roundup8(tj + 2)
    H = t1[-1].shape[1]
    band_lp = sop.ebands[0].dtype != eP[0].dtype
    _, bbuf, sbuf, kbuf, obuf = _pick_tj(
        H, nz, W, jnp.dtype(eP[0].dtype).itemsize,
        jnp.dtype(sop.ebands[0].dtype).itemsize)

    def win(lead, rows, cols, buf):
        return pl.BlockSpec((pl.Element(lead), pl.Element(rows),
                             pl.Element(cols)),
                            lambda i: (_z, i * tj, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(buf))

    def blk(lead):
        return pl.BlockSpec((lead, tj, W), lambda i: (_z, i, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(kbuf))

    in_specs = ([win(nz, ws, We, sbuf) for _ in range(4)]
                + [win(nz, ws, We, bbuf) for _ in range(24)]
                + [win(nz, wt, W, 1) for _ in range(2)]        # bet (p0)
                + [win(nz - 1, wt, W, 1) for _ in range(4)]    # gam, ud
                + [win(nz, wt, W, 1) for _ in range(2)]        # bq  (p0)
                + [blk(nz), blk(nz),                           # bet (p1)
                   blk(nz - 1), blk(nz - 1),                   # gam
                   blk(nz - 1), blk(nz - 1),                   # ud
                   blk(nz), blk(nz)])                          # bq
    out_spec = pl.BlockSpec((nz, tj, W), lambda i: (_z, i, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(obuf))
    kern = functools.partial(_kernel, tj=tj, real_matrix=real_matrix,
                             band_lp=band_lp)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT)
    # VMEM scratch for the phase-1 halo-extended color-0 tiles (e1) and,
    # under cmatrix='real', the patched color-1 sibling tiles
    nscr = 4 if real_matrix else 2
    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((nz, H, W), eP[0].dtype)
                   for _ in range(4)],
        grid=(H // tj,),
        in_specs=in_specs,
        out_specs=[out_spec] * 4,
        scratch_shapes=[pltpu.VMEM((nz, tj + 2, We), eP[0].dtype)
                        for _ in range(nscr)],
        interpret=interpret,
        **kwargs,
    )(*eP, *sop.ebands, *t0, *t1)
    return tuple(outs)


def relax_fused_sweep(q0, bq, pack: CompactPack, nsweeps: int,
                      real_matrix: bool, interpret: bool = False):
    """``nsweeps`` fused RB sweeps; quad-parity state dict in/out (the
    quad-persistent V-cycle path).  ``pack.sweep`` must hold the
    SweepOperator; the Thomas pivots come from the pack (phase 1 reads
    them aligned; phase 0's window-padded copies are made here, once per
    call, amortized over nsweeps)."""
    sop = pack.sweep
    tj = sop.tj
    H = q0[(0, 0)].shape[1]
    ws, wt = _roundup8(tj + 4), _roundup8(tj + 2)
    hs, ht = H - tj + ws, H - tj + wt
    m0 = [_TI[t] for t in _COLOR0]
    m1 = [_TI[t] for t in _COLOR1]
    pt = lambda xs: tuple(_pad_window(xs[m], ht) for m in m0)
    t0 = (pt(pack.bet) + pt(pack.gam) + pt(pack.ud)
          + tuple(_pad_window(bq[t], ht) for t in _COLOR0))
    t1 = (tuple(pack.bet[m] for m in m1) + tuple(pack.gam[m] for m in m1)
          + tuple(pack.ud[m] for m in m1) + tuple(bq[t] for t in _COLOR1))
    q = dict(q0)
    for _ in range(nsweeps):
        e = extend_quads(q)
        eP = tuple(_pad_window(e[t], hs) for t in _TKEYS)
        outs = _sweep_once(eP, sop, t0, t1, real_matrix,
                           interpret=interpret)
        q = dict(zip(_TKEYS, outs))
    return q
