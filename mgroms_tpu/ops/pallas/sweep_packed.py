"""EXPERIMENTAL tile-major packed-stream variant of the color-fused sweep.

FROZEN (round 5): the closing round-4 measurement showed the level-0
smoother stack is VPU-COMPUTE-bound, not DMA-bound
(docs/kernel_dma_notes.md) — this kernel's premise (win by streaming the
operator as wide contiguous DMAs) cannot beat the tiled path even at the
711 GB/s probe rate.  Kept only as the measured record of the
packed-stream design; do not extend.

NOT wired into the solver.  Round-4 measured results at CUC shapes
(scripts/micro_sweep_fused.py with this module, one v5e chip):

  level 0 (64, 512, 512) f32:  24.6 ms/sweep (XLA packing) /
                               22.7 ms (Pallas repack)  vs 12.6 tiled
  level 1 (32, 256, 256) f32:   2.1 ms/sweep            vs 1.57 tiled

i.e. the packed-stream kernel LOSES to the per-color tiled path even
though scripts/micro_dma_probe measured one wide aligned stream at 711
GB/s: the packed blocks here run at only ~190 GB/s effective.  The
leading suspect is the lane-padded DMA destination (slab width 131 pads
to 256 VMEM lanes; the 711 GB/s probe stream was width 3072 = 24x128
exactly), plus the 1536-deep untiled slab dimension.  Kept as the
starting point for a round-5 attempt (slab widths on 128-lane
boundaries, fewer/wider slabs); the shipping kernel is sweep_fused.py.

Original design notes:

Color-fused red-black sweep: ONE Pallas pass per smoother sweep.

The per-(color, target) tiled kernel (relax_tiled.py) reads the persisted
gather blocks per color — and the two colors' four targets together touch
every quad of every band, so each operator band streams from HBM TWICE per
sweep.  This kernel performs the WHOLE sweep (color 0 then color 1,
mg_relax.f90:151-206's two-color loop) per j-tile in one pallas_call, so
each extended band quad is resident once and serves all four targets'
reads at its static (row, col, k) offsets.

Cross-color dependency is handled by a one-row recompute overhang: color 0
is evaluated on rows [J0-1, J0+TJ] (the tile's rows plus one on each side,
recomputed redundantly by the adjacent tiles — deterministic, so the copies
are bitwise identical), and color 1 consumes those in-VMEM values.  Domain
halos need no special data path: the Neumann mirror maps row/col -1 -> 0
and n -> n-1, which always flips the checkerboard parity — every halo read
of a color-0 quad during color 1 is a COLOR-1 value, i.e. the pre-sweep
state already in the mirror fill.

Lane chunking: wide levels split the lane (x) dimension into ``nchunks``
independent pallas_calls over pre-sliced per-chunk arrays; color 0
additionally recomputes the two seam COLUMNS (1-column solves, ~1/128th
of a pass) so color 1's seam reads are bitwise the neighbour chunk's
committed values.  Iterates are bitwise-independent of ``nchunks``.

TILE-MAJOR PACKED OPERATOR STREAMS (round-4 v3).  The v2 kernel fed the
band/pivot data through ``pl.Element`` overlapping windows and lost to the
per-color tiled path despite moving fewer bytes: scripts/micro_dma_probe
measured Element-window streams at ~150 GB/s and separate aligned-block
streams at ~230-240 GB/s REGARDLESS of stream count or HBM contiguity,
while ONE wide aligned stream runs at 711 GB/s — the sustained rate is set
by the width of each (row, z) DMA chunk.  So the per-level operator data
is now stored in TILE-MAJOR PACKED form: for every j-tile, everything the
kernel needs (24 extended band slabs, 12 pivot slabs, seam-pivot slivers)
is laid out contiguously as one (ntiles, S*nz, rows, width) array —
window-overlap rows are DUPLICATED at build time (the stored junk factor
(tj+3)/tj replaces the Element-window junk ws/tj) and each grid step
issues a single multi-MB contiguous DMA per stream.  The per-cycle RHS
and the per-sweep state are packed the same way at relax time (one wide
XLA write each).

Iterates are bitwise relax_compact.relax_compact_quads (same term order,
same factored-Thomas recurrence) when the bands are stored at state
precision; with ``band_dtype=bfloat16`` the gather coefficients are
rounded once at build time and the Thomas pivots are REBUILT from the
rounded operator so the row-sum identity survives
(:func:`consistent_pivots`; plain bf16 bands against f32 pivots collapse
convergence — round-3 negative result).

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
# leave headroom below the 128 MiB hardware VMEM: a VMEM-OOM compile
# wedges the axon tunnel for ~10 min (CLAUDE.md)
_PICK_BUDGET = 120 * 1024 * 1024

_TI = {t: i for i, t in enumerate(_TKEYS)}
_COLOR0 = ((0, 0), (1, 1))     # (i + j) even — updated first (phase 0)
_COLOR1 = ((0, 1), (1, 0))
_NBANDS = 6                    # gather bands 3..8 (cA indices 2..7)
# pivot slab order inside the packed pivot stream: (bet, gam, ud) per
# target, targets in (_COLOR0 + _COLOR1) order
_PTARGETS = _COLOR0 + _COLOR1


def _roundup8(n: int) -> int:
    return (n + 7) // 8 * 8


def _r128(n: int) -> int:
    return (n + 127) // 128 * 128


class _Plan(NamedTuple):
    """Static kernel plan: row tile, lane chunking, stream buffering
    (packed bands / packed pivots / packed state / outputs)."""
    tj: int
    nchunks: int
    bbuf: int
    sbuf: int
    kbuf: int
    obuf: int


def _plan_bytes(plan: _Plan, H: int, nz: int, W: int, itemsize: int,
                band_itemsize: int) -> int:
    """VMEM model for one chunk's pallas_call.  Streams per grid step:
    packed bands (24 slabs x nz x (tj+4) x (Wc+3)), packed pivots (12
    slabs x nz x (tj+2) x Wc), packed seam pivots (6 x nz x (tj+2) x 2),
    packed rhs (4 x nz x (tj+2) x Wc) + seam rhs (2 x nz x (tj+2) x 2),
    packed state (4 x nz x (tj+4) x (Wc+4)), 4 outputs, ~8 main-tile
    live temps + 4 e1 scratch tiles.  VMEM rounds each (rows, lanes)
    pair of a slab to (8, 128) tiles (Mosaic-confirmed)."""
    tj, C = plan.tj, plan.nchunks
    Wc = W // C
    bs = 24 * nz * _roundup8(tj + 4) * _r128(Wc + 3) * band_itemsize
    ps = 12 * nz * _roundup8(tj + 2) * _r128(Wc) * itemsize
    ss = 6 * nz * _roundup8(tj + 2) * 128 * itemsize
    qs = 4 * nz * _roundup8(tj + 2) * _r128(Wc) * itemsize \
        + 2 * nz * _roundup8(tj + 2) * 128 * itemsize
    st = 4 * nz * _roundup8(tj + 4) * _r128(Wc + 4) * itemsize
    blk = nz * _roundup8(tj) * _r128(Wc) * itemsize
    p0t = nz * _roundup8(tj + 2) * _r128(Wc) * itemsize
    scr = nz * _roundup8(tj + 2) * _r128(Wc + 2) * itemsize
    return (plan.bbuf * bs + plan.kbuf * (ps + ss + qs)
            + plan.sbuf * st + 4 * plan.obuf * blk + 8 * p0t + 4 * scr)


def _pick_plan(H: int, nz: int, W: int, itemsize: int,
               band_itemsize: int, force_chunks: int | None = None,
               min_chunk: int = 128) -> _Plan | None:
    """Choose (row tile, lane chunks, buffering).

    Preference: fully double-buffered, largest row tile (the stored junk
    factor is (tj+3)/tj on the dominant band stream), fewest chunks
    (chunking adds kernel launches and seam recomputes).  The band
    stream may degrade to single buffering as a last resort — with
    multi-MB contiguous DMAs the exposed latency is small, unlike the
    v2 Element-window tiers."""
    Cs = (force_chunks,) if force_chunks else (1, 2, 4, 8)
    for tiers in (((2, 2, 2, 2),), ((1, 2, 2, 2),)):
        for tj in (32, 16, 8):
            if H % tj:
                continue
            for C in Cs:
                if W % C or (C > 1 and W // C < min_chunk):
                    continue
                for bbuf, sbuf, kbuf, obuf in tiers:
                    plan = _Plan(tj, C, bbuf, sbuf, kbuf, obuf)
                    if _plan_bytes(plan, H, nz, W, itemsize,
                                   band_itemsize) <= _PICK_BUDGET:
                        return plan
    return None


def supports(nz: int, H: int, W: int, itemsize: int = 4,
             band_itemsize: int = 4) -> bool:
    """True when a packed-stream plan fits VMEM with the state stream
    double-buffered."""
    plan = _pick_plan(H, nz, W, itemsize, band_itemsize)
    return plan is not None and plan.sbuf >= 2


# consistent_pivots: shared with the shipping kernel (single source of
# truth — the duplicated copy here went stale when CompactPack.blocks
# switched to the lane-concatenated wide layout)
from .sweep_fused import consistent_pivots  # noqa: E402


class SweepOperator(NamedTuple):
    """Per-level fused-sweep operator in TILE-MAJOR PACKED layout.

    ``pband[chunk]``: (ntiles, 24*nz, tj+4, Wc+3) — per tile, the 24
    extended band quads' row slabs [J0-2, J0+TJ+2) x cols [I0-1,
    I0+WC+2) (the J0-2 row serves the cmatrix='real' bj=-1 offset),
    band-major then _TKEYS order, overlap rows duplicated.
    ``ppiv[chunk]``: (ntiles, 12*nz, tj+2, Wc) — (bet, gam, ud) per
    target in _PTARGETS order, rows [J0-1, J0+TJ+1), gam/ud zero-padded
    to nz planes.  ``pseam[chunk]``: (ntiles, 6*nz, tj+2, 2) — the
    color-0 targets' pivot values at the two seam columns I0-1 / I0+WC.
    With low-precision bands the pivots baked in are the row-sum-
    consistent rebuilt factors (:func:`consistent_pivots`).  ``plan`` is
    the static kernel plan."""

    pband: tuple
    ppiv: tuple
    pseam: tuple
    plan: _Plan

    @property
    def tj(self) -> int:
        return self.plan.tj


jax.tree_util.register_pytree_node(
    SweepOperator,
    lambda s: ((s.pband, s.ppiv, s.pseam), s.plan),
    lambda plan, c: SweepOperator(c[0], c[1], c[2], plan))


def _zpad_to(x: jnp.ndarray, nz: int) -> jnp.ndarray:
    """Zero-pad the leading (z) dim to ``nz`` planes (uniform slab)."""
    if x.shape[0] == nz:
        return x
    pad = jnp.zeros((nz - x.shape[0],) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def _pad_rows(x: jnp.ndarray, top: int, rows: int) -> jnp.ndarray:
    """``top`` edge-dup rows on top, tail-dup to ``rows`` total."""
    for _ in range(top):
        x = jnp.concatenate([x[:, :1], x], axis=1)
    extra = rows - x.shape[1]
    if extra > 0:
        tail = jnp.concatenate([x[:, -1:]] * extra, axis=1)
        x = jnp.concatenate([x, tail], axis=1)
    return x


def _pad_cols(x: jnp.ndarray, n: int = 1) -> jnp.ndarray:
    """``n`` edge-dup columns each side (keeps every chunk's overhang
    reads in bounds; dup values feed only discarded junk)."""
    for _ in range(n):
        x = jnp.concatenate([x[..., :1], x, x[..., -1:]], axis=-1)
    return x


def _tile_pack(slabs, ntiles: int, tj: int, rows: int) -> jnp.ndarray:
    """Stack per-tile row slabs of each (nz, H', width) array in
    ``slabs`` into ONE tile-major array (ntiles, nslabs*nz, rows,
    width): tile i's block is a single contiguous HBM span."""
    full = jnp.concatenate(list(slabs), axis=0)     # (nslabs*nz, H', w)
    tiles = [full[:, i * tj: i * tj + rows, :] for i in range(ntiles)]
    return jnp.stack(tiles, axis=0)


def build_sweep_operator(cA: jnp.ndarray, pack: CompactPack, nz: int,
                         H: int, W: int, band_dtype=None,
                         itemsize: int = 4,
                         force_chunks: int | None = None,
                         min_chunk: int = 128) -> SweepOperator | None:
    """One-time per-level build (jit alongside assembly).  ``cA`` is the
    extended band stack (8, nz, ny+2, nx+2); ``pack`` supplies the
    Thomas pivots.  ``force_chunks``/``min_chunk`` exist for tests."""
    bd = jnp.dtype(band_dtype) if band_dtype is not None else cA.dtype
    plan = _pick_plan(H, nz, W, itemsize, bd.itemsize,
                      force_chunks=force_chunks, min_chunk=min_chunk)
    if plan is None or plan.sbuf < 2:
        return None
    tj, C = plan.tj, plan.nchunks
    Wc = W // C
    ntiles = H // tj

    # band slabs: rows [J0-2, J0+TJ+2) (the J0-2 row feeds the
    # cmatrix='real' bj=-1 band offset at the row overhang), cols
    # [I0-1, I0+WC+2).  The extended quad (nz, H+2, W+2) has row r <->
    # band row r-1, col c <-> band col c-1; one dup row each end and one
    # dup col each side keep every tile/chunk overhang read in bounds
    # (dup values feed only discarded junk).
    eb = []
    for n in range(2, 8):
        qe = quad_ext_bands(cA[n])
        for t in _TKEYS:
            x = _pad_cols(qe[t].astype(bd), 1)       # width W+4
            x = _pad_rows(x, 1, H + 4)               # rows H+4
            eb.append(x)
    pband = []
    for c in range(C):
        sl = [x[:, :, c * Wc + 1: c * Wc + 1 + Wc + 3] for x in eb]
        pband.append(_tile_pack(sl, ntiles, tj, tj + 4))

    if bd != cA.dtype:
        # low-precision bands: the smoother must solve the CONSISTENT
        # perturbed operator (rounded bands + row-sum-rebuilt diagonal) —
        # f32 pivots against rounded bands break convergence (round-3
        # negative result, see consistent_pivots)
        bet, gam = consistent_pivots(pack, bd)
    else:
        bet, gam = pack.bet, pack.gam

    # pivot slabs: rows [J0-1, J0+TJ+1); 1 dup row each end covers the
    # first/last tile's overhang (values feed junk rows only there)
    piv_full = []
    for t in _PTARGETS:
        m = _TI[t]
        for xs in (bet[m], gam[m], pack.ud[m]):
            piv_full.append(_pad_rows(_zpad_to(xs, nz), 1, H + 2))
    ppiv, pseam = [], []
    for c in range(C):
        sl = [x[:, :, c * Wc: (c + 1) * Wc] for x in piv_full]
        ppiv.append(_tile_pack(sl, ntiles, tj, tj + 2))
        # seam columns I0-1 / I0+WC for the color-0 targets (left seam
        # of chunk 0 / right seam of the last chunk are physical-mirror
        # filled in-kernel, so their dup-col values are never read)
        se = []
        for t in _COLOR0:
            m = _TI[t]
            for xs in (bet[m], gam[m], pack.ud[m]):
                x = _pad_cols(_pad_rows(_zpad_to(xs, nz), 1, H + 2), 1)
                se.append(jnp.concatenate(
                    [x[:, :, c * Wc: c * Wc + 1],
                     x[:, :, c * Wc + Wc + 1: c * Wc + Wc + 2]], axis=2))
        pseam.append(_tile_pack(se, ntiles, tj, tj + 2))
    return SweepOperator(pband=tuple(pband), ppiv=tuple(ppiv),
                         pseam=tuple(pseam), plan=plan)


def _kernel(*refs, tj, nz, Wc, real_matrix, band_lp, first_chunk,
            last_chunk):
    pb, pv, psm, pq, qsm, st = refs[:6]
    outs = refs[6:10]
    scratch = refs[10:]
    n0 = tj + 2                           # phase-0 rows  [J0-1, J0+TJ]
    m0 = Wc + 2                           # scratch cols  [I0-1, I0+WC]
    dt = outs[0].dtype
    k0 = (jax.lax.broadcasted_iota(jnp.int32, (nz, 1, 1), 0) == 0
          ).astype(dt) if real_matrix else None

    def band_read(n, boff, a, b, o, oc, nrows, ncols):
        bk, bj, bi = boff
        kb = ((a + bj) % 2, (b + bi) % 2)
        rjb = (a + bj - kb[0]) // 2
        rib = (b + bi - kb[1]) // 2
        s = ((n - 3) * 4 + _TI[kb]) * nz
        # slab rows: row r <-> band row J0-2+r; cols: c <-> I0-1+c
        x = pb[0, s: s + nz,
               o + rjb + 2: o + rjb + 2 + nrows,
               oc + rib + 1: oc + rib + 1 + ncols]
        if band_lp:
            x = x.astype(dt)
        return _kshift(x, bk)

    def gather(a, b, o, oc, nrows, ncols, reader):
        # exact _BASE_TERMS/_REAL_TERMS summation order of
        # relax_compact.gather_blocks (bitwise-stable)
        s = None
        for n, boff, poff in _BASE_TERMS:
            t = band_read(n, boff, a, b, o, oc, nrows, ncols) \
                * reader(poff, a, b)
            s = t if s is None else s + t
        if real_matrix:
            x = None
            for n, boff, poff in _REAL_TERMS:
                t = band_read(n, boff, a, b, o, oc, nrows, ncols) \
                    * reader(poff, a, b)
                x = t if x is None else x + t
            s = s + k0 * x
        return s

    def piv(t, field, rows, ref=None, cols=None):
        """Pivot slab read: field 0=bet (nz), 1=gam, 2=ud (nz-1)."""
        ref = pv if ref is None else ref
        s = (_PTARGETS.index(t) * 3 + field) * nz if ref is pv \
            else (_COLOR0.index(t) * 3 + field) * nz
        zlen = nz if field == 0 else nz - 1
        c = cols if cols is not None else slice(None)
        return ref[0, s: s + zlen, rows, c]

    # -- phase 0 (color 0): rows [J0-1, J0+TJ], LANE-ALIGNED cols ----------
    # Main tile computes cols [I0, I0+WC) exactly (a (Wc+2)-wide compute
    # pads 130 lanes to 256 and triples phase-0 VPU work — measured).
    # The seam columns I0-1 / I0+WC that phase 1 needs are 1-column
    # recomputes — bitwise the adjacent chunk's values.
    def read_p0(poff, a, b, oc, ncols):
        pk, pj, pi = poff
        kp = ((a + pj) % 2, (b + pi) % 2)
        rj = (a + pj - kp[0]) // 2
        ri = (b + pi - kp[1]) // 2
        s = _TI[kp] * nz
        # state slab rows: r <-> quad row J0-2+r; cols: c <-> I0-2+c
        x = st[0, s: s + nz, rj + 1: rj + 1 + n0,
               oc + ri + 2: oc + ri + 2 + ncols]
        return _kshift(x, pk)

    rall = slice(0, n0)

    def p0_compute(t, oc, ncols):
        a, b = t
        if ncols == Wc:            # main: aligned pivots/rhs
            bet_ = piv(t, 0, rall)
            gam_ = piv(t, 1, rall)
            ud_ = piv(t, 2, rall)
            m = _COLOR0.index(t) * nz
            rhs0 = pq[0, m: m + nz, rall, :]
        else:                      # seam: 1-col slivers (col 0=left)
            ci = 0 if oc < 0 else 1
            cs = slice(ci, ci + 1)
            bet_ = piv(t, 0, rall, ref=psm, cols=cs)
            gam_ = piv(t, 1, rall, ref=psm, cols=cs)
            ud_ = piv(t, 2, rall, ref=psm, cols=cs)
            m = _COLOR0.index(t) * nz
            rhs0 = qsm[0, m: m + nz, rall, cs]
        reader = lambda poff, a, b: read_p0(poff, a, b, oc, ncols)
        rhs = rhs0 - gather(a, b, -1, oc, n0, ncols, reader)
        return thomas_factored_unrolled(bet_, gam_, ud_, rhs)

    p0 = {}
    for t in _COLOR0:
        p0[t] = p0_compute(t, 0, Wc)
        outs[_TI[t]][:] = p0[t][:, 1: tj + 1, :]

    # -- phase 1 (color 1) on rows [J0, J0+TJ) x cols [I0, I0+WC) ----------
    # e1: color-0 quads in halo-extended tile form, materialized in VMEM
    # SCRATCH via stores (in-kernel lane-dim concatenate does not lower —
    # Mosaic "offset mismatch on non-concat dimension").  Interior from
    # the in-VMEM phase-0 values; each quad's live seam column is the
    # 1-column recompute (interior chunk seam) or the PRE-sweep mirror
    # fill (physical boundary — the mirror maps to color-1 points,
    # untouched by phase 0).  Only one seam side per quad is ever read:
    # (·,1) quads at ri<=0 (left), (·,0) at ri>=0 (right).
    i = pl.program_id(0)
    first = i == 0
    last = i == pl.num_programs(0) - 1
    scr = {(0, 0): scratch[0], (1, 1): scratch[1]}

    def state(t, rows, cols):
        s = _TI[t] * nz
        return st[0, s: s + nz, rows, cols]

    for t in _COLOR0:
        s = scr[t]
        s[:, :, 1: Wc + 1] = p0[t]
        if t == (1, 1):
            if first_chunk:
                # col I0-1 at the first chunk is the i=-1 halo
                s[:, :, 0:1] = state(t, slice(1, n0 + 1), slice(1, 2))
            else:
                s[:, :, 0:1] = p0_compute(t, -1, 1)

            # row J0-1 at the first tile is the j=-1 halo
            @pl.when(first)
            def _fix_first(t=t, s=s):
                s[:, 0:1, :] = state(t, slice(1, 2), slice(1, m0 + 1))
        else:
            if last_chunk:
                # col I0+WC at the last chunk is the i=nx halo
                s[:, :, m0 - 1: m0] = state(t, slice(1, n0 + 1),
                                            slice(m0, m0 + 1))
            else:
                s[:, :, m0 - 1: m0] = p0_compute(t, Wc, 1)

            # row J0+TJ at the last tile is the j=ny halo
            @pl.when(last)
            def _fix_last(t=t, s=s):
                s[:, n0 - 1: n0, :] = state(t, slice(n0, n0 + 1),
                                            slice(1, m0 + 1))

    # the real-matrix diagonal terms read the color-1 SIBLING: interior
    # values are pre-color (the documented same-color-read deviation), but
    # its halo ring mirrors to COLOR-0 points — post-phase-0 values.  The
    # patched halo column/row is exactly a column/row of the e1 scratch.
    if real_matrix:
        e10, e01 = scratch[2], scratch[3]
        e10[:, :, :] = state((1, 0), slice(1, n0 + 1), slice(1, m0 + 1))
        if last_chunk:
            e10[:, :, m0 - 1: m0] = scr[(1, 1)][:, :, m0 - 2: m0 - 1]

        @pl.when(first)
        def _fix_e10():
            e10[:, 0:1, :] = scr[(0, 0)][:, 1:2, :]

        e01[:, :, :] = state((0, 1), slice(1, n0 + 1), slice(1, m0 + 1))
        if first_chunk:
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
        x = scr[kp][:, rj + 1: rj + 1 + tj, ri + 1: ri + 1 + Wc]
        return _kshift(x, pk)

    r1 = slice(1, tj + 1)
    for t in _COLOR1:
        a, b = t
        m = (2 + _COLOR1.index(t)) * nz
        rhs = pq[0, m: m + nz, r1, :] - gather(a, b, 0, 0, tj, Wc, read_p1)
        outs[_TI[t]][:] = thomas_factored_unrolled(
            piv(t, 0, r1), piv(t, 1, r1), piv(t, 2, r1), rhs)


@functools.partial(jax.jit, static_argnames=("plan", "nz", "real_matrix",
                                             "chunk", "interpret"))
def _sweep_chunk(pst, pband_c, ppiv_c, pseam_c, pbq_c, pqs_c,
                 plan: _Plan, nz: int, real_matrix: bool, chunk: tuple,
                 interpret: bool = False) -> tuple:
    """One fused sweep over ONE lane chunk, all inputs tile-major packed.
    ``chunk`` = (first_chunk, last_chunk) statics.  Returns the 4 updated
    interior chunk quads (nz, H, Wc)."""
    tj = plan.tj
    ntiles = pst.shape[0]
    H = ntiles * tj
    Wc = ppiv_c.shape[3]
    dt = pst.dtype

    def packed(x, buf):
        sh = (1,) + x.shape[1:]
        return pl.BlockSpec(sh, lambda i: (i,) + (_z,) * (len(sh) - 1),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(buf))

    in_specs = [packed(pband_c, plan.bbuf), packed(ppiv_c, plan.kbuf),
                packed(pseam_c, plan.kbuf), packed(pbq_c, plan.kbuf),
                packed(pqs_c, plan.kbuf), packed(pst, plan.sbuf)]
    out_spec = pl.BlockSpec((nz, tj, Wc), lambda i: (_z, i, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(plan.obuf))
    kern = functools.partial(
        _kernel, tj=tj, nz=nz, Wc=Wc, real_matrix=real_matrix,
        band_lp=pband_c.dtype != dt, first_chunk=chunk[0],
        last_chunk=chunk[1])
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT)
    # VMEM scratch for the phase-1 halo-extended color-0 tiles (e1) and,
    # under cmatrix='real', the patched color-1 sibling tiles
    nscr = 4 if real_matrix else 2
    # the kernel reorders reads: pband, ppiv, pseam, pbq, pqs, state
    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((nz, H, Wc), dt)
                   for _ in range(4)],
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=[out_spec] * 4,
        scratch_shapes=[pltpu.VMEM((nz, tj + 2, Wc + 2), dt)
                        for _ in range(nscr)],
        interpret=interpret,
        **kwargs,
    )(pband_c, ppiv_c, pseam_c, pbq_c, pqs_c, pst)
    return tuple(outs)


def _pack_kernel(*refs, nslabs, nz, tj, rows, Wc, wpad, C):
    """Repack ``nslabs`` full-width arrays into per-chunk tile-major
    slabs: per grid step, copy rows [i*tj, i*tj+rows) x each chunk's
    [c*Wc, c*Wc+Wc+wpad) columns into chunk c's packed block."""
    ins = refs[:nslabs]
    outs = refs[nslabs:]
    for c in range(C):
        for s in range(nslabs):
            o = outs[c]
            if wpad < 0:     # seam mode: the 2 columns framing the chunk
                o[0, s * nz: (s + 1) * nz, :, 0:1] = \
                    ins[s][:, :rows, c * Wc: c * Wc + 1]
                o[0, s * nz: (s + 1) * nz, :, 1:2] = \
                    ins[s][:, :rows, c * Wc + Wc + 1: c * Wc + Wc + 2]
            else:
                o[0, s * nz: (s + 1) * nz, :, :] = \
                    ins[s][:, :rows, c * Wc: c * Wc + Wc + wpad]


@functools.partial(jax.jit, static_argnames=("tj", "rows", "Wc", "wpad",
                                             "C", "interpret"))
def _pack_streams(arrs: tuple, tj: int, rows: int, Wc: int, wpad: int,
                  C: int, interpret: bool = False) -> tuple:
    """Tile-major packing of full-width padded arrays (nz, H', W') into C
    per-chunk (ntiles, nslabs*nz, rows, Wc+wpad) streams — as a Pallas
    kernel.  The pure-XLA form of this packing (unaligned 132-wide lane
    slices + a 32-way overlapping-slice stack) measured 13 ms for the
    state stream alone at CUC level 0 (~55 GB/s); here the reads are
    j-windows and each output block is one wide contiguous store."""
    nslabs = len(arrs)
    nz, Hp, Wp = arrs[0].shape
    ntiles = (Hp - rows) // tj + 1
    ws = _roundup8(rows)

    def win(a):
        return pl.BlockSpec((pl.Element(a.shape[0]), pl.Element(ws),
                             pl.Element(Wp)),
                            lambda i: (_z, i * tj, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(2))

    width = 2 if wpad < 0 else Wc + wpad

    def po(c):
        return pl.BlockSpec((1, nslabs * nz, rows, width),
                            lambda i: (i, _z, _z, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(2))

    # pad rows so the last window stays in bounds
    hs = (ntiles - 1) * tj + ws
    arrs = tuple(_pad_rows(a, 0, hs) for a in arrs)
    kern = functools.partial(_pack_kernel, nslabs=nslabs, nz=nz, tj=tj,
                             rows=rows, Wc=Wc, wpad=wpad, C=C)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT)
    return pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct(
            (ntiles, nslabs * nz, rows, width), arrs[0].dtype)
            for _ in range(C)],
        grid=(ntiles,),
        in_specs=[win(a) for a in arrs],
        out_specs=[po(c) for c in range(C)],
        interpret=interpret,
        **kwargs,
    )(*arrs)


def relax_fused_sweep(q0, bq, pack: CompactPack, nsweeps: int,
                      real_matrix: bool, interpret: bool = False):
    """``nsweeps`` fused RB sweeps; quad-parity state dict in/out (the
    quad-persistent V-cycle path).  ``pack.sweep`` must hold the
    SweepOperator; the per-cycle RHS is packed once per call (amortized
    over nsweeps), the state once per sweep."""
    sop = pack.sweep
    plan = sop.plan
    tj, C = plan.tj, plan.nchunks
    H = q0[(0, 0)].shape[1]
    W = q0[(0, 0)].shape[2]
    nz = q0[(0, 0)].shape[0]
    Wc = W // C
    ntiles = H // tj

    # pack the RHS (once per call, Pallas repack — the pure-XLA packing
    # measured ~55 GB/s, see _pack_streams): main slabs (4 targets,
    # color-0 first) rows [J0-1, J0+TJ+1) + color-0 seam slivers
    bq_full = tuple(_pad_rows(bq[t], 1, H + 2) for t in _PTARGETS)
    pbq_c = _pack_streams(bq_full, tj, tj + 2, Wc, 0, C,
                          interpret=interpret)
    bq_se = tuple(_pad_cols(_pad_rows(bq[t], 1, H + 2), 1)
                  for t in _COLOR0)
    pqs_c = _pack_streams(bq_se, tj, tj + 2, Wc, -2, C,
                          interpret=interpret)

    q = dict(q0)
    for _ in range(nsweeps):
        e = extend_quads(q)
        # state slabs: rows [J0-2, J0+TJ+2) x cols [I0-2, I0+WC+2);
        # extended quad row r <-> quad row r-1, so top-pad 1 more
        st_full = tuple(_pad_rows(_pad_cols(e[t], 1), 1, H + 4)
                        for t in _TKEYS)
        psts = _pack_streams(st_full, tj, tj + 4, Wc, 4, C,
                             interpret=interpret)
        parts = []
        for c in range(C):
            parts.append(_sweep_chunk(
                psts[c], sop.pband[c], sop.ppiv[c], sop.pseam[c],
                pbq_c[c], pqs_c[c], plan, nz, real_matrix,
                (c == 0, c == C - 1), interpret=interpret))
        if C == 1:
            outs = parts[0]
        else:
            outs = tuple(jnp.concatenate([parts[c][m] for c in range(C)],
                                         axis=2) for m in range(4))
        q = dict(zip(_TKEYS, outs))
    return q
