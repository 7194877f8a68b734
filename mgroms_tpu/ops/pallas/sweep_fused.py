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
state already in the window (bc.extend_h1 semantics; the edge fixes below
patch the physical-boundary rows/cols from it).

Lane chunking (round 4): at CUC level 0 the f32 band windows alone cost
~101 MiB double-buffered — past VMEM — so round 3 gated the kernel OFF at
exactly the level that dominates the F-cycle.  The fix is to split the lane
(x) dimension into ``nchunks`` PRE-SLICED per-chunk HBM arrays (Mosaic
windows must have a minor dim that is a multiple of 128 or FULL — separate
arrays make any chunk width "full") and run one pallas_call per chunk.
The cross-color dependency now also crosses chunk seams, handled the same
way as rows: color 0 recomputes a one-COLUMN overhang on each side of the
chunk (cols [I0-1, I0+WC]), so color 1's seam reads are in-VMEM values
bitwise equal to the neighbour chunk's committed ones.  Physical-edge
columns (first/last chunk only) keep the mirror-fill data path.  Iterates
are bitwise-independent of ``nchunks``.

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
# the tile-rounded model below reproduces Mosaic's VMEM report at CUC
# level-0 chunked shapes to ~0.5% (138.0 vs 138.60 MiB); leave ~3 MiB
# headroom for that residual plus compiler slack — a VMEM-OOM compile
# wedges the axon tunnel for ~10 min (CLAUDE.md)
_PICK_BUDGET = 125 * 1024 * 1024

_TI = {t: i for i, t in enumerate(_TKEYS)}
_COLOR0 = ((0, 0), (1, 1))     # (i + j) even — updated first (phase 0)
_COLOR1 = ((0, 1), (1, 0))
_NBANDS = 6                    # gather bands 3..8 (cA indices 2..7)


def _roundup8(n: int) -> int:
    return (n + 7) // 8 * 8


class _Plan(NamedTuple):
    """Static kernel plan: row tile, lane chunking and pipeline buffering
    (band windows, state windows, phase-1 blocks, outputs, phase-0
    pivot/rhs windows)."""
    tj: int
    nchunks: int
    bbuf: int
    sbuf: int
    kbuf: int
    obuf: int
    tbuf: int


def _r128(n: int) -> int:
    return (n + 127) // 128 * 128


def _plan_bytes(plan: _Plan, H: int, nz: int, W: int, itemsize: int,
                band_itemsize: int) -> int:
    """VMEM model for one chunk's pallas_call under ``plan``.  Windows: 4
    state + 24 band Element windows (ws rows, full chunk width), 8 phase-0
    pivot/rhs windows (wt rows), 8 phase-1 aligned blocks, 4 outputs, plus
    ~8 phase-0-tile-sized live temps (gather accumulator, band_read temps,
    phase-0 values, unrolled-Thomas state) and the 4 e1 scratch tiles.

    Every (rows, lanes) pair is rounded to full (8, 128) VMEM tiles: a
    width-132 window allocates 256 lanes.  Calibrated against Mosaic's
    own per-allocation VMEM report at CUC level-0 chunked shapes (round
    4): 28 windows x 3.00 MiB + 8 pivot windows x ~3 + 8 blocks x ~1 +
    4 outputs x 1 = 119.75 MiB tagged, 138.60 total -> 18.85 MiB of
    untagged temps+scratch = 12 p0-tiles; this model reproduces the
    138.60 exactly.  The rounding is why chunk widths keep the ALIGNED
    streams exactly on 128 lanes and the windowed streams eat one
    partially-used lane tile."""
    tj, C = plan.tj, plan.nchunks
    Wc = W // C
    ws, wt = _roundup8(tj + 4), _roundup8(tj + 2)
    sw = nz * ws * _r128(Wc + 4) * itemsize
    bw = nz * ws * _r128(Wc + 4) * band_itemsize
    tw = nz * wt * _r128(Wc + 2) * itemsize
    blk = nz * _roundup8(tj) * _r128(Wc) * itemsize
    p0t = nz * _roundup8(tj + 2) * _r128(Wc) * itemsize      # aligned main
    scr = nz * _roundup8(tj + 2) * _r128(Wc + 2) * itemsize  # e1 tiles
    return (4 * plan.sbuf * sw + 24 * plan.bbuf * bw
            + 8 * plan.tbuf * tw + 8 * plan.kbuf * blk
            + 4 * plan.obuf * blk + 8 * p0t + 4 * scr)


def _pick_plan(H: int, nz: int, W: int, itemsize: int,
               band_itemsize: int, force_chunks: int | None = None,
               min_chunk: int = 128) -> _Plan | None:
    """Choose (row tile, lane chunks, buffering).

    Preference order: fully double-buffered plans first, by band-window
    junk factor ws/tj (1.25 at tj=32, 1.5 at 16, 2.0 at 8 — the bands are
    the dominant HBM stream, so the junk factor IS the traffic model),
    then fewest chunks (chunking adds per-sweep kernel launches and a ~3%
    recompute overhang).  Only when no (tj, chunks) combination
    double-buffers everything does the unchunked ladder degrade buffering
    tiers, traffic-heaviest stream last; chunked plans never degrade — a
    chunked AND serialized kernel would lose to the per-color tiled path
    twice over (round-3 measurement: the serialized full-width tier
    already loses, 15.8 vs 13.3 ms/sweep)."""
    if force_chunks:
        Cs = (force_chunks,)
    elif band_itemsize >= itemsize:
        # full-precision bands: chunked plans measured slower than the
        # per-color tiled fallback (see supports()) — never pick them
        Cs = (1,)
    else:
        Cs = (1, 2, 4, 8)
    full = ((2, 2, 2, 2, 2), (2, 2, 2, 2, 1))
    degraded = ((1, 2, 2, 2, 1), (1, 2, 1, 2, 1), (1, 1, 1, 2, 1),
                (1, 1, 1, 1, 1))
    for tiers, allow_chunk in ((full, True), (degraded, False)):
        for tj in (32, 16, 8):
            if H % tj:
                continue
            for C in Cs:
                if W % C or (C > 1 and W // C < min_chunk) \
                        or (C > 1 and not allow_chunk):
                    continue
                for bbuf, sbuf, kbuf, obuf, tbuf in tiers:
                    plan = _Plan(tj, C, bbuf, sbuf, kbuf, obuf, tbuf)
                    if _plan_bytes(plan, H, nz, W, itemsize,
                                   band_itemsize) <= _PICK_BUDGET:
                        return plan
    return None


def supports(nz: int, H: int, W: int, itemsize: int = 4,
             band_itemsize: int = 4) -> bool:
    """True when the fused sweep fits VMEM with double-buffered state
    windows (the fully-serialized tier fits at more shapes but LOSES to
    the per-color tiled path on hardware — measured 15.8 vs 13.3 ms/sweep
    at CUC level 0 — so it is not offered).

    Round-4 measurement: lane-CHUNKED plans at full-precision bands also
    lose to the per-color tiled path (17.0 vs 12.6 ms/sweep at CUC level
    0 — the chunked window pattern runs at a much lower effective HBM
    rate, so halving the band traffic relative to two per-color passes
    does not materialize as time).  Chunked plans are therefore offered
    only when the bands are stored at lower precision than the state
    (the one case measured competitive); full-precision levels keep the
    unchunked plans (wins at CUC levels 1+, round 3) and fall back to
    the tiled path where only a chunked plan fits (CUC level 0)."""
    plan = _pick_plan(H, nz, W, itemsize, band_itemsize)
    if plan is None or plan.sbuf < 2:
        return False
    if plan.nchunks > 1 and band_itemsize >= itemsize:
        return False
    return True


class SweepOperator(NamedTuple):
    """Per-level fused-sweep operator: the 24 extended band quads, padded
    and pre-sliced per lane chunk (``ebands[chunk][band*4+quad]``), shared
    by all four targets' gather reads, plus the factored Thomas pivots
    ALREADY in kernel layout — ``t0p[chunk]`` = the phase-0 targets'
    window-padded (bet, bet, gam, gam, ud, ud), ``t1p[chunk]`` = the
    phase-1 targets' aligned same.  Round-4 measurement: building these
    per relax call cost ~4 GB of pure copy traffic per CUC level-0 sweep
    (the fused kernel LOST to the per-color path, 23.3 vs 12.5 ms) — they
    are static per level, so they are built once here; only the per-cycle
    RHS (bq) is sliced at relax time.  With low-precision bands the
    pivots baked in are the row-sum-consistent rebuilt factors
    (:func:`consistent_pivots`).  ``plan`` is the build-time static
    kernel plan."""

    ebands: tuple    # nchunks x 24 x (nz, hs, Wc+4), band-major, _TKEYS
    t0p: tuple       # nchunks x 6: phase-0 (bet,bet,gam,gam,ud,ud) windows
    t1p: tuple       # nchunks x 6: phase-1 same, aligned chunk slices
    plan: _Plan

    @property
    def tj(self) -> int:
        return self.plan.tj


jax.tree_util.register_pytree_node(
    SweepOperator,
    lambda s: ((s.ebands, s.t0p, s.t1p), s.plan),
    lambda plan, c: SweepOperator(c[0], c[1], c[2], plan))


def consistent_pivots(pack: CompactPack, band_dtype) -> tuple:
    """Thomas pivots of the row-sum-CONSISTENT low-precision smoother
    operator.

    Round-3 negative result: storing the gather bands in bfloat16 while
    the Thomas pivots keep the f32 diagonal breaks the diag = -(row sum)
    identity the operator is built on (mg_define_matrix.f90:615-657) and
    the smoother amplifies the constant mode — CUC convergence collapses
    (rel residual 0.168 after 6 F-cycles vs 5.1e-05).  The fix: treat the
    ROUNDED bands as the smoother's operator A' and rebuild its diagonal
    so the row sums match A exactly:

        d' = d + gather(1, A - A')     (per row; ones-state gather)

    Rounding a persisted gather BLOCK equals rounding the band then
    slicing, so the per-row correction is one gather of the block deltas
    against an all-ones extended state (the same _kshift/k0 masking as
    the smoother applies, so boundary rows correct exactly).  A' stays
    symmetric (each band array serves both directions of its coupling
    pair) with A'·1 = A·1; the smoother then solves a ~0.4%-perturbed
    operator — a smoother for A in the classical perturbation sense —
    while residuals keep using A in f32.  Returns (bet', gam') per target
    (_TKEYS order), each thomas_factor(d', ud)."""
    from ..relax import thomas_factor
    from ..relax_compact import block_views, gather_blocks
    bd = jnp.dtype(band_dtype)
    bets, gams = [], []
    for m, (a, b) in enumerate(_TKEYS):
        blocks = block_views(pack, m)
        deltas = tuple(x - x.astype(bd).astype(x.dtype) for x in blocks)
        nz, H, W = pack.d[m].shape
        dt = pack.d[m].dtype
        ones = jnp.ones((nz, H + 2, W + 2), dt)
        e1 = {t: ones for t in _TKEYS}
        d2 = pack.d[m] + gather_blocks(e1, deltas, a, b, pack.real_matrix)
        bet, gam = thomas_factor(d2, pack.ud[m])
        bets.append(bet)
        gams.append(gam)
    return tuple(bets), tuple(gams)


def _pad_rows(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Top-pad 1 edge-dup row (so windows starting at the first tile stay
    in bounds) and tail-pad to ``rows`` total (last tile's window)."""
    x = jnp.concatenate([x[:, :1], x], axis=1)
    extra = rows - x.shape[1]
    if extra > 0:
        tail = jnp.concatenate([x[:, -1:]] * extra, axis=1)
        x = jnp.concatenate([x, tail], axis=1)
    return x


def _pad_cols(x: jnp.ndarray) -> jnp.ndarray:
    """One edge-dup column each side (keeps every chunk's overhang reads
    in bounds; the dup values feed only discarded overhang columns)."""
    return jnp.concatenate([x[..., :1], x, x[..., -1:]], axis=-1)


def build_sweep_operator(cA: jnp.ndarray, pack: CompactPack, nz: int,
                         H: int, W: int, band_dtype=None,
                         itemsize: int = 4,
                         force_chunks: int | None = None,
                         min_chunk: int = 128) -> SweepOperator | None:
    """One-time per-level build (jit alongside assembly).  ``cA`` is the
    extended band stack (8, nz, ny+2, nx+2); ``pack`` is kept for the
    Thomas pivots at relax time.  ``force_chunks``/``min_chunk`` exist for
    tests: real shapes below CUC scale never pick a chunked plan."""
    bd = jnp.dtype(band_dtype) if band_dtype is not None else cA.dtype
    plan = _pick_plan(H, nz, W, itemsize, bd.itemsize,
                      force_chunks=force_chunks, min_chunk=min_chunk)
    if plan is None or plan.sbuf < 2:
        return None
    if force_chunks is None and plan.nchunks > 1 \
            and bd.itemsize >= itemsize:
        # chunked full-precision plans measured SLOWER than the per-color
        # tiled path (see supports()) — only offered under force_chunks
        # (tests / hardware experiments)
        return None
    tj, C = plan.tj, plan.nchunks
    Wc = W // C
    hs = H - tj + _roundup8(tj + 4)      # padded rows, state/band geometry
    ht = H - tj + _roundup8(tj + 2)      # padded rows, pivot/rhs geometry
    chunks = []
    for c in range(C):
        chunks.append([])
    for n in range(2, 8):                # bands 3..8
        qe = quad_ext_bands(cA[n])
        for t in _TKEYS:
            full = _pad_cols(_pad_rows(qe[t].astype(bd), hs))
            for c in range(C):
                chunks[c].append(full[:, :, c * Wc: c * Wc + Wc + 4])
    if bd != cA.dtype:
        # low-precision bands: the smoother must solve the CONSISTENT
        # perturbed operator (rounded bands + row-sum-rebuilt diagonal) —
        # f32 pivots against rounded bands break convergence (round-3
        # negative result, see consistent_pivots)
        bet, gam = consistent_pivots(pack, bd)
    else:
        bet, gam = pack.bet, pack.gam
    m0 = [_TI[t] for t in _COLOR0]
    m1 = [_TI[t] for t in _COLOR1]
    t0p, t1p = [], []
    for c in range(C):
        w0 = lambda xs, m: _pad_cols(_pad_rows(xs[m], ht))[
            :, :, c * Wc: c * Wc + Wc + 2]
        a1 = lambda xs, m: xs[m][:, :, c * Wc: (c + 1) * Wc]
        t0p.append(tuple(w0(xs, m) for xs in (bet, gam, pack.ud)
                         for m in m0))
        t1p.append(tuple(a1(xs, m) for xs in (bet, gam, pack.ud)
                         for m in m1))
    return SweepOperator(ebands=tuple(tuple(ch) for ch in chunks),
                         t0p=tuple(t0p), t1p=tuple(t1p), plan=plan)


def _kernel(*refs, tj, real_matrix, band_lp, first_chunk, last_chunk):
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
    Wc = outs[0].shape[2]                 # chunk interior width
    n0 = tj + 2                           # phase-0 rows  [J0-1, J0+TJ]
    m0 = Wc + 2                           # phase-0 cols  [I0-1, I0+WC]
    dt = outs[0].dtype

    def band_read(n, boff, a, b, o, oc, nrows, ncols):
        bk, bj, bi = boff
        kb = ((a + bj) % 2, (b + bi) % 2)
        rjb = (a + bj - kb[0]) // 2
        rib = (b + bi - kb[1]) // 2
        x = bands[(n - 3) * 4 + _TI[kb]][
            :, o + rjb + 2: o + rjb + 2 + nrows,
            oc + rib + 2: oc + rib + 2 + ncols]
        if band_lp:
            x = x.astype(dt)
        return _kshift(x, bk)

    def gather(a, b, o, oc, nrows, ncols, reader):
        # exact _BASE_TERMS/_REAL_TERMS summation order of
        # relax_compact.gather_blocks (bitwise-stable), incl. its
        # plane-0-only evaluation of the real-matrix terms (all four
        # have bk == pk == 0, so the slices commute with the reads)
        s = None
        for n, boff, poff in _BASE_TERMS:
            t = band_read(n, boff, a, b, o, oc, nrows, ncols) \
                * reader(poff, a, b)
            s = t if s is None else s + t
        if real_matrix:
            x0 = None
            for n, boff, poff in _REAL_TERMS:
                t = band_read(n, boff, a, b, o, oc, nrows, ncols)[:1] \
                    * reader(poff, a, b)[:1]
                x0 = t if x0 is None else x0 + t
            s = jnp.concatenate([s[:1] + x0, s[1:]], axis=0)
        return s

    # -- phase 0 (color 0): rows [J0-1, J0+TJ], LANE-ALIGNED cols ----------
    # The main tile computes cols [I0, I0+WC) exactly — Wc is chosen a
    # multiple of 128, so phase-0 vregs are full.  (The first cut computed
    # a (Wc+2)-wide region: 130 lanes pad to 256 and phase-0 VPU work
    # tripled — measured 17.9 ms/sweep vs 12.5 tiled at CUC level 0, i.e.
    # the fused kernel was COMPUTE-bound and lost.)  The seam columns
    # I0-1 / I0+WC that phase 1 needs are recomputed as 1-column solves —
    # ~1/128th of a pass each — bitwise the adjacent chunk's values.
    def read_p0(poff, a, b, oc, ncols):
        pk, pj, pi = poff
        kp = ((a + pj) % 2, (b + pi) % 2)
        rj = (a + pj - kp[0]) // 2
        ri = (b + pi - kp[1]) // 2
        x = sw[kp][:, rj + 1: rj + 1 + n0,
                   oc + ri + 2: oc + ri + 2 + ncols]
        return _kshift(x, pk)

    def p0_compute(t, oc, ncols):
        """Phase-0 solve on cols [I0+oc, I0+oc+ncols); t0 window col ct
        holds quad col I0+ct-1."""
        a, b = t
        r = c0[t]
        ct = oc + 1
        reader = lambda poff, a, b: read_p0(poff, a, b, oc, ncols)
        rhs = r["bq"][:, 0:n0, ct: ct + ncols] \
            - gather(a, b, -1, oc, n0, ncols, reader)
        return thomas_factored_unrolled(
            r["bet"][:, 0:n0, ct: ct + ncols],
            r["gam"][:, 0:n0, ct: ct + ncols],
            r["ud"][:, 0:n0, ct: ct + ncols], rhs)

    p0 = {}
    for t in _COLOR0:
        p0[t] = p0_compute(t, 0, Wc)
        outs[_TI[t]][:] = p0[t][:, 1: tj + 1, :]

    # -- phase 1 (color 1) on rows [J0, J0+TJ) x cols [I0, I0+WC) ----------
    # e1: color-0 quads in halo-extended tile form, materialized in VMEM
    # SCRATCH via stores (in-kernel lane-dim concatenate does not lower —
    # Mosaic "offset mismatch on non-concat dimension").  Interior comes
    # from the in-VMEM phase-0 values; each quad's live seam column is the
    # 1-column recompute (interior chunk seam, bitwise the neighbour's
    # committed value) or the PRE-sweep mirror fill (physical boundary —
    # the mirror maps to color-1 points, untouched by phase 0).  Only one
    # seam side per quad is ever read: (·,1) quads at ri<=0 (left), (·,0)
    # at ri>=0 (right); the other column stays unwritten junk.
    i = pl.program_id(0)
    first = i == 0
    last = i == pl.num_programs(0) - 1
    scr = {(0, 0): scratch[0], (1, 1): scratch[1]}
    for t in _COLOR0:
        swt, s = sw[t], scr[t]
        s[:, :, 1: Wc + 1] = p0[t]
        if t == (1, 1):
            if first_chunk:
                # col I0-1 at the first chunk is the i=-1 halo
                s[:, :, 0:1] = swt[:, 1: n0 + 1, 1:2]
            else:
                s[:, :, 0:1] = p0_compute(t, -1, 1)

            # row J0-1 at the first tile is the j=-1 halo
            @pl.when(first)
            def _fix_first(swt=swt, s=s):
                s[:, 0:1, :] = swt[:, 1:2, 1: m0 + 1]
        else:
            if last_chunk:
                # col I0+WC at the last chunk is the i=nx halo
                s[:, :, m0 - 1: m0] = swt[:, 1: n0 + 1, m0: m0 + 1]
            else:
                s[:, :, m0 - 1: m0] = p0_compute(t, Wc, 1)

            # row J0+TJ at the last tile is the j=ny halo
            @pl.when(last)
            def _fix_last(swt=swt, s=s):
                s[:, n0 - 1: n0, :] = swt[:, n0: n0 + 1, 1: m0 + 1]

    # the real-matrix diagonal terms read the color-1 SIBLING: interior
    # values are pre-color (the documented same-color-read deviation), but
    # its halo ring mirrors to COLOR-0 points — post-phase-0 values.  The
    # patched halo column/row is exactly a column/row of the e1 scratch.
    if real_matrix:
        s10, s01 = sw[(1, 0)], sw[(0, 1)]
        e10, e01 = scratch[2], scratch[3]
        e10[:, :, :] = s10[:, 1: n0 + 1, 1: m0 + 1]
        if last_chunk:
            e10[:, :, m0 - 1: m0] = scr[(1, 1)][:, :, m0 - 2: m0 - 1]

        @pl.when(first)
        def _fix_e10():
            e10[:, 0:1, :] = scr[(0, 0)][:, 1:2, :]

        e01[:, :, :] = s01[:, 1: n0 + 1, 1: m0 + 1]
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

    for t in _COLOR1:
        a, b = t
        r = c1[t]
        rhs = r["bq"][:] - gather(a, b, 0, 0, tj, Wc, read_p1)
        outs[_TI[t]][:] = thomas_factored_unrolled(
            r["bet"][:], r["gam"][:], r["ud"][:], rhs)


@functools.partial(jax.jit, static_argnames=("plan", "real_matrix",
                                             "chunk", "interpret"))
def _sweep_chunk(eP: tuple, ebands_c: tuple, t0: tuple, t1: tuple,
                 plan: _Plan, real_matrix: bool, chunk: tuple,
                 interpret: bool = False) -> tuple:
    """One fused sweep over ONE lane chunk.  ``eP``: the 4 padded chunk
    state quads (_TKEYS order, width Wc+4); ``ebands_c``: the chunk's 24
    band arrays; ``t0``: the phase-0 targets' window-padded (width Wc+2)
    (bet, bet, gam, gam, ud, ud, bq, bq); ``t1``: the phase-1 targets'
    aligned (width Wc) same.  ``chunk`` = (first_chunk, last_chunk)
    statics.  Returns the 4 updated interior chunk quads (nz, H, Wc)."""
    tj = plan.tj
    nz = eP[0].shape[0]
    Wc = t1[-1].shape[2]
    H = t1[-1].shape[1]
    ws, wt = _roundup8(tj + 4), _roundup8(tj + 2)
    band_lp = ebands_c[0].dtype != eP[0].dtype

    def win(lead, rows, cols, buf):
        return pl.BlockSpec((pl.Element(lead), pl.Element(rows),
                             pl.Element(cols)),
                            lambda i: (_z, i * tj, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(buf))

    def blk(lead, buf):
        return pl.BlockSpec((lead, tj, Wc), lambda i: (_z, i, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(buf))

    tb = plan.tbuf
    in_specs = ([win(nz, ws, Wc + 4, plan.sbuf) for _ in range(4)]
                + [win(nz, ws, Wc + 4, plan.bbuf) for _ in range(24)]
                + [win(nz, wt, Wc + 2, tb) for _ in range(2)]      # bet (p0)
                + [win(nz - 1, wt, Wc + 2, tb) for _ in range(4)]  # gam, ud
                + [win(nz, wt, Wc + 2, tb) for _ in range(2)]      # bq  (p0)
                + [blk(nz, plan.kbuf), blk(nz, plan.kbuf),         # bet (p1)
                   blk(nz - 1, plan.kbuf), blk(nz - 1, plan.kbuf),  # gam
                   blk(nz - 1, plan.kbuf), blk(nz - 1, plan.kbuf),  # ud
                   blk(nz, plan.kbuf), blk(nz, plan.kbuf)])        # bq
    out_spec = pl.BlockSpec((nz, tj, Wc), lambda i: (_z, i, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(plan.obuf))
    kern = functools.partial(_kernel, tj=tj, real_matrix=real_matrix,
                             band_lp=band_lp, first_chunk=chunk[0],
                             last_chunk=chunk[1])
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT)
    # VMEM scratch for the phase-1 halo-extended color-0 tiles (e1) and,
    # under cmatrix='real', the patched color-1 sibling tiles
    nscr = 4 if real_matrix else 2
    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((nz, H, Wc), eP[0].dtype)
                   for _ in range(4)],
        grid=(H // tj,),
        in_specs=in_specs,
        out_specs=[out_spec] * 4,
        scratch_shapes=[pltpu.VMEM((nz, tj + 2, Wc + 2), eP[0].dtype)
                        for _ in range(nscr)],
        interpret=interpret,
        **kwargs,
    )(*eP, *ebands_c, *t0, *t1)
    return tuple(outs)


def relax_fused_sweep(q0, bq, pack: CompactPack, nsweeps: int,
                      real_matrix: bool, interpret: bool = False):
    """``nsweeps`` fused RB sweeps; quad-parity state dict in/out (the
    quad-persistent V-cycle path).  ``pack.sweep`` must hold the
    SweepOperator; the Thomas pivots come from the pack (phase 1 reads
    them aligned; phase 0's window-padded copies are made here, once per
    call, amortized over nsweeps)."""
    sop = pack.sweep
    plan = sop.plan
    tj, C = plan.tj, plan.nchunks
    H = q0[(0, 0)].shape[1]
    W = q0[(0, 0)].shape[2]
    Wc = W // C
    ws, wt = _roundup8(tj + 4), _roundup8(tj + 2)
    hs, ht = H - tj + ws, H - tj + wt

    def slc0(x, c):          # phase-0 window form: rows->ht, width Wc+2
        return _pad_cols(_pad_rows(x, ht))[:, :, c * Wc: c * Wc + Wc + 2]

    def slc1(x, c):          # phase-1 aligned form: width Wc
        return x[:, :, c * Wc: (c + 1) * Wc]

    # pivots ride pre-sliced in the operator (sop.t0p/t1p); only the
    # per-cycle RHS is sliced here, once per call, amortized over nsweeps
    t0c, t1c = [], []
    for c in range(C):
        t0c.append(sop.t0p[c] + tuple(slc0(bq[t], c) for t in _COLOR0))
        t1c.append(sop.t1p[c] + tuple(slc1(bq[t], c) for t in _COLOR1))
    q = dict(q0)
    for _ in range(nsweeps):
        e = extend_quads(q)
        eF = {t: _pad_cols(_pad_rows(e[t], hs)) for t in _TKEYS}
        parts = []
        for c in range(C):
            eP = tuple(eF[t][:, :, c * Wc: c * Wc + Wc + 4] for t in _TKEYS)
            parts.append(_sweep_chunk(eP, sop.ebands[c], t0c[c], t1c[c],
                                      plan, real_matrix,
                                      (c == 0, c == C - 1),
                                      interpret=interpret))
        if C == 1:
            outs = parts[0]
        else:
            outs = tuple(jnp.concatenate([parts[c][m] for c in range(C)],
                                         axis=2) for m in range(4))
        q = dict(zip(_TKEYS, outs))
    return q
