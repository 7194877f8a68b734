"""Compact checkerboard (quad-parity) red-black line relaxation.

The masked RB sweep (ops/relax.py) evaluates the tridiagonal RHS gather and
the Thomas solve on EVERY column, then commits only the active color — half
the VPU work is thrown away, and the smoother is compute-bound (the ~16-term
neighbour gather dominates, not HBM).  This module stores the state in
*quad-parity* form — four arrays ``Q[a][b] = p[:, a::2, b::2]`` of shape
(nz, ny/2, nx/2) — so a color update computes exactly the active columns
and nothing else: the two quads of one checkerboard color are updated from
shifted reads of the complementary quads.  Same arithmetic, same term order,
half the flops (bitwise-equal iterates up to XLA scheduling).

Index algebra: a point (j, i) = (2J+a, 2I+b); a neighbour offset (dj, di)
lands in quad (a', b') = ((a+dj)%2, (b+di)%2) at quad index
(J + (a+dj-a')/2, I + (b+di-b')/2) — i.e. each stencil term is ONE
unstrided shifted slice of one quad.  Quad halos (the j=-1/ny, i=-1/nx
mirror ring of bc.extend_h1) come from sibling quads:
``Q[1][b]`` row -1 ↔ full j=-1 = p[0] = ``Q[0][b]`` row 0, etc.

Reference semantics preserved (mg_relax.f90:151-334): exact z-line Thomas
solve per column, halo/BC refresh per color, ``cmatrix='real'`` bottom-level
horizontal-diagonal couplings read pre-color values of the same color
(the documented vectorization deviation of ops/relax.py applies unchanged).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .relax import thomas_factor, tridiag, tridiag_factored, tridiag_pcr
from .transfer import _interleave

Quads = Dict[Tuple[int, int], jnp.ndarray]

# target-quad key order used everywhere a pack is indexed
_TKEYS = ((0, 0), (0, 1), (1, 0), (1, 1))


def split_quads(x: jnp.ndarray) -> Quads:
    """(nz, ny, nx) -> {(a, b): x[:, a::2, b::2]} via strided slices.

    (NOT a reshape to (nz, H, 2, W, 2): a size-2 minor dim pads 2 -> 128
    on TPU — a 64x-expanded temp, 16 GB at the CUC fine level.)"""
    return {(a, b): x[:, a::2, b::2] for a in (0, 1) for b in (0, 1)}


@jax.tree_util.register_pytree_node_class
class QuadField:
    """A level state persisted in quad-parity layout across the V-cycle.

    The profile that motivates this (round-2 piece timings, CUC level 0
    on v5e; recorded in CLAUDE.md): the compact smoother's actual sweep costs ~14 ms but each
    relax CALL paid ~30 ms more in split_quads/merge_quads, and prolong
    paid ~150 ms in minor-axis interleave matmuls.  Keeping the state in
    quads between operations removes every interleave from the cycle hot
    path; merging back to the full array happens once per F-cycle at the
    fine level (solver.fcycle boundary).

    Supports ``+`` (the prolongation's additive correction,
    mg_intergrids.f90:224-226) elementwise per quad.
    """

    __slots__ = ("quads",)

    def __init__(self, quads):
        self.quads = tuple(quads)          # _TKEYS order

    def tree_flatten(self):
        return self.quads, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children)

    def __add__(self, other):
        return QuadField(tuple(a + b for a, b in
                               zip(self.quads, other.quads)))

    def asdict(self) -> Quads:
        return dict(zip(_TKEYS, self.quads))

    @classmethod
    def fromdict(cls, q: Quads) -> "QuadField":
        return cls(tuple(q[t] for t in _TKEYS))

    @classmethod
    def split(cls, x: jnp.ndarray) -> "QuadField":
        return cls.fromdict(split_quads(x))

    def merge(self) -> jnp.ndarray:
        return merge_quads(self.asdict())


def merge_quads(q: Quads) -> jnp.ndarray:
    """Inverse of :func:`split_quads` — sublane stack in y at half width,
    MXU one-hot scatter in x (see ops/transfer._interleave layout notes)."""
    col0 = _interleave(q[(0, 0)], q[(1, 0)], axis=-2)
    col1 = _interleave(q[(0, 1)], q[(1, 1)], axis=-2)
    return _interleave(col0, col1, axis=-1)


def quad_ext_bands(ce: jnp.ndarray) -> Quads:
    """Quad-sample a halo-extended field ``ce`` (..., ny+2, nx+2) into four
    extended quads (..., H+2, W+2).

    Extended row R of quad a holds full j = 2(R-1)+a; valid j ∈ [-1, ny]
    all come from ``ce`` (rows je = j+1); the two never-read junk rows
    (j = -2 for a=0, j = ny+1 for a=1) are edge duplicates.  Used once per
    relax call on the 8 operator bands (stride-2 slices, amortized over
    2*nsweeps color updates).
    """
    odd_j = ce[..., 1::2, :]       # j = 0, 2, ..., ny      (H+1 rows)
    even_j = ce[..., 0::2, :]      # j = -1, 1, ..., ny-1   (H+1 rows)
    rows = {0: jnp.concatenate([odd_j[..., :1, :], odd_j], axis=-2),
            1: jnp.concatenate([even_j, even_j[..., -1:, :]], axis=-2)}
    out = {}
    for a in (0, 1):
        r = rows[a]
        odd_i = r[..., :, 1::2]
        even_i = r[..., :, 0::2]
        out[(a, 0)] = jnp.concatenate([odd_i[..., :, :1], odd_i], axis=-1)
        out[(a, 1)] = jnp.concatenate([even_i, even_i[..., :, -1:]], axis=-1)
    return out


def extend_quads(q: Quads) -> Quads:
    """Halo-1 extension of the four quad arrays with the physical
    homogeneous-Neumann mirror rule of bc.extend_h1 (edge copy), halos
    sourced from sibling quads.  Pure concats — XLA fuses them into the
    consuming stencil reads."""
    rj = {}
    for b in (0, 1):
        q0, q1 = q[(0, b)], q[(1, b)]
        # quad 0 rows: [junk(j=-2), j=0..ny-2, halo j=ny = p[ny-1] = q1[-1]]
        rj[(0, b)] = jnp.concatenate([q0[:, :1], q0, q1[:, -1:]], axis=1)
        # quad 1 rows: [halo j=-1 = p[0] = q0[0], j=1..ny-1, junk(j=ny+1)]
        rj[(1, b)] = jnp.concatenate([q0[:, :1], q1, q1[:, -1:]], axis=1)
    e = {}
    for a in (0, 1):
        r0, r1 = rj[(a, 0)], rj[(a, 1)]
        e[(a, 0)] = jnp.concatenate([r0[:, :, :1], r0, r1[:, :, -1:]], axis=2)
        e[(a, 1)] = jnp.concatenate([r0[:, :, :1], r1, r1[:, :, -1:]], axis=2)
    return e


def _kshift(x: jnp.ndarray, dk: int) -> jnp.ndarray:
    """Zero-padded k-shift (no vertical halo — BCs live in the bands)."""
    if dk == 0:
        return x
    z = jnp.zeros_like(x[:1])
    if dk == 1:
        return jnp.concatenate([x[1:], z], axis=0)
    return jnp.concatenate([z, x[:-1]], axis=0)


def _qread(e: Quads, a: int, b: int, dj: int, di: int, dk: int = 0
           ) -> jnp.ndarray:
    """Value at offset (dk, dj, di) from every target-quad-(a,b) point:
    one shifted interior slice of the source quad."""
    a2, b2 = (a + dj) % 2, (b + di) % 2
    rj = (a + dj - a2) // 2
    ri = (b + di - b2) // 2
    x = e[(a2, b2)]
    H, W = x.shape[-2] - 2, x.shape[-1] - 2
    return _kshift(x[:, 1 + rj:1 + rj + H, 1 + ri:1 + ri + W], dk)


# The neighbour gather for one target quad, term for term the quad form of
# ops/stencil.offdiag_columns (mg_relax.f90:263-300).  Each term multiplies
# a BAND read at a fixed (dk, dj, di) offset — constant operator data — by a
# STATE read at a fixed offset.  The band reads are therefore pre-sliceable
# into aligned interior-quad-shaped blocks, persisted once per level
# (:class:`CompactPack`): the hot path never touches the extended band
# layout, and Pallas kernels stream the blocks with plain aligned BlockSpecs
# (no overlapping windows, no pad-row junk DMA).
#
# Entries: (band n, (bk, bj, bi) band offset, (pk, pj, pi) state offset),
# in the exact summation order of the reference gather (bitwise-stable).
_BASE_TERMS = (
    (3, (0, 0, 0), (1, -1, 0)),
    (3, (-1, 1, 0), (-1, 1, 0)),
    (4, (0, 0, 0), (0, -1, 0)),
    (4, (0, 1, 0), (0, 1, 0)),
    (5, (0, 0, 0), (-1, -1, 0)),
    (5, (1, 1, 0), (1, 1, 0)),
    (6, (0, 0, 0), (1, 0, -1)),
    (6, (-1, 0, 1), (-1, 0, 1)),
    (7, (0, 0, 0), (0, 0, -1)),
    (7, (0, 0, 1), (0, 0, 1)),
    (8, (0, 0, 0), (-1, 0, -1)),
    (8, (1, 0, 1), (1, 0, 1)),
)
# bottom-level (k=1) horizontal-diagonal couplings, k0-masked
# (mg_relax.f90:271-276); the first/third band reads alias _BASE_TERMS
# entries so gather_keys dedupes them
_REAL_TERMS = (
    (5, (0, 0, 0), (0, 1, -1)),
    (5, (0, -1, 1), (0, -1, 1)),
    (8, (0, 0, 0), (0, -1, -1)),
    (8, (0, 1, 1), (0, 1, 1)),
)


def gather_keys(real_matrix: bool) -> tuple:
    """Unique (band, band-offset) reads of the gather, in first-use order —
    the per-target block list of a :class:`CompactPack` (12 keys, 14 when
    ``real_matrix``)."""
    keys = []
    terms = _BASE_TERMS + (_REAL_TERMS if real_matrix else ())
    for n, boff, _ in terms:
        k = (n, boff)
        if k not in keys:
            keys.append(k)
    return tuple(keys)


class CompactPack(NamedTuple):
    """Persisted per-level smoother operator in quad-gather layout.

    All fields are tuples indexed by target quad (``_TKEYS`` order).
    ``blocks[target]`` is the target's gather blocks lane-CONCATENATED
    into ONE wide aligned array (nz, H, nkeys*W) in ``gather_keys``
    order (round 4: the DMA rate of a Pallas stream is set by its
    per-(row, z) transfer width — scripts/micro_dma_probe measured 14
    separate (nz, tj, W) block streams at ~230-240 GB/s but one wide
    (nz, tj, nkeys*W) stream at 711 GB/s; in-kernel slicing at W-aligned
    lane offsets recovers the individual blocks for free, and
    concat-then-slice is bitwise the separate-arrays form).  Use
    :func:`wide_slices` to view the individual (nz, H, W) blocks.

    ``bet``/``gam`` are the precomputed Thomas pivots (ops/relax.
    thomas_factor): the smoothing hot path is division-free and skips the
    forward elimination entirely.  ``d`` is kept for the PCR option and the
    quad-form residual.
    """

    blocks: tuple    # per target: tuple of (nz, H, W), one per gather_keys
    d: tuple         # per target: (nz, H, W)   in-column diagonal
    ud: tuple        # per target: (nz-1, H, W) in-column off-diagonal
    bet: tuple       # per target: (nz, H, W)   reciprocal pivots
    gam: tuple       # per target: (nz-1, H, W) back-substitution multipliers
    real_matrix: bool
    sweep: object = None   # ops.pallas.sweep_fused.SweepOperator | None


jax.tree_util.register_pytree_node(
    CompactPack,
    lambda p: ((p.blocks, p.d, p.ud, p.bet, p.gam, p.sweep), p.real_matrix),
    lambda aux, c: CompactPack(*c[:5], real_matrix=aux, sweep=c[5]))


def build_compact_pack(cA: jnp.ndarray, real_matrix: bool) -> CompactPack:
    """Pre-slice the extended band stack into the gather-block layout.

    One-time work per level (jit it with assembly); eliminates the per-call
    ``quad_ext_bands`` pass and its CUC-scale multi-GB HBM transient."""
    qa = [quad_ext_bands(cA[n]) for n in range(cA.shape[0])]
    keys = gather_keys(real_matrix)
    blocks, ds, uds, bets, gams = [], [], [], [], []
    for (a, b) in _TKEYS:
        blocks.append(jnp.concatenate([
            _qread(qa[n - 1], a, b, bj, bi, bk)
            for (n, (bk, bj, bi)) in keys], axis=2))
        d = qa[0][(a, b)][:, 1:-1, 1:-1]
        ud = qa[1][(a, b)][1:, 1:-1, 1:-1]
        bet, gam = thomas_factor(d, ud)
        ds.append(d)
        uds.append(ud)
        bets.append(bet)
        gams.append(gam)
    return CompactPack(blocks=tuple(blocks), d=tuple(ds), ud=tuple(uds),
                       bet=tuple(bets), gam=tuple(gams),
                       real_matrix=real_matrix)


def wide_slices(wide, nkeys: int) -> tuple:
    """The ``nkeys`` individual (nz, H, W) gather blocks of a
    lane-concatenated wide array (nz, H, nkeys*W) — aligned lane slices
    (free in-kernel; fused by XLA outside)."""
    W = wide.shape[2] // nkeys
    return tuple(wide[:, :, m * W: (m + 1) * W] for m in range(nkeys))


def gather_blocks(e: Quads, blocks_t, a: int, b: int,
                  real_matrix: bool, k0: jnp.ndarray) -> jnp.ndarray:
    """Off-column coupling sum for target quad (a, b) from persisted
    gather blocks — same term order (and bitwise result) as the reference
    gather (mg_relax.f90:263-300).  ``blocks_t`` is the tuple of
    per-key blocks (:func:`wide_slices` of the pack's wide array, or any
    equal-shaped views)."""
    keys = gather_keys(real_matrix)
    idx = {k: i for i, k in enumerate(keys)}

    def term(n, boff, poff):
        pk, pj, pi = poff
        return blocks_t[idx[(n, boff)]] * _qread(e, a, b, pj, pi, pk)

    s = None
    for n, boff, poff in _BASE_TERMS:
        t = term(n, boff, poff)
        s = t if s is None else s + t
    if real_matrix:
        x = None
        for n, boff, poff in _REAL_TERMS:
            t = term(n, boff, poff)
            x = t if x is None else x + t
        s = s + k0 * x
    return s


_RB_TARGETS = (((0, 0), (1, 1)),   # color 0: (i + j) even
               ((0, 1), (1, 0)))   # color 1: (i + j) odd
# FC reference order (mg_relax.f90:214-228): (i even, j even), (i even,
# j odd), (i odd, j even), (i odd, j odd) — quad key is (a, b) = (j%2, i%2)
_FC_TARGETS = (((0, 0),), ((1, 0),), ((0, 1),), ((1, 1),))


def relax_compact(p: jnp.ndarray, b: jnp.ndarray, cA: jnp.ndarray,
                  nsweeps: int, kind: str, real_matrix: bool,
                  tridiag_method: str = "thomas",
                  extend_fn=None, pack: CompactPack | None = None
                  ) -> jnp.ndarray:
    """``nsweeps`` RB (or FC) line-smoothing sweeps in quad-parity form.

    ``extend_fn`` maps the four quads to their halo-extended forms; the
    default is the single-shard physical-mirror rule (:func:`extend_quads`).
    The distributed backend passes a ppermute seam exchange
    (parallel/exchange.extend_quads_shard) — shard tiles must have even
    dims so local quad parity equals global parity.  Requires even ny, nx.

    ``pack`` is the persisted gather-block operator; if absent it is built
    here (one extra HBM pass, fine for tests / per-call shard_map use).
    """
    nz, ny, nx = p.shape
    assert ny % 2 == 0 and nx % 2 == 0, "compact relax needs even ny, nx"
    if pack is None:
        pack = build_compact_pack(cA, real_matrix)
    q = relax_compact_quads(split_quads(p), split_quads(b), pack, nsweeps,
                            kind, real_matrix,
                            tridiag_method=tridiag_method,
                            extend_fn=extend_fn)
    return merge_quads(q)


def relax_compact_quads(q0: Quads, bq: Quads, pack: CompactPack,
                        nsweeps: int, kind: str, real_matrix: bool,
                        tridiag_method: str = "thomas",
                        extend_fn=None) -> Quads:
    """Quad-native core of :func:`relax_compact`: state in, state out in
    quad-parity layout — no split/merge (the quad-persistent V-cycle path,
    solver.fcycle)."""
    extend = extend_fn or extend_quads
    targets_by_color = _RB_TARGETS if kind == "RB" else _FC_TARGETS
    ti = {t: i for i, t in enumerate(_TKEYS)}
    nz = q0[(0, 0)].shape[0]
    W = q0[(0, 0)].shape[2]
    dt = q0[(0, 0)].dtype

    k0 = (jax.lax.broadcasted_iota(jnp.int32, (nz, 1, 1), 0) == 0
          ).astype(dt) if real_matrix else None

    nkeys = len(gather_keys(real_matrix))

    def color_update(q: Quads, targets) -> Quads:
        e = extend(q)
        rhs = [bq[t] - gather_blocks(
            e, wide_slices(pack.blocks[ti[t]], nkeys), t[0], t[1],
            real_matrix, k0) for t in targets]
        # concat target quads along x: one full-width tridiag solve
        cat = lambda f: jnp.concatenate([f[ti[t]] for t in targets], axis=-1)
        r = jnp.concatenate(rhs, axis=-1)
        if tridiag_method == "pcr":
            sol = tridiag_pcr(cat(pack.d), cat(pack.ud), r)
        else:
            # division-free substitution with precomputed pivots — bitwise
            # the reference Thomas recurrence (ops/relax.thomas_factor)
            sol = tridiag_factored(cat(pack.bet), cat(pack.gam),
                                   cat(pack.ud), r)
        q = dict(q)
        for n, t in enumerate(targets):
            q[t] = sol[..., n * W:(n + 1) * W]
        return q

    def sweep(q):
        for targets in targets_by_color:
            q = color_update(q, targets)
        return q

    keys = sorted(q0)
    if nsweeps <= 1:
        q = dict(q0)
        for _ in range(nsweeps):
            q = sweep(q)
        return q

    def body(i, flat):
        q = sweep(dict(zip(keys, flat)))
        return tuple(q[k] for k in keys)

    flat = jax.lax.fori_loop(0, nsweeps, body,
                             tuple(q0[k] for k in keys))
    return dict(zip(keys, flat))


def residual_quads(q: Quads, bq: Quads, pack: CompactPack,
                   real_matrix: bool, extend_fn=None) -> Quads:
    """r = b - A p with state and result in quad-parity layout.

    Term for term (and bitwise) ops/stencil.residual in quad form: the same
    gather order, the same in-column diagonal/vertical handling (zero-padded
    k-shifts).  Shared by the quad-persistent V-cycle's XLA fallback and
    mirrored by the Pallas ``_rr_kernel``."""
    e = (extend_fn or extend_quads)(q)
    nz = bq[(0, 0)].shape[0]
    dt = bq[(0, 0)].dtype
    k0 = (jax.lax.broadcasted_iota(jnp.int32, (nz, 1, 1), 0) == 0
          ).astype(dt) if real_matrix else None
    ti = {t: i for i, t in enumerate(_TKEYS)}
    nkeys = len(gather_keys(real_matrix))
    out = {}
    for t in _TKEYS:
        m = ti[t]
        pq = e[t][:, 1:-1, 1:-1]
        ud = pack.ud[m]
        z1 = jnp.zeros_like(ud[:1])
        lo2 = jnp.concatenate([z1, ud], axis=0)   # cA2(k),   couples p(k-1)
        hi2 = jnp.concatenate([ud, z1], axis=0)   # cA2(k+1), couples p(k+1)
        out[t] = (bq[t]
                  - pack.d[m] * pq
                  - lo2 * _kshift(pq, -1)
                  - hi2 * _kshift(pq, 1)
                  - gather_blocks(e, wide_slices(pack.blocks[m], nkeys),
                                  t[0], t[1], real_matrix, k0))
    return out


def restrict_quads_to_full(rq: Quads) -> jnp.ndarray:
    """Coarse = sum of 8 children with the residual given in quads — the
    exact summation tree of transfer.restrict_3d (z-pairs, then j-pairs,
    then i-pairs) for identical rounding."""
    t1 = {t: rq[t][0::2] + rq[t][1::2] for t in _TKEYS}
    return (t1[(0, 0)] + t1[(1, 0)]) + (t1[(0, 1)] + t1[(1, 1)])
