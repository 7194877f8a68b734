"""Line relaxation: red-black (and GS/four-color) z-line smoothing.

TPU-native port of the reference's hot kernel (src/mg_relax.f90:16-334).
Per colored column (i, j) the reference gathers the 12-16 off-column
couplings into a tridiagonal system in z and Thomas-solves it exactly
(``relax_3D_8_heart`` :237-305 + ``tridiag`` :308-334).

Vectorization strategy: instead of looping over columns, we build the
tridiagonal RHS for *every* column at once (one fused stencil kernel, see
ops/stencil.offdiag_columns), Thomas-solve all columns simultaneously with a
``lax.scan`` over z (each scan step is an elementwise (ny, nx) VPU op), and
commit only the active color with a parity mask.  The halo refresh after
every color (mg_relax.f90:181 — the protocol that fixes the reference's
convergence factor) is preserved: ``extend_fn`` is called per color.

Exactness notes:
  - 'RB' / 'FC': within a color, columns couple only through the bottom-level
    ``cmatrix='real'`` diagonal terms ('RB') or not at all ('FC').  The
    reference sweeps columns in i-then-j order, so its RB pass consumes
    same-sweep values through those few k=1 diagonal couplings; the
    vectorized simultaneous update uses pre-color values there instead.
    'FC' is a proper coloring of the stencil graph and is order-exact.
  - 'GS' in the reference is a sequential in-place sweep (order-dependent);
    here it becomes a simultaneous column-Jacobi sweep.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .stencil import band, offdiag_columns

ExtendFn = Callable[[jnp.ndarray], jnp.ndarray]


def tridiag_pcr(d: jnp.ndarray, dd: jnp.ndarray, b: jnp.ndarray
                ) -> jnp.ndarray:
    """Parallel cyclic reduction solve of the same symmetric tridiagonal
    systems as :func:`tridiag` — exact in exact arithmetic, but built from
    ceil(log2(nz)) full-width vector steps instead of 2*nz sequential scan
    steps, which is the layout the VPU wants (TPU-native alternative to the
    reference's Thomas loop, mg_relax.f90:308-334)."""
    nz = d.shape[0]
    if nz == 1:
        return b / d
    lo = jnp.concatenate([jnp.zeros_like(dd[:1]), dd], axis=0)   # a_k
    up = jnp.concatenate([dd, jnp.zeros_like(dd[:1])], axis=0)   # c_k
    diag = d
    rhs = b
    s = 1
    while s < nz:
        def shdn(x, fill=0.0):   # x_{k-s}
            pad = jnp.full_like(x[:s], fill)
            return jnp.concatenate([pad, x[:-s]], axis=0)

        def shup(x, fill=0.0):   # x_{k+s}
            pad = jnp.full_like(x[:s], fill)
            return jnp.concatenate([x[s:], pad], axis=0)

        alpha = -lo / shdn(diag, 1.0)
        gamma = -up / shup(diag, 1.0)
        diag = diag + alpha * shdn(up) + gamma * shup(lo)
        rhs = rhs + alpha * shdn(rhs) + gamma * shup(rhs)
        lo = alpha * shdn(lo)
        up = gamma * shup(up)
        s *= 2
    return rhs / diag


def tridiag(d: jnp.ndarray, dd: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Thomas solve of symmetric tridiagonal systems, batched over (ny, nx).

    Exact transcription of ``tridiag`` (mg_relax.f90:308-334): ``d`` (nz,...)
    diagonal, ``dd`` (nz-1,...) off-diagonal (coupling k<->k+1), ``b`` RHS.
    Sequential in z by nature; a scan step is an elementwise (ny, nx) op so
    the VPU stays full at width ny*nx.
    """
    nz = d.shape[0]
    if nz == 1:
        return b / d
    bet0 = 1.0 / d[0]
    x0 = b[0] * bet0

    def fwd(carry, inp):
        bet, xprev = carry
        dk, ddm, bk = inp
        gam = ddm * bet
        bet = 1.0 / (dk - ddm * gam)
        xk = (bk - ddm * xprev) * bet
        return (bet, xk), (gam, xk)

    (_, _), (gams, xs) = jax.lax.scan(fwd, (bet0, x0), (d[1:], dd, b[1:]))
    x = jnp.concatenate([x0[None], xs], axis=0)

    def bwd(xnext, inp):
        gamk1, xk = inp
        xk = xk - gamk1 * xnext
        return xk, xk

    _, head = jax.lax.scan(bwd, x[-1], (gams, x[:-1]), reverse=True)
    return jnp.concatenate([head, x[-1:]], axis=0)


def _column_solve(pe: jnp.ndarray, b: jnp.ndarray, cA: jnp.ndarray,
                  real_matrix: bool, method: str = "thomas") -> jnp.ndarray:
    """Exact solve of every z-column given current neighbour columns
    (relax_3D_8_heart for all (i, j) at once)."""
    rhs = b - offdiag_columns(pe, cA, real_matrix)
    d = band(cA, 1)
    ud = cA[1][1:, 1:-1, 1:-1]      # ud(k) = cA2(k+1) (mg_relax.f90:279,290)
    solver = tridiag_pcr if method == "pcr" else tridiag
    return solver(d, ud, rhs)


def _parity_mask(ny: int, nx: int, c: int, j0: int, i0: int,
                 dtype) -> jnp.ndarray:
    """Columns of color ``c``: global (i + j + c) even selects color 0 first
    (reference sweep order ``j = 1+mod(i+rb,2)``, mg_relax.f90:172-174).
    ``j0, i0`` are global offsets of this shard's interior origin."""
    jj = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0) + j0
    ii = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1) + i0
    return ((jj + ii + c) % 2 == 0).astype(dtype)


def relax(p: jnp.ndarray, b: jnp.ndarray, cA: jnp.ndarray,
          nsweeps: int, kind: str, real_matrix: bool,
          extend_fn: ExtendFn, j0: int = 0, i0: int = 0,
          tridiag_method: str = "thomas") -> jnp.ndarray:
    """``nsweeps`` smoothing sweeps (``relax`` dispatch, mg_relax.f90:16-47).

    ``extend_fn`` supplies halos (physical BCs and/or neighbour shards) and
    is invoked once per color — the reference's halo-per-color protocol.

    The sweep/color iteration is a ``lax.fori_loop`` whose body is one
    color update (the mask is selected by loop index): the coarsest level
    runs ns_coarsest=40 sweeps and unrolling 80 color updates into the
    traced program would blow up compile time.
    """
    ny, nx = p.shape[-2:]
    dt = p.dtype

    def color_update(p, mask):
        pe = extend_fn(p)
        sol = _column_solve(pe, b, cA, real_matrix, tridiag_method)
        return p + mask * (sol - p)

    if kind == "RB":
        masks = jnp.stack([_parity_mask(ny, nx, c, j0, i0, dt)
                           for c in (0, 1)])
    elif kind == "FC":
        # four colors in reference order (mg_relax.f90:214-228):
        # (i even, j even), (i even, j odd), (i odd, j even), (i odd, j odd)
        jj = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0) + j0
        ii = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1) + i0
        masks = jnp.stack([(((ii % 2) == t) & ((jj % 2) == s)).astype(dt)
                           for t, s in ((0, 0), (0, 1), (1, 0), (1, 1))])
    elif kind == "GS":
        masks = jnp.ones((1, ny, nx), dtype=dt)
    else:
        raise ValueError(f"unknown relax kind {kind!r}")

    ncolor = masks.shape[0]
    nsteps = nsweeps * ncolor

    def body(i, p):
        return color_update(p, masks[i % ncolor])

    if nsteps <= 2:
        for i in range(nsteps):
            p = body(i, p)
        return p
    return jax.lax.fori_loop(0, nsteps, body, p)


def relax_2d(p: jnp.ndarray, b: jnp.ndarray, cA: jnp.ndarray,
             nsweeps: int, extend_fn: ExtendFn,
             j0: int = 0, i0: int = 0, red_black: bool = True) -> jnp.ndarray:
    """2-D 5-point point relaxation for nz==1 levels (``relax_2D_5``,
    mg_relax.f90:50-113).  Band meaning differs from 3-D:
    cA2 <-> j+-1, cA3 <-> i+-1, cA4 <-> (j-1,i-1)/(j+1,i+1),
    cA5 <-> (j+1,i-1)/(j-1,i+1).

    Unreachable with the standard level plan (the coarsest level keeps
    nz >= 2, mg_grids.f90:485); provided for parity.  Deviation: the
    reference refreshes halos once per sweep (:108); we refresh per color.
    """
    ny, nx = p.shape[-2:]
    dt = p.dtype

    def update(p, mask):
        pe = extend_fn(p)

        def sh(n, dj, di):
            return band(cA, n, dj=dj, di=di)

        def ps(dj, di):
            J, I = pe.shape[-2:]
            return pe[..., 1 + dj: J - 1 + dj, 1 + di: I - 1 + di]

        z = (b
             - sh(2, 0, 0) * ps(-1, 0) - band(cA, 2, dj=1) * ps(1, 0)
             - sh(3, 0, 0) * ps(0, -1) - band(cA, 3, di=1) * ps(0, 1)
             - sh(4, 0, 0) * ps(-1, -1) - band(cA, 4, dj=1, di=1) * ps(1, 1)
             - sh(5, 0, 0) * ps(1, -1) - band(cA, 5, dj=-1, di=1) * ps(-1, 1))
        sol = z / band(cA, 1)
        return p + mask * (sol - p)

    for _ in range(nsweeps):
        if red_black:
            for c in (0, 1):
                p = update(p, _parity_mask(ny, nx, c, j0, i0, dt))
        else:
            p = update(p, jnp.ones((ny, nx), dtype=dt))
    return p
