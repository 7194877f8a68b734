"""Numpy Fortran-transliteration pins for the DEFAULT smoothing path.

test_gs_exact.py pins the sequential-GS mode against a transliteration of
the reference loops; this module extends that technique to the shipping
configuration: ``relax_3D_8_RB`` (mg_relax.f90:151-190, via
``relax_3D_8_heart`` :237-305 and ``tridiag`` :308-334) and
``compute_residual_3D_8`` (mg_relax.f90:421-515), written here directly
from the Fortran text, independently of the library's vectorized term
tables.  Together with the property/goldens tests they close the parity
chain for the default RB + residual path (VERDICT r4 missing #1).

Ordering note (the library's one documented deviation,
mgroms_tpu/ops/relax.py docstring): the reference sweeps a color's columns
in i-then-j order and, through the ``cmatrix='real'`` bottom-level
DIAGONAL couplings only, consumes same-color same-sweep values; the
vectorized simultaneous update reads pre-color values there.  With
``cmatrix='simple'`` no same-color coupling exists, so sequential ==
simultaneous and the library must match the Fortran order BITWISE; the
transliteration below can run either way (``simultaneous=``) and the tests
assert both facts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgroms_tpu.bc import extend_h1


def _heart_rhs(pe, b, cA, j, i, real):
    """relax_3D_8_heart's gather + tridiag setup (mg_relax.f90:237-305)
    for extended column (j, i).  Fortran indices: A(n,k,j,i) k 1-based,
    j/i extended 0..n+1; python k == Fortran k-1."""
    nz = b.shape[0]
    A = lambda n, k, jj, ii: cA[n - 1, k - 1, jj, ii]
    B = lambda k: b[k - 1, j - 1, i - 1]
    P = lambda k, jj, ii: pe[k - 1, jj, ii]
    rhs = np.empty(nz)
    d = np.empty(nz)
    ud = np.zeros(max(nz - 1, 1))
    k = 1
    r = (B(k)
         - A(3, k, j, i) * P(k + 1, j - 1, i)
         - A(4, k, j, i) * P(k, j - 1, i)
         - A(4, k, j + 1, i) * P(k, j + 1, i)
         - A(5, k + 1, j + 1, i) * P(k + 1, j + 1, i)
         - A(6, k, j, i) * P(k + 1, j, i - 1)
         - A(7, k, j, i) * P(k, j, i - 1)
         - A(7, k, j, i + 1) * P(k, j, i + 1)
         - A(8, k + 1, j, i + 1) * P(k + 1, j, i + 1))
    if real:
        r -= (A(5, k, j, i) * P(k, j + 1, i - 1)
              + A(5, k, j - 1, i + 1) * P(k, j - 1, i + 1)
              + A(8, k, j, i) * P(k, j - 1, i - 1)
              + A(8, k, j + 1, i + 1) * P(k, j + 1, i + 1))
    rhs[0] = r
    d[0] = A(1, k, j, i)
    ud[0] = A(2, k + 1, j, i)
    for k in range(2, nz):
        rhs[k - 1] = (
            B(k)
            - A(3, k, j, i) * P(k + 1, j - 1, i)
            - A(3, k - 1, j + 1, i) * P(k - 1, j + 1, i)
            - A(4, k, j, i) * P(k, j - 1, i)
            - A(4, k, j + 1, i) * P(k, j + 1, i)
            - A(5, k, j, i) * P(k - 1, j - 1, i)
            - A(5, k + 1, j + 1, i) * P(k + 1, j + 1, i)
            - A(6, k, j, i) * P(k + 1, j, i - 1)
            - A(6, k - 1, j, i + 1) * P(k - 1, j, i + 1)
            - A(7, k, j, i) * P(k, j, i - 1)
            - A(7, k, j, i + 1) * P(k, j, i + 1)
            - A(8, k, j, i) * P(k - 1, j, i - 1)
            - A(8, k + 1, j, i + 1) * P(k + 1, j, i + 1))
        d[k - 1] = A(1, k, j, i)
        ud[k - 1] = A(2, k + 1, j, i)
    k = nz
    rhs[nz - 1] = (
        B(k)
        - A(3, k - 1, j + 1, i) * P(k - 1, j + 1, i)
        - A(4, k, j, i) * P(k, j - 1, i)
        - A(4, k, j + 1, i) * P(k, j + 1, i)
        - A(5, k, j, i) * P(k - 1, j - 1, i)
        - A(6, k - 1, j, i + 1) * P(k - 1, j, i + 1)
        - A(7, k, j, i) * P(k, j, i - 1)
        - A(7, k, j, i + 1) * P(k, j, i + 1)
        - A(8, k, j, i) * P(k - 1, j, i - 1))
    d[nz - 1] = A(1, k, j, i)
    return rhs, d, ud


def _np_tridiag(d, ud, rhs):
    """tridiag (mg_relax.f90:308-334), verbatim recurrence."""
    nz = d.shape[0]
    xc = np.empty(nz)
    gam = np.empty(nz)
    bet = 1.0 / d[0]
    xc[0] = rhs[0] * bet
    for k in range(2, nz + 1):
        gam[k - 1] = ud[k - 2] * bet
        bet = 1.0 / (d[k - 1] - ud[k - 2] * gam[k - 1])
        xc[k - 1] = (rhs[k - 1] - ud[k - 2] * xc[k - 2]) * bet
    for k in range(nz - 1, 0, -1):
        xc[k - 1] = xc[k - 1] - gam[k] * xc[k]
    return xc


def _np_rb_sweep(p, b, cA, real, simultaneous=False):
    """One reference RB sweep (relax_3D_8_RB, mg_relax.f90:169-186):
    rb = 1, 2; column loop i = 1..nx, j = 1+mod(i+rb, 2)..ny step 2;
    fill_halo after each color.  ``simultaneous=True`` computes every
    column of a color from the PRE-color state before committing any
    (the library's vectorized order)."""
    ny, nx = b.shape[1:]
    pe = np.array(extend_h1(jnp.asarray(p)))
    for rb in (1, 2):
        src = pe.copy() if simultaneous else pe
        for i in range(1, nx + 1):
            for j in range(1 + (i + rb) % 2, ny + 1, 2):
                rhs, d, ud = _heart_rhs(src, b, cA, j, i, real)
                pe[:, j, i] = _np_tridiag(d, ud, rhs)
        # fill_halo per color (mg_relax.f90:181)
        pe = np.array(extend_h1(jnp.asarray(pe[:, 1:-1, 1:-1])))
    return pe[:, 1:-1, 1:-1]


def _np_residual(p, b, cA, real):
    """compute_residual_3D_8 (mg_relax.f90:421-515), term for term."""
    nz, ny, nx = b.shape
    pe = np.array(extend_h1(jnp.asarray(p)))
    A = lambda n, k, jj, ii: cA[n - 1, k - 1, jj, ii]
    out = np.empty((nz, ny, nx))
    for i in range(1, nx + 1):
        for j in range(1, ny + 1):
            P = lambda k, jj, ii: pe[k - 1, jj, ii]
            B = lambda k: b[k - 1, j - 1, i - 1]
            k = 1
            r = (B(k)
                 - A(1, k, j, i) * P(k, j, i)
                 - A(2, k + 1, j, i) * P(k + 1, j, i)
                 - A(3, k, j, i) * P(k + 1, j - 1, i)
                 - A(4, k, j, i) * P(k, j - 1, i)
                 - A(4, k, j + 1, i) * P(k, j + 1, i)
                 - A(5, k + 1, j + 1, i) * P(k + 1, j + 1, i)
                 - A(6, k, j, i) * P(k + 1, j, i - 1)
                 - A(7, k, j, i) * P(k, j, i - 1)
                 - A(7, k, j, i + 1) * P(k, j, i + 1)
                 - A(8, k + 1, j, i + 1) * P(k + 1, j, i + 1))
            if real:
                r -= (A(5, k, j, i) * P(k, j + 1, i - 1)
                      + A(5, k, j - 1, i + 1) * P(k, j - 1, i + 1)
                      + A(8, k, j, i) * P(k, j - 1, i - 1)
                      + A(8, k, j + 1, i + 1) * P(k, j + 1, i + 1))
            out[0, j - 1, i - 1] = r
            for k in range(2, nz):
                out[k - 1, j - 1, i - 1] = (
                    B(k)
                    - A(1, k, j, i) * P(k, j, i)
                    - A(2, k, j, i) * P(k - 1, j, i)
                    - A(2, k + 1, j, i) * P(k + 1, j, i)
                    - A(3, k, j, i) * P(k + 1, j - 1, i)
                    - A(3, k - 1, j + 1, i) * P(k - 1, j + 1, i)
                    - A(4, k, j, i) * P(k, j - 1, i)
                    - A(4, k, j + 1, i) * P(k, j + 1, i)
                    - A(5, k, j, i) * P(k - 1, j - 1, i)
                    - A(5, k + 1, j + 1, i) * P(k + 1, j + 1, i)
                    - A(6, k, j, i) * P(k + 1, j, i - 1)
                    - A(6, k - 1, j, i + 1) * P(k - 1, j, i + 1)
                    - A(7, k, j, i) * P(k, j, i - 1)
                    - A(7, k, j, i + 1) * P(k, j, i + 1)
                    - A(8, k, j, i) * P(k - 1, j, i - 1)
                    - A(8, k + 1, j, i + 1) * P(k + 1, j, i + 1))
            k = nz
            out[nz - 1, j - 1, i - 1] = (
                B(k)
                - A(1, k, j, i) * P(k, j, i)
                - A(2, k, j, i) * P(k - 1, j, i)
                - A(3, k - 1, j + 1, i) * P(k - 1, j + 1, i)
                - A(4, k, j, i) * P(k, j - 1, i)
                - A(4, k, j + 1, i) * P(k, j + 1, i)
                - A(5, k, j, i) * P(k - 1, j - 1, i)
                - A(6, k - 1, j, i + 1) * P(k - 1, j, i + 1)
                - A(7, k, j, i) * P(k, j, i - 1)
                - A(7, k, j, i + 1) * P(k, j, i + 1)
                - A(8, k, j, i) * P(k - 1, j, i - 1))
    return out


def _problem(nz, ny, nx, seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 3)
    cA = jax.random.uniform(ks[0], (8, nz, ny + 2, nx + 2), jnp.float64,
                            -0.1, 0.1)
    cA = cA.at[0].add(-4.0)
    p = jax.random.normal(ks[1], (nz, ny, nx), jnp.float64)
    b = jax.random.normal(ks[2], (nz, ny, nx), jnp.float64)
    return cA, p, b


@pytest.mark.parametrize("nsweeps", [1, 2])
def test_rb_matches_fortran_transliteration_simple(nsweeps):
    """cmatrix='simple': no same-color couplings, so the reference's
    sequential column order IS the simultaneous update — the library's
    masked RB must match the Fortran loops bitwise-tight."""
    from mgroms_tpu.ops.relax import relax
    nz, ny, nx = 5, 6, 7
    cA, p, b = _problem(nz, ny, nx)
    out = relax(p, b, cA, nsweeps, "RB", False, extend_h1)
    ref = np.asarray(p)
    for _ in range(nsweeps):
        ref = _np_rb_sweep(ref, np.asarray(b), np.asarray(cA), False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-13, atol=1e-14)
    # and the ordering claim itself: sequential == simultaneous here
    ref2 = np.asarray(p)
    for _ in range(nsweeps):
        ref2 = _np_rb_sweep(ref2, np.asarray(b), np.asarray(cA), False,
                            simultaneous=True)
    np.testing.assert_allclose(ref2, ref, rtol=1e-15, atol=0)


@pytest.mark.parametrize("nsweeps", [1, 2])
def test_rb_matches_fortran_transliteration_real(nsweeps):
    """cmatrix='real': the library reads pre-color values through the four
    k=1 diagonal couplings (documented deviation) — it must match the
    SIMULTANEOUS form of the Fortran loops, and differ from the sequential
    form only at roundoff-of-smoothing level."""
    from mgroms_tpu.ops.relax import relax
    nz, ny, nx = 5, 6, 7
    cA, p, b = _problem(nz, ny, nx, seed=1)
    out = relax(p, b, cA, nsweeps, "RB", True, extend_h1)
    ref_sim = np.asarray(p)
    ref_seq = np.asarray(p)
    for _ in range(nsweeps):
        ref_sim = _np_rb_sweep(ref_sim, np.asarray(b), np.asarray(cA), True,
                               simultaneous=True)
        ref_seq = _np_rb_sweep(ref_seq, np.asarray(b), np.asarray(cA), True)
    np.testing.assert_allclose(np.asarray(out), ref_sim,
                               rtol=1e-13, atol=1e-14)
    # the sequential/simultaneous deviation exists but stays a bounded
    # perturbation of the smoothed iterate (it enters only through the
    # four k=1 diagonal couplings; with this synthetic random operator
    # those are ~2.5% of the diagonal, far larger than in assembled
    # operators)
    assert not np.array_equal(ref_seq, ref_sim)
    den = np.abs(ref_sim).max()
    assert np.abs(ref_seq - ref_sim).max() < 0.2 * den


@pytest.mark.parametrize("real_matrix", [True, False])
def test_compact_rb_matches_fortran_transliteration(real_matrix):
    """The quad-parity compact smoother (the shipping TPU path) against the
    same transliteration (simultaneous form for 'real')."""
    from mgroms_tpu.ops.relax_compact import relax_compact
    nz, ny, nx = 5, 6, 8
    cA, p, b = _problem(nz, ny, nx, seed=2)
    out = relax_compact(p, b, cA, 1, "RB", real_matrix)
    ref = _np_rb_sweep(np.asarray(p), np.asarray(b), np.asarray(cA),
                       real_matrix, simultaneous=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-13, atol=1e-14)


@pytest.mark.parametrize("real_matrix", [True, False])
def test_residual_matches_fortran_transliteration(real_matrix):
    from mgroms_tpu.ops.stencil import residual
    nz, ny, nx = 5, 6, 7
    cA, p, b = _problem(nz, ny, nx, seed=3)
    r = residual(extend_h1(p), b, cA, real_matrix)
    ref = _np_residual(np.asarray(p), np.asarray(b), np.asarray(cA),
                       real_matrix)
    np.testing.assert_allclose(np.asarray(r), ref, rtol=1e-13, atol=1e-14)


@pytest.mark.parametrize("real_matrix", [True, False])
def test_residual_quads_matches_fortran_transliteration(real_matrix):
    """The quad-form residual (persisted gather blocks) against the same
    transliteration — covers the layout actually used on TPU."""
    from mgroms_tpu.ops.relax_compact import (build_compact_pack,
                                              merge_quads, residual_quads,
                                              split_quads)
    nz, ny, nx = 5, 6, 8
    cA, p, b = _problem(nz, ny, nx, seed=4)
    pack = build_compact_pack(cA, real_matrix)
    rq = residual_quads(split_quads(p), split_quads(b), pack, real_matrix)
    r = merge_quads(rq)
    ref = _np_residual(np.asarray(p), np.asarray(b), np.asarray(cA),
                       real_matrix)
    np.testing.assert_allclose(np.asarray(r), ref, rtol=1e-13, atol=1e-14)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
