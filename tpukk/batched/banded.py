"""Band-storage batched factorizations/solves — analogs of
KokkosBatched_Pbtrf/Pbtrs (banded Cholesky), Gbtrf/Gbtrs (banded LU) and
Tbsv (banded triangular solve) operating on LAPACK compact band layout
(batched/dense/src/KokkosBatched_{Pbtrf,Pbtrs,Gbtrf,Gbtrs,Tbsv}.hpp).

TPU design: a banded factorization is a length-n sequential recurrence whose
per-step work is a small dense band-window update — expressed as ONE
`lax.scan` over columns carrying the active update window (a (kd+1, kd) or
(kl+1, ku+1) register block), with `vmap` supplying the batch axis (the
Serial/Team/TeamVector axis of the reference collapses into vmap, SURVEY.md
§3.5).  No dynamic indexing: the sliding anti-diagonals of the band are
pre-gathered into shifted arrays at trace time.

Storage conventions (LAPACK):
* symmetric/Cholesky lower band, bandwidth kd:  Ab[i, j] = A[j+i, j],
  0 <= i <= kd, shape (..., kd+1, n); entries with j+i >= n are ignored
  (treated as 0).
* general band, kl sub / ku super:  Ab[i, j] = A[j+i-ku, j],
  0 <= i <= kl+ku, shape (..., kl+ku+1, n).

gbtrf performs no partial pivoting — the static-pivoting / diagonally-
dominant regime of the reference's batched banded usage (its Gesv offers the
same static-pivoting mode, KokkosBatched_Gesv.hpp); solve_banded-with-pivot
parity is covered by the dense-storage gbtrf (batched/dense.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from ..common.tracing import annotate

__all__ = ["pbtrf_banded", "pbtrs_banded", "gbtrf_banded", "gbtrs_banded",
           "tbsv_banded"]


def _batched(fn, *args, band_ndim=2):
    """vmap fn over any leading batch axes of args (all same batch shape)."""
    bshape = args[0].shape[:-band_ndim]
    if not bshape:
        return fn(*args)
    flat = [a.reshape((-1,) + a.shape[len(bshape):]) for a in args]
    out = jax.vmap(fn)(*flat)
    if isinstance(out, tuple):
        return tuple(o.reshape(bshape + o.shape[1:]) for o in out)
    return out.reshape(bshape + out.shape[1:])


# ---------------------------------------------------------------------------
# banded Cholesky
# ---------------------------------------------------------------------------

def _pbtrf_1(Ab):
    """(kd+1, n) lower band -> L in the same layout."""
    kd1, n = Ab.shape
    kd = kd1 - 1
    if kd == 0:
        return jnp.sqrt(Ab)
    # zero the out-of-matrix pad entries so tail columns stay clean
    i = jnp.arange(kd1)[:, None]
    j = jnp.arange(n)[None, :]
    Ab = jnp.where(i + j < n, Ab, 0)

    def step(U, col):
        # U[r, t] = accumulated update to band entry (r, j+t), t in [0, kd)
        w = col + U[:, 0]
        ljj = jnp.sqrt(w[0])
        l = jnp.where(ljj > 0, w[1:] / jnp.where(ljj == 0, 1.0, ljj), 0.0)
        # update to column j+1+t' at band row r: -l[t'+r] * l[t']  (t'+r < kd)
        lpad = jnp.concatenate([l, jnp.zeros(kd + 1, l.dtype)])
        idx = jnp.arange(kd1)[:, None] + jnp.arange(kd)[None, :]
        upd = -lpad[idx] * l[None, :]
        U_shift = jnp.concatenate([U[:, 1:], jnp.zeros((kd1, 1), U.dtype)], axis=1)
        return U_shift + upd, jnp.concatenate([ljj[None], l])

    _, Lcols = jax.lax.scan(step, jnp.zeros((kd1, kd), Ab.dtype),
                            jnp.moveaxis(Ab, -1, 0))
    return jnp.moveaxis(Lcols, 0, -1)


@annotate("batched.pbtrf_banded")
def pbtrf_banded(Ab):
    """Cholesky of an SPD band matrix in lower band storage (..., kd+1, n).
    Returns L in the same layout (cf. KokkosBatched_Pbtrf.hpp)."""
    return _batched(_pbtrf_1, Ab)


def _band_shift_rows(Lb):
    """S[i, j] = Lb[i, j-i] (zero where j < i) — the anti-diagonal gather
    that turns column-stored band rows into per-row solve coefficients."""
    kd1, n = Lb.shape
    rows = [Lb[0]]
    for i in range(1, kd1):
        rows.append(jnp.concatenate([jnp.zeros(i, Lb.dtype), Lb[i, : n - i]]))
    return jnp.stack(rows)


def _lower_band_fwd(Lb, b):
    """Solve L y = b with L in lower band storage (column-stored)."""
    kd1, n = Lb.shape
    kd = kd1 - 1
    S = _band_shift_rows(Lb)  # S[i, j] = L[j, j-i]

    def step(w, inp):
        s, bj = inp            # s: (kd+1,) coeffs L[j, j-i], i=0..kd
        # w holds [x_{j-kd}, ..., x_{j-1}]
        contrib = jnp.dot(s[1:][::-1], w) if kd else 0.0
        x = (bj - contrib) / s[0]
        w = jnp.concatenate([w[1:], x[None]]) if kd else w
        return w, x

    _, y = jax.lax.scan(step, jnp.zeros(max(kd, 1), b.dtype),
                        (jnp.moveaxis(S, -1, 0), b))
    return y


def _lower_band_bwd_T(Lb, y):
    """Solve Lᵀ x = y with L in lower band storage."""
    kd1, n = Lb.shape
    kd = kd1 - 1
    # Lᵀ[j, j+i] = L[j+i, j] = Lb[i, j] — column j directly holds the coeffs.

    def step(w, inp):
        c, yj = inp            # c: (kd+1,) = Lb[:, j]
        # w holds [x_{j+1}, ..., x_{j+kd}]
        contrib = jnp.dot(c[1:], w) if kd else 0.0
        x = (yj - contrib) / c[0]
        w = jnp.concatenate([x[None], w[:-1]]) if kd else w
        return w, x

    _, xr = jax.lax.scan(step, jnp.zeros(max(kd, 1), y.dtype),
                         (jnp.moveaxis(Lb, -1, 0)[::-1], y[::-1]))
    return xr[::-1]


def _pbtrs_1(Lb, b):
    return _lower_band_bwd_T(Lb, _lower_band_fwd(Lb, b))


@annotate("batched.pbtrs_banded")
def pbtrs_banded(Lb, b):
    """Solve A x = b from pbtrf_banded factors (cf. KokkosBatched_Pbtrs.hpp)."""
    bshape = b.shape[:-1]
    if not bshape:
        return _pbtrs_1(Lb, b)
    Lf = Lb.reshape((-1,) + Lb.shape[-2:])
    bf = b.reshape((-1, b.shape[-1]))
    return jax.vmap(_pbtrs_1)(Lf, bf).reshape(b.shape)


# ---------------------------------------------------------------------------
# banded LU (no pivoting — diagonally-dominant / static-pivoting regime)
# ---------------------------------------------------------------------------

def _gbtrf_1(Ab, kl, ku):
    """(kl+ku+1, n) general band -> (Lb (kl, n) column-stored unit-lower
    multipliers, Ub (ku+1, n) row-stored U: Ub[t, j] = U[j, j+t])."""
    n = Ab.shape[-1]
    i = jnp.arange(kl + ku + 1)[:, None]
    j = jnp.arange(n)[None, :]
    r = i + j - ku
    Ab = jnp.where((r >= 0) & (r < n), Ab, 0)
    # row gather: Rrow[t, j] = A[j, j+t] = Ab[ku - t, j + t], t = 0..ku
    rows = [Ab[ku]]
    for t in range(1, ku + 1):
        rows.append(jnp.concatenate(
            [Ab[ku - t, t:], jnp.zeros(t, Ab.dtype)]))
    Rrow = jnp.stack(rows)                      # (ku+1, n)
    Csub = Ab[ku + 1:] if kl else jnp.zeros((0, n), Ab.dtype)  # below-diag cols

    def step(M, inp):
        # M[s, t] = accumulated update to A[j+s, j+t], 0<=s<=kl, 0<=t<=ku
        colb, rowr = inp                        # (kl,), (ku+1,)
        urow = rowr + M[0]                      # updated row j of U
        ujj = urow[0]
        cupd = colb + (M[1:, 0] if kl else 0)   # updated col below diag
        l = jnp.where(ujj != 0, cupd / jnp.where(ujj == 0, 1.0, ujj), 0.0)
        # window slides to j+1; the rank-1 update -l·urow touches
        # A[j+s, j+t] for 1<=s<=kl, 1<=t<=ku, i.e. M_next[s', t'] for
        # s'<kl, t'<ku (s=s'+1, t=t'+1)
        Mn = jnp.zeros_like(M)
        if kl and ku:
            Mn = Mn.at[:kl, :ku].set(M[1:, 1:] - l[:, None] * urow[None, 1:])
        return Mn, (l, urow)

    M0 = jnp.zeros((kl + 1, ku + 1), Ab.dtype)
    _, (Ls, Us) = jax.lax.scan(
        step, M0, (jnp.moveaxis(Csub, -1, 0), jnp.moveaxis(Rrow, -1, 0)))
    return jnp.moveaxis(Ls, 0, -1), jnp.moveaxis(Us, 0, -1)


@annotate("batched.gbtrf_banded")
def gbtrf_banded(Ab, kl: int, ku: int):
    """LU (no pivoting) of a general band matrix in LAPACK band storage
    (..., kl+ku+1, n).  Returns (Lb, Ub): unit-lower multipliers column-
    stored (..., kl, n) and U row-stored (..., ku+1, n)
    (cf. KokkosBatched_Gbtrf.hpp; static-pivoting regime)."""
    return _batched(lambda a: _gbtrf_1(a, kl, ku), Ab)


def _gbtrs_1(Lb, Ub, b):
    kl, n = Lb.shape
    ku1 = Ub.shape[0]
    ku = ku1 - 1
    # forward: x_j = b_j - sum_i L[j, j-i] x_{j-i};  L[j, j-i] = Lb[i-1, j-i]
    if kl:
        Lone = jnp.concatenate([jnp.ones((1, n), Lb.dtype), Lb])
        S = _band_shift_rows(Lone)

        def fstep(w, inp):
            s, bj = inp
            y = bj - jnp.dot(s[1:][::-1], w)
            return jnp.concatenate([w[1:], y[None]]), y

        _, y = jax.lax.scan(fstep, jnp.zeros(kl, b.dtype),
                            (jnp.moveaxis(S, -1, 0), b))
    else:
        y = b
    # backward: x_j = (y_j - sum_t U[j, j+t] x_{j+t}) / u_jj;  row-stored Ub

    def bstep(w, inp):
        u, yj = inp
        contrib = jnp.dot(u[1:], w) if ku else 0.0
        x = (yj - contrib) / u[0]
        w = jnp.concatenate([x[None], w[:-1]]) if ku else w
        return w, x

    _, xr = jax.lax.scan(bstep, jnp.zeros(max(ku, 1), b.dtype),
                         (jnp.moveaxis(Ub, -1, 0)[::-1], y[::-1]))
    return xr[::-1]


@annotate("batched.gbtrs_banded")
def gbtrs_banded(Lb, Ub, b):
    """Solve A x = b from gbtrf_banded factors (cf. KokkosBatched_Gbtrs.hpp)."""
    bshape = b.shape[:-1]
    if not bshape:
        return _gbtrs_1(Lb, Ub, b)
    Lf = Lb.reshape((-1,) + Lb.shape[-2:])
    Uf = Ub.reshape((-1,) + Ub.shape[-2:])
    bf = b.reshape((-1, b.shape[-1]))
    return jax.vmap(_gbtrs_1)(Lf, Uf, bf).reshape(b.shape)


@annotate("batched.tbsv_banded")
def tbsv_banded(Ab, b, lower: bool = True, unit_diag: bool = False):
    """Triangular banded solve in band storage (cf. KokkosBatched_Tbsv.hpp).
    lower: Ab is (..., k+1, n) lower band (Ab[i,j] = A[j+i, j]);
    upper: Ab is (..., k+1, n) upper band row-stored (Ab[t,j] = A[j, j+t])."""

    def one(ab, bb):
        if unit_diag:
            ab = ab.at[0].set(jnp.ones_like(ab[0]))
        return (_lower_band_fwd(ab, bb) if lower
                else _gbtrs_1(jnp.zeros((0, ab.shape[-1]), ab.dtype), ab, bb))

    bshape = b.shape[:-1]
    if not bshape:
        return one(Ab, b)
    af = Ab.reshape((-1,) + Ab.shape[-2:])
    bf = b.reshape((-1, b.shape[-1]))
    return jax.vmap(one)(af, bf).reshape(b.shape)
