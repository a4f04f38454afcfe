"""BLAS1 — vector and multivector ops.  TPU-native analog of
blas/src/KokkosBlas1_*.hpp (abs, axpby/axpy, dot, fill, iamax, mult, nrm1,
nrm2, nrm2_squared, nrm2w, nrminf, reciprocal, rot, rotg, rotm, rotmg, scal,
set, sum, swap, update — SURVEY.md §2.3).

On TPU these are single fused XLA expressions; there is no separate "team"
variant axis — batching is `vmap` (the Serial/Team/TeamVector collapse,
SURVEY.md §3.5).  Multivector (2-D "MV") forms accept per-column coefficient
vectors exactly like the reference's axpby MV overloads
(blas/impl/KokkosBlas1_axpby_mv_impl.hpp): scalars broadcast, rank-1
coefficient arrays apply per column.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..common import arith_traits
from ..common.tracing import annotate

__all__ = [
    "abs", "axpy", "axpby", "dot", "fill", "iamax", "mult", "nrm1", "nrm2",
    "nrm2_squared", "nrm2w", "nrminf", "reciprocal", "rot", "rotg", "rotm",
    "rotmg", "scal", "update", "sum", "swap",
]


def _coef(a, x):
    """Broadcast scalar or per-column coefficient against vector/multivector x."""
    a = jnp.asarray(a)
    if a.ndim == 1 and x.ndim == 2:
        return a[None, :]
    return a


@annotate("blas1.abs")
def abs(x):  # noqa: A001 - matches KokkosBlas1_abs
    return jnp.abs(x)


@annotate("blas1.axpy")
def axpy(alpha, x, y):
    """y + alpha*x (functional: returns the new y)."""
    return _coef(alpha, x) * x + y


@annotate("blas1.axpby")
def axpby(alpha, x, beta, y):
    """alpha*x + beta*y, cf. blas/src/KokkosBlas1_axpby.hpp."""
    return _coef(alpha, x) * x + _coef(beta, y) * y


@annotate("blas1.dot")
def dot(x, y):
    """<x,y> with conjugation on x for complex types
    (cf. Kokkos_InnerProductSpaceTraits.hpp).  MV form: per-column dots."""
    tr = arith_traits(x.dtype)
    xc = tr.conj(x)
    if x.ndim == 1:
        return jnp.sum(xc * y)
    return jnp.sum(xc * y, axis=0)


@annotate("blas1.fill")
def fill(x, val):
    return jnp.full_like(x, val)


def set(y, x):  # noqa: A001 - matches KokkosBlas1_set (Y = X)
    """Deep-copy assign Y = X (functional: returns X broadcast to y's shape),
    cf. blas/src/KokkosBlas1_set.hpp."""
    return jnp.broadcast_to(x, y.shape).astype(y.dtype)


@annotate("blas1.iamax")
def iamax(x):
    """Index of max |x_i| (0-based; per column for MV)."""
    return jnp.argmax(jnp.abs(x), axis=0)


@annotate("blas1.mult")
def mult(gamma, y, alpha, a, x):
    """y = gamma*y + alpha*a*x elementwise (cf. KokkosBlas1_mult.hpp)."""
    if a.ndim == 1 and x.ndim == 2:
        a = a[:, None]
    return gamma * y + alpha * a * x


@annotate("blas1.nrm1")
def nrm1(x):
    tr = arith_traits(x.dtype)
    return jnp.sum(jnp.abs(x), axis=0 if x.ndim == 2 else None).astype(tr.mag_dtype)


@annotate("blas1.nrm2_squared")
def nrm2_squared(x):
    tr = arith_traits(x.dtype)
    m = jnp.abs(x) if tr.is_complex else x
    return jnp.sum((m * m).real if tr.is_complex else m * m, axis=0 if x.ndim == 2 else None)


@annotate("blas1.nrm2")
def nrm2(x):
    return jnp.sqrt(nrm2_squared(x))


@annotate("blas1.nrm2w")
def nrm2w(x, w):
    """sqrt(sum((x_i/w_i)^2)) — cf. KokkosBlas1_nrm2w.hpp."""
    if w.ndim == 1 and x.ndim == 2:
        w = w[:, None]
    r = x / w
    return jnp.sqrt(jnp.sum(jnp.abs(r) ** 2, axis=0 if x.ndim == 2 else None))


@annotate("blas1.nrminf")
def nrminf(x):
    return jnp.max(jnp.abs(x), axis=0 if x.ndim == 2 else None)


@annotate("blas1.reciprocal")
def reciprocal(x):
    return 1.0 / x


@annotate("blas1.scal")
def scal(alpha, x):
    return _coef(alpha, x) * x


@annotate("blas1.update")
def update(alpha, x, beta, y, gamma, z):
    """alpha*x + beta*y + gamma*z (cf. KokkosBlas1_update.hpp)."""
    return _coef(alpha, x) * x + _coef(beta, y) * y + _coef(gamma, z) * z


@annotate("blas1.sum")
def sum(x):  # noqa: A001
    return jnp.sum(x, axis=0 if x.ndim == 2 else None)


@annotate("blas1.swap")
def swap(x, y):
    """Functional swap (returns (y, x)); cf. KokkosBlas1_swap.hpp."""
    return y, x


@annotate("blas1.rot")
def rot(x, y, c, s):
    """Apply Givens rotation: (c*x + s*y, c*y - s*x)."""
    return c * x + s * y, c * y - s * x


@annotate("blas1.rotg")
def rotg(a, b):
    """Construct Givens rotation zeroing b: returns (r, z, c, s) per BLAS."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    sigma = jnp.where(jnp.abs(a) > jnp.abs(b), jnp.sign(a), jnp.sign(b))
    r = sigma * jnp.sqrt(a * a + b * b)
    safe = jnp.where(r == 0, 1.0, r)
    c = jnp.where(r == 0, 1.0, a / safe)
    s = jnp.where(r == 0, 0.0, b / safe)
    z = jnp.where(jnp.abs(a) > jnp.abs(b), s, jnp.where(c != 0, 1.0 / c, 1.0))
    return r, z, c, s


@annotate("blas1.rotm")
def rotm(x, y, param):
    """Apply modified Givens rotation H (param = [flag, h11, h21, h12, h22])."""
    flag = param[0]
    h11, h21, h12, h22 = param[1], param[2], param[3], param[4]
    one = jnp.ones_like(h11)
    mone = -one
    h11 = jnp.where(flag == -2.0, one, jnp.where(flag == 0.0, one, h11))
    h22 = jnp.where(flag == -2.0, one, jnp.where(flag == 0.0, one, h22))
    h12 = jnp.where(flag == -2.0, jnp.zeros_like(h12), jnp.where(flag == 1.0, one, h12))
    h21 = jnp.where(flag == -2.0, jnp.zeros_like(h21), jnp.where(flag == 1.0, mone, h21))
    return h11 * x + h12 * y, h21 * x + h22 * y


@annotate("blas1.rotmg")
def rotmg(d1, d2, x1, y1):
    """Construct modified Givens rotation — full reference LAPACK drotmg
    semantics including the gamma-threshold rescaling loops (GAM=4096):
    whenever a scale factor leaves [1/GAM^2, GAM^2], d/x1/H are rescaled by
    GAM^2 steps and the flag drops to -1 (full-matrix form), keeping the
    factored representation away from over/underflow on extreme scales."""
    d1 = jnp.asarray(d1, jnp.result_type(d1, 1.0))
    d2 = jnp.asarray(d2, d1.dtype)
    x1 = jnp.asarray(x1, d1.dtype)
    y1 = jnp.asarray(y1, d1.dtype)
    p2 = d2 * y1
    p1 = d1 * x1
    q2 = p2 * y1
    q1 = p1 * x1

    def case_flag0():
        # |q1| > |q2|: H = [[1, h12],[h21, 1]]
        h21 = -y1 / x1
        h12 = p2 / p1
        u = 1.0 - h12 * h21
        return (jnp.zeros_like(d1), d1 / u, d2 / u, x1 * u,
                jnp.ones_like(d1), h21, h12, jnp.ones_like(d1))

    def case_flag1():
        # |q2| >= |q1|: H = [[h11, 1],[-1, h22]]
        h11 = p1 / p2
        h22 = x1 / y1
        u = 1.0 + h11 * h22
        return (jnp.ones_like(d1), d2 / u, d1 / u, y1 * u,
                h11, -jnp.ones_like(d1), jnp.ones_like(d1), h22)

    use0 = jnp.abs(q1) > jnp.abs(q2)
    f0 = case_flag0()
    f1 = case_flag1()
    flag, nd1, nd2, nx1, h11, h21, h12, h22 = [jnp.where(use0, a, b) for a, b in zip(f0, f1)]
    # flag-1 branch with u <= 0 (negative weight would result): LAPACK zeroes
    # everything and returns the full-matrix form with H = 0
    zero = jnp.zeros_like(d1)
    bad = (~use0) & (1.0 + (p1 / p2) * (x1 / y1) <= 0.0) & (q2 != 0)
    flag = jnp.where(bad, -1.0, flag)
    nd1 = jnp.where(bad, zero, nd1)
    nd2 = jnp.where(bad, zero, nd2)
    nx1 = jnp.where(bad, zero, nx1)
    h11, h21, h12, h22 = (jnp.where(bad, zero, h) for h in (h11, h21, h12, h22))
    # degenerate: zero inputs → identity flag -2
    degen = (q2 == 0) & (q1 == 0)
    flag = jnp.where(degen, -2.0, flag)
    nd1 = jnp.where(degen, d1, nd1)
    nd2 = jnp.where(degen, d2, nd2)
    nx1 = jnp.where(degen, x1, nx1)

    # --- gamma rescaling (LAPACK drotmg GAM/GAMSQ/RGAMSQ loops) ---
    gam = jnp.asarray(4096.0, d1.dtype)
    gamsq, rgamsq = gam * gam, 1.0 / (gam * gam)

    def _need(s):
        fl, a1, a2, ax, g11, g21, g12, g22 = s
        d1bad = (a1 != 0) & ((a1 <= rgamsq) | (a1 >= gamsq))
        d2bad = (a2 != 0) & ((jnp.abs(a2) <= rgamsq) | (jnp.abs(a2) >= gamsq))
        return (fl != -2.0) & (d1bad | d2bad)

    def _step(s):
        fl, a1, a2, ax, g11, g21, g12, g22 = s
        # entering full-matrix form: materialize the implicit 1 / -1 entries
        g11 = jnp.where(fl == 0.0, jnp.ones_like(g11), g11)
        g22 = jnp.where(fl == 0.0, jnp.ones_like(g22), g22)
        g21 = jnp.where(fl == 1.0, -jnp.ones_like(g21), g21)
        g12 = jnp.where(fl == 1.0, jnp.ones_like(g12), g12)
        fl = jnp.where(fl != -2.0, jnp.full_like(fl, -1.0), fl)
        lo1 = (a1 != 0) & (a1 <= rgamsq)
        hi1 = a1 >= gamsq
        a1 = jnp.where(lo1, a1 * gamsq, jnp.where(hi1, a1 / gamsq, a1))
        ax = jnp.where(lo1, ax / gam, jnp.where(hi1, ax * gam, ax))
        g11 = jnp.where(lo1, g11 / gam, jnp.where(hi1, g11 * gam, g11))
        g12 = jnp.where(lo1, g12 / gam, jnp.where(hi1, g12 * gam, g12))
        lo2 = (a2 != 0) & (jnp.abs(a2) <= rgamsq)
        hi2 = jnp.abs(a2) >= gamsq
        a2 = jnp.where(lo2, a2 * gamsq, jnp.where(hi2, a2 / gamsq, a2))
        g21 = jnp.where(lo2, g21 / gam, jnp.where(hi2, g21 * gam, g21))
        g22 = jnp.where(lo2, g22 / gam, jnp.where(hi2, g22 * gam, g22))
        return (fl, a1, a2, ax, g11, g21, g12, g22)

    state = (flag, nd1, nd2, nx1, h11, h21, h12, h22)
    state = jax.lax.while_loop(_need, _step, state)
    flag, nd1, nd2, nx1, h11, h21, h12, h22 = state
    param = jnp.stack([flag, h11, h21, h12, h22])
    return nd1, nd2, nx1, param
