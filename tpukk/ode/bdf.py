"""Implicit BDF1..BDF6 integrators — analog of ode/src/KokkosODE_BDF.hpp:32
(+ ode/impl tables).  Fixed-step BDF-k with Newton inner solves (autodiff
Jacobians); startup ramps the order through lower-order BDF steps."""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .newton import newton_solve
from ..common.tracing import annotate

__all__ = ["BDFAdaptiveResult", "BDFResult", "bdf_solve",
           "bdf_solve_adaptive"]

# BDF-k:  sum_{j=0..k} alpha_j y_{n+1-j} = h beta f(t_{n+1}, y_{n+1})
_BDF_ALPHA = {
    1: ([1.0, -1.0], 1.0),
    2: ([3.0 / 2, -2.0, 1.0 / 2], 1.0),
    3: ([11.0 / 6, -3.0, 3.0 / 2, -1.0 / 3], 1.0),
    4: ([25.0 / 12, -4.0, 3.0, -4.0 / 3, 1.0 / 4], 1.0),
    5: ([137.0 / 60, -5.0, 5.0, -10.0 / 3, 5.0 / 4, -1.0 / 5], 1.0),
    6: ([147.0 / 60, -6.0, 15.0 / 2, -20.0 / 3, 15.0 / 4, -6.0 / 5, 1.0 / 6], 1.0),
}


class BDFResult(NamedTuple):
    y: jnp.ndarray
    converged: jnp.ndarray


@annotate("ode.bdf_solve")
def bdf_solve(f: Callable, y0, t0: float, t1: float, num_steps: int,
              order: int = 2, args=(), newton_iters: int = 20):
    """Integrate y' = f(t, y) with fixed-step BDF-`order`
    (cf. KokkosODE::BDF::Solve)."""
    assert 1 <= order <= 6, "bdf: order in [1,6]"
    y0 = jnp.asarray(y0)
    h = (t1 - t0) / num_steps
    n = y0.shape[0] if y0.ndim else 1

    hist0 = jnp.tile(y0[None], (order + 1, 1) if y0.ndim else (order + 1,))
    ok0 = jnp.bool_(True)

    def step_k(k, hist, t_next, ok):
        alpha, beta = _BDF_ALPHA[k]

        def residual(y):
            acc = alpha[0] * y
            for j in range(1, k + 1):
                acc = acc + alpha[j] * hist[j - 1]
            return acc - h * beta * f(t_next, y)

        res = newton_solve(residual, hist[0], max_iters=newton_iters,
                           rel_tol=1e-12, abs_tol=1e-12)
        return res.x, jnp.logical_and(ok, res.converged)

    # startup: step i uses order min(i+1, order)
    hist = hist0
    ok = ok0
    for i in range(min(order - 1, num_steps)):
        k = i + 1
        t_next = t0 + (i + 1) * h
        ynew, ok = step_k(k, hist, t_next, ok)
        hist = jnp.concatenate([ynew[None], hist[:-1]], axis=0)

    start = min(order - 1, num_steps)

    def body(i, carry):
        hist, ok = carry
        t_next = t0 + (i + 1) * h
        ynew, ok = step_k(order, hist, t_next, ok)
        hist = jnp.concatenate([ynew[None], hist[:-1]], axis=0)
        return (hist, ok)

    hist, ok = jax.lax.fori_loop(start, num_steps, body, (hist, ok))
    return BDFResult(hist[0], ok)


# ---------------------------------------------------------------------------
# Adaptive-order, adaptive-step BDF — analog of KokkosODE::Experimental::
# BDFSolve (ode/src/KokkosODE_BDF.hpp:137-184: "starts with a BDF1 method and
# adaptively increases or decreases both dt and the order of integration
# based on error estimators").  Formulation: Shampine/Reichelt modified-BDF
# on the backward-difference D matrix (the same NDF-style machinery the
# reference's initial_step_size/BDFStep implement), with everything masked
# into a single lax.while_loop: variable order lives as a traced integer,
# step-size changes rescale D via the (8,8) transformation matrix whose
# entries depend only on (i, j, factor).

_MAX_ORDER = 5
_NEWTON_MAXITER = 4

_KAPPA = np.array([0.0, -0.1850, -1 / 9, -0.0823, -0.0415, 0.0])
_GAMMA = np.hstack((0.0, np.cumsum(1.0 / np.arange(1, _MAX_ORDER + 1))))
_ALPHA = (1 - _KAPPA) * _GAMMA
_ERR_CONST = _KAPPA * _GAMMA + 1.0 / np.arange(1, _MAX_ORDER + 2)


class BDFAdaptiveResult(NamedTuple):
    y: jnp.ndarray
    status: jnp.ndarray      # 0 ok, 1 failed (step underflow / iter cap)
    num_steps: jnp.ndarray   # accepted steps


def _change_D(D, k, factor):
    """D[:k+1] <- R(factor)·R(1) applied (scipy _bdf.change_D); rows > k
    untouched.  Entry formula depends only on (i, j, factor)."""
    P = _MAX_ORDER + 3
    i = jnp.arange(P, dtype=D.dtype)[:, None]
    j = jnp.arange(P, dtype=D.dtype)[None, :]

    def R_of(fac):
        M = jnp.where((i >= 1) & (j >= 1), (i - 1 - fac * j) / jnp.maximum(i, 1), 0.0)
        M = jnp.where(i == 0, 1.0, M)
        return jnp.cumprod(M, axis=0)

    RU = R_of(factor) @ R_of(jnp.array(1.0, D.dtype))
    rows = jnp.arange(P)[:, None]
    cols = jnp.arange(P)[None, :]
    # block-diagonal: identity beyond order k
    RUm = jnp.where((rows <= k) & (cols <= k), RU,
                    jnp.where(rows == cols, 1.0, 0.0).astype(D.dtype))
    return RUm.T @ D


def _rms_norm(x, scale):
    return jnp.sqrt(jnp.mean((x / scale) ** 2))


@annotate("ode.bdf_solve_adaptive")
def bdf_solve_adaptive(f: Callable, y0, t0: float, t1: float, *,
                       rtol: float = 1e-6, atol: float = 1e-9,
                       initial_step: float = None, max_step: float = np.inf,
                       max_steps: int = 10_000, args=()):
    """Adaptive BDF1..5 (cf. BDFSolve, KokkosODE_BDF.hpp:159).  Returns the
    solution at t1.  f(t, y, *args) -> dy/dt; Jacobian by autodiff."""
    y0 = jnp.asarray(y0, dtype=jnp.result_type(float, jnp.asarray(y0).dtype))
    n = y0.shape[0]
    fdt = y0.dtype
    P = _MAX_ORDER + 3
    pad = lambda a: jnp.asarray(np.pad(a, (0, P - len(a))), fdt)
    gamma = pad(_GAMMA)
    alpha = pad(_ALPHA)
    err_const = pad(_ERR_CONST)
    eye = jnp.eye(n, dtype=fdt)

    def fun(t, y):
        return jnp.asarray(f(t, y, *args), fdt)

    jac = jax.jacfwd(fun, argnums=1)

    f0 = fun(jnp.asarray(t0, fdt), y0)
    # initial step: reference initial_step_size (BDF.hpp:184) / scipy h_start
    scale0 = atol + rtol * jnp.abs(y0)
    d0 = _rms_norm(y0, scale0)
    d1 = _rms_norm(f0, scale0)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    h0 = jnp.minimum(h0, (t1 - t0) * jnp.asarray(0.1, fdt))
    y1 = y0 + h0 * f0
    d2 = _rms_norm(fun(t0 + h0, y1) - f0, scale0) / h0
    h1 = jnp.where(jnp.maximum(d1, d2) <= 1e-15,
                   jnp.maximum(1e-6, h0 * 1e-3),
                   (0.01 / jnp.maximum(d1, d2)) ** (1.0 / 2.0))
    h_init = (jnp.minimum(100 * h0, h1) if initial_step is None
              else jnp.asarray(initial_step, fdt))
    h_init = jnp.clip(h_init, 1e-12, min(max_step, float(t1 - t0)))

    D0 = jnp.zeros((P, n), fdt).at[0].set(y0).at[1].set(h_init * f0)

    # state: (t, h, k, D, n_eq, steps, attempts, status, done)
    state0 = (jnp.asarray(t0, fdt), h_init, jnp.int32(1), D0, jnp.int32(0),
              jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.bool_(False))

    min_step = 1e-13 * float(t1 - t0)

    def cond(s):
        return ~s[8]

    def body(s):
        t, h, k, D, n_eq, steps, attempts, status, done = s
        # clip h to remaining interval (and rescale D for the new h)
        h_new = jnp.minimum(h, jnp.asarray(float(max_step), fdt))
        h_new = jnp.minimum(h_new, jnp.asarray(t1, fdt) - t)
        D = _change_D(D, k, h_new / h)
        h = h_new
        t_new = t + h

        # predict
        ordmask = (jnp.arange(P) <= k)[:, None]
        y_pred = jnp.sum(jnp.where(ordmask, D, 0.0), axis=0)
        scale = atol + rtol * jnp.abs(y_pred)
        gk = jnp.where((jnp.arange(P) >= 1) & (jnp.arange(P) <= k), gamma, 0.0)
        psi = (D * (gk / alpha[k])[:, None]).sum(axis=0)
        c = h / alpha[k]

        # Newton on d:  c f(t_new, y_pred + d) - psi - d = 0
        J = jac(t_new, y_pred)
        A = eye - c * J
        lu_piv = jax.scipy.linalg.lu_factor(A)

        def newton_body(m, carry):
            d, y, conv, rate, dnp = carry
            F = c * fun(t_new, y) - psi - d
            dy = jax.scipy.linalg.lu_solve(lu_piv, F)
            dn = _rms_norm(dy, scale)
            rate = jnp.where(m > 0, dn / jnp.maximum(dnp, 1e-300), rate)
            d = d + dy
            y = y + dy
            conv = conv | (dn <= 1e-10) | ((m > 0) & (rate < 1.0) &
                           (rate / (1 - rate) * dn < 1e-3))
            return d, y, conv, rate, dn

        d, y_new, conv, _, _ = jax.lax.fori_loop(
            0, _NEWTON_MAXITER, newton_body,
            (jnp.zeros_like(y_pred), y_pred, jnp.bool_(False),
             jnp.asarray(0.0, fdt), jnp.asarray(0.0, fdt)))

        err = err_const[k] * d
        err_norm = _rms_norm(err, scale)
        accept = conv & (err_norm <= 1.0)

        # --- rejected: shrink h (Newton fail: 0.5; error: by err^-1/(k+1))
        fac_rej = jnp.where(conv,
                            jnp.clip(0.9 * err_norm ** (-1.0 / (k + 1)),
                                     0.1, 0.9),
                            jnp.asarray(0.5, fdt))
        D_rej = _change_D(D, k, fac_rej)
        h_rej = h * fac_rej

        # --- accepted: shift D, maybe adapt order & step
        Dk2 = d - D[k + 1]
        D_acc = D.at[k + 2].set(jnp.where(k + 2 < P, 1.0, 0.0) * Dk2)
        D_acc = D_acc.at[k + 1].set(d)
        # D[j] += D[j+1] for j = k..0 — prefix-sum from the top
        revmask = (jnp.arange(P)[:, None] <= k)

        def backsum(j, Dm):
            jj = k - j
            return Dm.at[jj].add(Dm[jj + 1])

        D_acc = jax.lax.fori_loop(0, k + 1, lambda j, Dm: backsum(j, Dm), D_acc)
        n_eq_acc = n_eq + 1

        def order_step(Dm, h_, k_, n_eq_):
            # only after k+1 equal steps (scipy rule)
            em = jnp.where(k_ > 1,
                           _rms_norm(err_const[k_ - 1] * Dm[k_], scale),
                           jnp.asarray(jnp.inf, fdt))
            ep = jnp.where(k_ < _MAX_ORDER,
                           _rms_norm(err_const[k_ + 1] * Dm[k_ + 2], scale),
                           jnp.asarray(jnp.inf, fdt))
            errs = jnp.stack([em, err_norm, ep])
            pw = jnp.stack([1.0 / k_, 1.0 / (k_ + 1), 1.0 / (k_ + 2)]).astype(fdt)
            with np.errstate(divide="ignore"):
                facs = jnp.where(errs > 0, errs ** -pw, jnp.asarray(jnp.inf, fdt))
            best = jnp.argmax(facs)
            k_new = jnp.clip(k_ + best.astype(jnp.int32) - 1, 1, _MAX_ORDER)
            factor = jnp.clip(0.9 * facs[best], 0.1, 10.0)
            Dm = _change_D(Dm, k_new, factor)
            return Dm, h_ * factor, k_new, jnp.int32(0)

        do_order = accept & (n_eq_acc >= k + 1)
        D_acc2, h_acc, k_acc, n_eq2 = jax.tree_util.tree_map(
            lambda a, b: jnp.where(do_order, a, b),
            order_step(D_acc, h, k, n_eq_acc),
            (D_acc, h, k, n_eq_acc))

        t_out = jnp.where(accept, t_new, t)
        h_out = jnp.where(accept, h_acc, h_rej)
        k_out = jnp.where(accept, k_acc, k)
        D_out = jnp.where(accept, D_acc2, D_rej)
        n_eq_out = jnp.where(accept, n_eq2, jnp.int32(0))
        steps_out = steps + accept.astype(jnp.int32)
        attempts_out = attempts + 1
        fail = (h_out < min_step) | (attempts_out >= max_steps)
        reached = t_out >= t1 - 1e-12 * max(abs(t1), 1.0)
        return (t_out, h_out, k_out, D_out, n_eq_out, steps_out, attempts_out,
                jnp.where(fail & ~reached, jnp.int32(1), jnp.int32(0)),
                reached | fail)

    t, h, k, D, n_eq, steps, attempts, status, done = jax.lax.while_loop(
        cond, body, state0)
    return BDFAdaptiveResult(D[0], status, steps)
