"""Implicit BDF1..BDF6 integrators — analog of ode/src/KokkosODE_BDF.hpp:32
(+ ode/impl tables).  Fixed-step BDF-k with Newton inner solves (autodiff
Jacobians); startup ramps the order through lower-order BDF steps."""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .newton import newton_solve

__all__ = ["BDFResult", "bdf_solve"]

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
