"""Newton solver for small nonlinear systems — analog of
ode/src/KokkosODE_Newton.hpp + ode/impl/KokkosODE_Newton_impl.hpp (used by
BDF; solves with batched Gesv).  vmap-batched on TPU."""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from ..common.tracing import annotate

__all__ = ["NewtonResult", "newton_solve"]


class NewtonResult(NamedTuple):
    x: jnp.ndarray
    converged: jnp.ndarray
    num_iters: jnp.ndarray


@annotate("ode.newton_solve")
def newton_solve(f: Callable, x0, *, jac: Callable = None, max_iters: int = 50,
                 rel_tol: float = 1e-10, abs_tol: float = 1e-12, args=()):
    """Solve f(x) = 0 with dense Jacobian steps (autodiff jacobian unless
    `jac` is given — the TPU-native replacement of the hand-coded Jacobians
    the reference requires)."""
    x0 = jnp.asarray(x0)
    jac_fn = jac or jax.jacfwd(lambda x: f(x, *args))

    def cond(state):
        x, it, done = state
        return jnp.logical_and(~done, it < max_iters)

    def body(state):
        x, it, _ = state
        r = f(x, *args)
        J = jac_fn(x) if jac is None else jac(x, *args)
        dx = jnp.linalg.solve(J, r)
        xn = x - dx
        done = jnp.linalg.norm(f(xn, *args)) <= abs_tol + rel_tol * jnp.linalg.norm(xn)
        return (xn, it + 1, done)

    x, it, done = jax.lax.while_loop(cond, body, (x0, jnp.int32(0), jnp.bool_(False)))
    return NewtonResult(x, done, it)
