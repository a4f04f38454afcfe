"""Explicit Runge-Kutta family — analog of ode/src/KokkosODE_RungeKutta.hpp:33,100
with the tableau set of ode/impl/KokkosODE_RungeKuttaTables_impl.hpp
({RKFE, RKEH, RKF12, RKBS, RK4, RKF45, RKCK, RKDP, VER56}) and the adaptive
step controller of KokkosODE_RungeKutta_impl.hpp.

TPU design: tableaus are static; one adaptive step is a jittable function;
many independent systems integrate via `vmap` (the reference's team-level
per-thread systems, SURVEY.md §2.8).
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from ..common.tracing import annotate

__all__ = ["RKType", "ButcherTableau", "tableau", "rk_solve", "ODESolverStatus"]


class RKType(enum.Enum):
    RKFE = "rkfe"     # forward Euler (1 stage)
    RKEH = "rkeh"     # Euler-Heun 1(2)
    RKF12 = "rkf12"   # Fehlberg 1(2)
    RKBS = "rkbs"     # Bogacki-Shampine 2(3)
    RK4 = "rk4"       # classic RK4
    RKF45 = "rkf45"   # Fehlberg 4(5)
    RKCK = "rkck"     # Cash-Karp 4(5)
    RKDP = "rkdp"     # Dormand-Prince 4(5)
    VER56 = "ver56"   # Verner 5(6)


@dataclasses.dataclass(frozen=True)
class ButcherTableau:
    a: tuple      # lower-triangular stage coefficients (tuple of tuples)
    b: tuple      # solution weights
    bhat: tuple   # embedded (lower-order) weights, or None
    c: tuple      # nodes
    order: int

    @property
    def stages(self) -> int:
        return len(self.b)


def _t(*rows):
    return tuple(tuple(float(x) for x in r) for r in rows)


_TABLEAUS = {}


def _register(kind, a, b, bhat, c, order):
    _TABLEAUS[kind] = ButcherTableau(
        _t(*a), tuple(map(float, b)),
        None if bhat is None else tuple(map(float, bhat)),
        tuple(map(float, c)), order)


_register(RKType.RKFE, [[0.0]], [1.0], None, [0.0], 1)
_register(RKType.RKEH, [[0.0], [1.0]], [0.5, 0.5], [1.0, 0.0], [0.0, 1.0], 2)
_register(RKType.RKF12,
          [[0.0], [0.5], [1.0 / 256, 255.0 / 256]],
          [1.0 / 512, 255.0 / 256, 1.0 / 512],
          [1.0 / 256, 255.0 / 256, 0.0],
          [0.0, 0.5, 1.0], 2)
_register(RKType.RKBS,
          [[0.0], [0.5], [0.0, 0.75], [2 / 9, 1 / 3, 4 / 9]],
          [2 / 9, 1 / 3, 4 / 9, 0.0],
          [7 / 24, 1 / 4, 1 / 3, 1 / 8],
          [0.0, 0.5, 0.75, 1.0], 3)
_register(RKType.RK4,
          [[0.0], [0.5], [0.0, 0.5], [0.0, 0.0, 1.0]],
          [1 / 6, 1 / 3, 1 / 3, 1 / 6], None,
          [0.0, 0.5, 0.5, 1.0], 4)
_register(RKType.RKF45,
          [[0.0], [0.25], [3 / 32, 9 / 32],
           [1932 / 2197, -7200 / 2197, 7296 / 2197],
           [439 / 216, -8.0, 3680 / 513, -845 / 4104],
           [-8 / 27, 2.0, -3544 / 2565, 1859 / 4104, -11 / 40]],
          [16 / 135, 0.0, 6656 / 12825, 28561 / 56430, -9 / 50, 2 / 55],
          [25 / 216, 0.0, 1408 / 2565, 2197 / 4104, -1 / 5, 0.0],
          [0.0, 0.25, 3 / 8, 12 / 13, 1.0, 0.5], 5)
_register(RKType.RKCK,
          [[0.0], [0.2], [3 / 40, 9 / 40], [0.3, -0.9, 1.2],
           [-11 / 54, 2.5, -70 / 27, 35 / 27],
           [1631 / 55296, 175 / 512, 575 / 13824, 44275 / 110592, 253 / 4096]],
          [37 / 378, 0.0, 250 / 621, 125 / 594, 0.0, 512 / 1771],
          [2825 / 27648, 0.0, 18575 / 48384, 13525 / 55296, 277 / 14336, 0.25],
          [0.0, 0.2, 0.3, 0.6, 1.0, 7 / 8], 5)
_register(RKType.RKDP,
          [[0.0], [0.2], [3 / 40, 9 / 40], [44 / 45, -56 / 15, 32 / 9],
           [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
           [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
           [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]],
          [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0],
          [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40],
          [0.0, 0.2, 0.3, 0.8, 8 / 9, 1.0, 1.0], 5)
_register(RKType.VER56,
          [[0.0], [1 / 6], [4 / 75, 16 / 75], [5 / 6, -8 / 3, 5 / 2],
           [-165 / 64, 55 / 6, -425 / 64, 85 / 96],
           [12 / 5, -8.0, 4015 / 612, -11 / 36, 88 / 255],
           [-8263 / 15000, 124 / 75, -643 / 680, -81 / 250, 2484 / 10625],
           [3501 / 1720, -300 / 43, 297275 / 52632, -319 / 2322, 24068 / 84065, 0.0, 3850 / 26703]],
          [3 / 40, 0.0, 875 / 2244, 23 / 72, 264 / 1955, 0.0, 125 / 11592, 43 / 616],
          [13 / 160, 0.0, 2375 / 5984, 5 / 16, 12 / 85, 3 / 44, 0.0, 0.0],
          [0.0, 1 / 6, 4 / 15, 2 / 3, 5 / 6, 1.0, 1 / 15, 1.0], 6)


@annotate("ode.tableau")
def tableau(kind: RKType) -> ButcherTableau:
    return _TABLEAUS[kind]


class ODESolverStatus(enum.Enum):
    SUCCESS = 0
    MAX_STEPS = 1
    MIN_STEP = 2


class RKResult(NamedTuple):
    y: jnp.ndarray
    status: jnp.ndarray       # int32 ODESolverStatus value
    num_steps: jnp.ndarray


def _rk_step(f, tb: ButcherTableau, t, h, y, args):
    ks = []
    for i in range(tb.stages):
        yi = y
        for j, aij in enumerate(tb.a[i][:i]):
            if aij != 0.0:
                yi = yi + h * aij * ks[j]
        ks.append(f(t + tb.c[i] * h, yi, *args))
    y_hi = y
    for i, bi in enumerate(tb.b):
        if bi != 0.0:
            y_hi = y_hi + h * bi * ks[i]
    if tb.bhat is None:
        return y_hi, jnp.zeros_like(y)
    y_lo = y
    for i, bi in enumerate(tb.bhat):
        if bi != 0.0:
            y_lo = y_lo + h * bi * ks[i]
    return y_hi, y_hi - y_lo


@annotate("ode.rk_solve")
def rk_solve(f: Callable, y0, t0: float, t1: float, *, kind: RKType = RKType.RKDP,
             num_steps: int = 0, rel_tol: float = 1e-6, abs_tol: float = 1e-9,
             max_steps: int = 10_000, args=()):
    """Integrate y' = f(t, y) from t0 to t1 (cf. RungeKutta<RK_type>::Solve).

    num_steps > 0 -> fixed-step; else adaptive (embedded error control with
    the standard PI-free safety-factor step update of the reference impl).
    """
    tb = tableau(kind)
    y0 = jnp.asarray(y0)
    if num_steps == 0 and tb.bhat is None:
        num_steps = 100  # non-embedded tableaus have no error estimate
    if num_steps:
        h = (t1 - t0) / num_steps

        def body(i, y):
            t = t0 + i * h
            ynew, _ = _rk_step(f, tb, t, h, y, args)
            return ynew

        y = jax.lax.fori_loop(0, num_steps, body, y0)
        return RKResult(y, jnp.int32(ODESolverStatus.SUCCESS.value),
                        jnp.int32(num_steps))

    # adaptive
    h0 = (t1 - t0) / 100.0
    min_h = (t1 - t0) / (10.0 * max_steps)

    def cond(state):
        t, h, y, steps, done = state
        return jnp.logical_and(~done, steps < max_steps)

    def body(state):
        t, h, y, steps, done = state
        h = jnp.minimum(h, t1 - t)
        ynew, err = _rk_step(f, tb, t, h, y, args)
        tol = abs_tol + rel_tol * jnp.maximum(jnp.max(jnp.abs(y)), jnp.max(jnp.abs(ynew)))
        enorm = jnp.max(jnp.abs(err)) / tol
        accept = enorm <= 1.0
        t = jnp.where(accept, t + h, t)
        y = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, b, a), y, ynew)
        fac = jnp.clip(0.9 * (1.0 / jnp.maximum(enorm, 1e-12)) ** (1.0 / tb.order),
                       0.2, 5.0)
        h = jnp.maximum(h * fac, min_h)
        done = t >= t1 * (1 - 1e-12) if t1 > 0 else t >= t1
        return (t, h, y, steps + 1, done)

    t, h, y, steps, done = jax.lax.while_loop(
        cond, body, (jnp.asarray(t0, y0.dtype), jnp.asarray(h0, y0.dtype), y0,
                     jnp.int32(0), jnp.bool_(False)))
    status = jnp.where(done, ODESolverStatus.SUCCESS.value, ODESolverStatus.MAX_STEPS.value)
    return RKResult(y, status.astype(jnp.int32), steps)
