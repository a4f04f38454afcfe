"""Preconditioned CG — analog of perf_test/sparse/KokkosSparse_pcg.cpp's
solver driver (the reference exercises GS/ILU preconditioners through it).
Fixed-iteration jitted inner loop with host-side convergence checks every
`check_every` iterations (avoids per-iteration device→host syncs)."""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .preconditioner import IdentityPrec, Preconditioner
from .spmv import SpmvHandle
from ..common.tracing import annotate

__all__ = ["PcgStats", "pcg", "pcg_iteration_body", "pcg_initial_state"]


@dataclasses.dataclass
class PcgStats:
    num_iters: int
    end_rel_res: float
    converged: bool


@annotate("pcg_iteration_body")
def pcg_iteration_body(Ah: SpmvHandle, prec: Preconditioner):
    """One PCG iteration as a lax.scan body over state (x, r, p, rz) —
    shared by pcg() and the solver perf rows (bench_suite)."""

    def body(carry, _):
        x, r, p, rz = carry
        Ap = Ah(p)
        pAp = jnp.sum(jnp.conj(p) * Ap)
        alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = prec.apply(r)
        rz_new = jnp.sum(jnp.conj(r) * z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return (x, r, p, rz_new), None

    return body


@annotate("pcg_initial_state")
def pcg_initial_state(Ah: SpmvHandle, prec: Preconditioner, b, x):
    r = b - Ah(x)
    z = prec.apply(r)
    return (x, r, z, jnp.sum(jnp.conj(r) * z))


@annotate("pcg")
def pcg(A, b, x0=None, tol: float = 1e-8, max_iters: int = 500,
        prec: Optional[Preconditioner] = None, check_every: int = 10):
    Ah = A if isinstance(A, SpmvHandle) else SpmvHandle(A)
    prec = prec or IdentityPrec()
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    bnorm = float(np.sqrt(np.abs(np.asarray(jnp.sum(jnp.conj(b) * b))))) or 1.0
    # cache the jitted iteration block on the SpmvHandle — a fresh
    # closure-jit per solve recompiled every call (~50s through a
    # remote-compile tunnel); identity checks hold strong refs.
    ck = getattr(Ah, "_pcg_cache", None)
    if not (ck and ck[0] is prec and ck[1] == (check_every, b.shape, b.dtype)):
        body = pcg_iteration_body(Ah, prec)
        fn = jax.jit(lambda state: jax.lax.scan(
            body, state, None, length=check_every)[0])
        Ah._pcg_cache = (prec, (check_every, b.shape, b.dtype), fn)
    block = Ah._pcg_cache[2]

    state = pcg_initial_state(Ah, prec, b, x)
    iters = 0
    rel = float("inf")
    while iters < max_iters:
        state = block(state)
        iters += check_every
        rel = float(np.sqrt(np.abs(np.asarray(jnp.sum(jnp.conj(state[1]) * state[1]))))) / bnorm
        if rel <= tol:
            break
    x = state[0]
    return x, PcgStats(iters, rel, rel <= tol)
