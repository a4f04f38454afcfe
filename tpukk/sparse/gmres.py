"""GMRES — restarted, CGS2/MGS orthogonalization, preconditionable.
Analog of sparse/src/KokkosSparse_gmres.hpp:59 + gmres_handle.hpp:76-78
(Ortho enum, subspace m, tol, restarts) and the Arnoldi/Givens loop of
sparse/impl/KokkosSparse_gmres_impl.hpp (:64-244).

TPU design: the Arnoldi loop runs under jit with static subspace size m;
the (m+1)×m Hessenberg least-squares uses a batched-free QR on device (the
reference keeps H on host with Givens rotations — an explicit sync point per
iteration it accepts; we avoid it entirely).  Restart loop on host reads one
scalar (residual) per cycle.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import check
from ..common.tracing import annotate
from ..containers import CsrMatrix
from .preconditioner import IdentityPrec, Preconditioner
from .spmv import SpmvHandle

__all__ = ["Ortho", "GmresHandle", "GmresStats", "gmres"]


class Ortho(enum.Enum):
    MGS = "mgs"
    CGS2 = "cgs2"


class GmresHandle:
    """cf. gmres_handle.hpp: m (subspace), tol, max_restarts, ortho."""

    def __init__(self, m: int = 50, tol: float = 1e-8, max_restarts: int = 50,
                 ortho: Ortho = Ortho.CGS2, reorder: str = "auto"):
        self.m = int(m)
        self.tol = float(tol)
        self.max_restarts = int(max_restarts)
        self.ortho = ortho
        # reorder: "auto" | "rcm" | "none" — run the WHOLE Krylov loop in
        # RCM-permuted space when the matrix re-bands (round-5: fem2d30k
        # SpMV 16.3 -> 10.5 us permuted; the iterates are identical since
        # GMRES is orthogonally invariant: (PAP^T)(Px) = Pb).  "auto"
        # engages only without a user preconditioner, f32 CsrMatrix, and a
        # >=4x bandwidth cut.
        self.reorder = reorder
        # stats (filled by gmres)
        self.num_iters = 0
        self.end_rel_res = float("nan")
        self.converged = False


@dataclasses.dataclass
class GmresStats:
    num_iters: int
    end_rel_res: float
    converged: bool


def _norm(x):
    """‖x‖₂, conjugation-correct for complex dtypes."""
    return jnp.sqrt(jnp.real(jnp.sum(jnp.conj(x) * x)))


def _arnoldi_cycle(Ah, prec, b, x0, m, ortho: Ortho):
    """One restart cycle; returns (x_new, rel_residual_estimate)."""
    r = b - Ah(x0)
    z = prec.apply(r)
    beta = _norm(z).astype(b.dtype)
    n = b.shape[0]
    V = jnp.zeros((m + 1, n), b.dtype)
    V = V.at[0].set(z / jnp.where(beta == 0, 1.0, beta))
    H = jnp.zeros((m + 1, m), b.dtype)

    def arnoldi_step(j, VH, static_j=False):
        V, H = VH
        w = prec.apply(Ah(V[j]))
        if ortho == Ortho.CGS2:
            # classical GS twice (CGS2): h = Vᵀw; w -= Vh; correction pass.
            # With a STATIC j (unrolled cycle) only rows [0, j] stream —
            # the masked full-(m+1) form read 2x the basis bytes on average
            # (round-4 bench: vs_baseline 0.573 ~ the model's 4*(m/2)
            # streams vs the mask's 4*m).
            hp = jax.lax.Precision.HIGHEST
            if static_j:
                Vj = jax.lax.slice_in_dim(V, 0, j + 1, axis=0)
                h1s = jnp.matmul(jnp.conj(Vj), w, precision=hp)
                w = w - jnp.matmul(Vj.T, h1s, precision=hp)
                h2s = jnp.matmul(jnp.conj(Vj), w, precision=hp)
                w = w - jnp.matmul(Vj.T, h2s, precision=hp)
                pad = (0, m + 1 - (j + 1))
                h = jnp.pad(h1s + h2s, pad)
            else:
                mask = (jnp.arange(m + 1) <= j)[:, None]
                Vm = V * mask
                h1 = jnp.matmul(jnp.conj(Vm), w, precision=hp)
                w = w - jnp.matmul(Vm.T, h1, precision=hp)
                h2 = jnp.matmul(jnp.conj(Vm), w, precision=hp)
                w = w - jnp.matmul(Vm.T, h2, precision=hp)
                h = h1 + h2
        else:
            def mgs(i, wh):
                w, h = wh
                hi = jnp.where(i <= j, jnp.sum(jnp.conj(V[i]) * w), 0.0)
                return (w - hi * V[i], h.at[i].set(hi))

            w, h = jax.lax.fori_loop(0, m + 1, mgs, (w, jnp.zeros(m + 1, b.dtype)))
        hn = _norm(w).astype(b.dtype)
        H = H.at[:, j].set(h.at[j + 1].set(hn))
        V = V.at[j + 1].set(w / jnp.where(hn == 0, 1.0, hn))
        return (V, H)

    if ortho == Ortho.CGS2 and m <= 64:
        # unrolled cycle: static per-step slices halve basis traffic
        for j in range(m):
            V, H = arnoldi_step(j, (V, H), static_j=True)
    else:
        V, H = jax.lax.fori_loop(0, m, arnoldi_step, (V, H))
    e1 = jnp.zeros(m + 1, b.dtype).at[0].set(beta)
    # rank-robust small least-squares (handles beta==0 and happy breakdown,
    # where H is singular — the reference's Givens loop exits early instead)
    y = jnp.linalg.lstsq(H, e1)[0]
    x_new = x0 + jnp.matmul(V[:m].T, y, precision=jax.lax.Precision.HIGHEST)
    res_est = _norm(H @ y - e1)
    return x_new, res_est


@annotate("gmres")
def gmres(handle: GmresHandle, A, b, x0=None, prec: Optional[Preconditioner] = None):
    """Solve A·x = b; returns (x, GmresStats).  A may be a CsrMatrix or an
    SpmvHandle."""
    Ah = A if isinstance(A, SpmvHandle) else SpmvHandle(A)
    to_p = from_p = None
    if (getattr(handle, "reorder", "none") in ("auto", "rcm")
            and prec is None and not isinstance(A, SpmvHandle)):
        sel = _rcm_reorder(Ah, force=handle.reorder == "rcm")
        if sel is not None:
            Ah, to_p, from_p = sel
    prec = prec or IdentityPrec()
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    if to_p is not None:
        b = to_p(jnp.asarray(b))
        x = to_p(x)
    m = min(handle.m, b.shape[0])
    bnorm = float(np.asarray(_norm(b)))
    if bnorm == 0:
        bnorm = 1.0
    # cache the jitted restart cycle on the handle — a fresh closure-jit per
    # solve recompiled every call (~50s through a remote-compile tunnel);
    # repeated solves with the same (A, prec, m, ortho, shapes) reuse it.
    # Identity (`is`) checks keep strong refs so stale id() reuse can't alias.
    ck = getattr(handle, "_cycle_cache", None)
    if not (ck and ck[0] is Ah and ck[1] is prec and
            ck[2] == (m, handle.ortho, b.shape, b.dtype)):
        fn = jax.jit(lambda xx, bb: _arnoldi_cycle(Ah, prec, bb, xx, m, handle.ortho))
        handle._cycle_cache = (Ah, prec, (m, handle.ortho, b.shape, b.dtype), fn)
    cycle = handle._cycle_cache[3]
    iters = 0
    rel = float("inf")
    for _ in range(handle.max_restarts):
        x, res_est = cycle(x, b)
        iters += m
        # true residual check at restart boundary (cheap, robust)
        r = b - Ah(x)
        rel = float(np.asarray(_norm(r))) / bnorm
        if rel <= handle.tol:
            break
    handle.num_iters = iters
    handle.end_rel_res = rel
    handle.converged = rel <= handle.tol
    if from_p is not None:
        x = from_p(x)
    return x, GmresStats(iters, rel, handle.converged)


def _rcm_reorder(Ah, force=False):
    """(permuted handle, to_perm, from_perm) when RCM re-bands the matrix
    enough to pay for itself inside the Krylov loop, else None."""
    A = Ah.A
    if jnp.result_type(A.values.dtype) != jnp.float32 or A.nrows < 4096:
        return None if not force else Ah.rcm_permuted()
    try:
        ph, to_p, from_p = Ah.rcm_permuted()
    except Exception:
        return None
    if not force:
        sp = A.to_scipy().tocsr()
        spp = ph.A.to_scipy().tocsr()

        def bw(s):
            rows = np.repeat(np.arange(s.shape[0]), np.diff(s.indptr))
            return int(np.abs(rows - s.indices).max(initial=0))

        if bw(spp) * 4 > bw(sp):
            return None
    return ph, to_p, from_p
