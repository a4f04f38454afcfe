"""Distributed SpMV over a device mesh — the multi-device layer the reference
explicitly does not have (SURVEY.md §2.11): rows of A block-partitioned over
the mesh axis, x row-sharded with the same partition, the needed remote x
entries obtained with an `all_gather` over ICI inside `shard_map`.

(A halo-exchange plan with interior/boundary overlap — ppermute double
buffering — is the planned refinement; all_gather is the correct-first
collective schedule and already rides ICI.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .halo import HaloPlan
from .partition import RowPartition, partition_rows
from ..common.tracing import annotate

__all__ = ["shard_partition", "dist_spmv", "dist_dot", "dist_cg_step",
           "shard_halo_plan", "dist_spmv_halo", "dist_pcg", "dist_gmres"]


@annotate("dist.shard_partition")
def shard_partition(plan: RowPartition, mesh: Mesh, axis: str = "parts"):
    """Place the stacked plan + a row-sharded vector layout on the mesh."""
    spec = NamedSharding(mesh, P(axis))
    cols = jax.device_put(plan.cols, spec)
    vals = jax.device_put(plan.vals, spec)
    valid = jax.device_put(plan.row_valid, spec)
    return RowPartition(cols, vals, valid, plan.nrows, plan.ncols,
                        plan.n_parts, plan.rows_per_part)


def _local_spmv(cols, vals, valid, x_shard, axis):
    # gather the full x across the mesh axis (ICI all-gather), then a purely
    # local padded-row gather+reduce — no scatter, no atomics.
    x = jax.lax.all_gather(x_shard, axis, tiled=True).reshape(-1)  # (padded_rows,)
    c = cols[0]                                           # shard leading axis is size 1
    v = vals[0]
    y = jnp.sum(v * jnp.take(x, c, axis=0), axis=1)
    return (y * valid[0].astype(y.dtype))[None]


@annotate("dist.dist_spmv")
def dist_spmv(plan: RowPartition, x_padded, mesh: Mesh, axis: str = "parts"):
    """y = A·x with x_padded of shape (n_parts*rows_per_part,) row-sharded.

    Note: the plan's column ids index the *unpadded* global x; callers pass x
    padded to padded_rows with zeros in the tail (col ids < nrows always).
    """
    f = jax.shard_map(
        partial(_local_spmv, axis=axis),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    y2 = f(plan.cols, plan.vals, plan.row_valid,
           x_padded.reshape(plan.n_parts, plan.rows_per_part))
    return y2.reshape(-1)


@annotate("dist.shard_halo_plan")
def shard_halo_plan(plan: HaloPlan, mesh: Mesh, axis: str = "parts") -> HaloPlan:
    spec = NamedSharding(mesh, P(axis))
    arrays = jax.tree_util.tree_map(lambda a: jax.device_put(a, spec), plan)
    return arrays


def _halo_local_spmv(send_idx, ic, iv, ir, bc, bv, br, x_shard, *, axis, rpp, H):
    """Per-part body: exchange halo with all_to_all while the interior block
    computes (no data dependency — XLA may overlap), then boundary block."""
    x = x_shard[0]                                   # (rpp,)
    sends = jnp.take(x, send_idx[0], axis=0)         # (P, H)
    recv = jax.lax.all_to_all(sends, axis, split_axis=0, concat_axis=0)
    # interior uses only local x (its cols are < rpp by construction)
    yi = jnp.sum(iv[0] * jnp.take(x, jnp.minimum(ic[0], rpp - 1), axis=0), axis=1)
    x_ext = jnp.concatenate([x, recv.reshape(-1)])
    yb = jnp.sum(bv[0] * jnp.take(x_ext, bc[0], axis=0), axis=1)
    y = jnp.zeros(rpp + 1, x.dtype)
    y = y.at[ir[0]].set(yi.astype(x.dtype))
    y = y.at[br[0]].set(yb.astype(x.dtype))
    return y[:rpp][None]


@annotate("dist.dist_spmv_halo")
def dist_spmv_halo(plan: HaloPlan, x_padded, mesh: Mesh, axis: str = "parts"):
    """y = A·x with import-list halo exchange (all_to_all over ICI) and
    interior/boundary overlap — the BASELINE config-5 SpMV."""
    f = jax.shard_map(
        partial(_halo_local_spmv, axis=axis, rpp=plan.rows_per_part, H=plan.halo),
        mesh=mesh,
        in_specs=(P(axis),) * 8,
        out_specs=P(axis),
    )
    y2 = f(plan.send_idx, plan.int_cols, plan.int_vals, plan.int_rows,
           plan.bnd_cols, plan.bnd_vals, plan.bnd_rows,
           x_padded.reshape(plan.n_parts, plan.rows_per_part))
    return y2.reshape(-1)


def _spmv_fn_for(plan):
    from .gt_spmv import DistGtPlan, DistGtPlan2, dist_spmv_gt

    if isinstance(plan, (DistGtPlan, DistGtPlan2)):
        return dist_spmv_gt
    return dist_spmv_halo if isinstance(plan, HaloPlan) else dist_spmv


@annotate("dist.dist_dot")
def dist_dot(x, y, mesh: Mesh, axis: str = "parts"):
    """<x,y> over row-sharded vectors (psum over the mesh axis)."""

    def local(a, b):
        return jax.lax.psum(jnp.sum(a * b), axis)

    f = jax.shard_map(local, mesh=mesh, in_specs=(P(axis), P(axis)),
                      out_specs=P())
    return f(x, y)


@annotate("dist.dist_cg_step")
def dist_cg_step(plan: RowPartition, state, mesh: Mesh, axis: str = "parts"):
    """One CG iteration on row-sharded vectors — the flagship multi-chip
    'training step' (SpMV + dots + axpys with ICI collectives)."""
    x, r, p, rz = state
    Ap = dist_spmv(plan, p, mesh, axis)
    pAp = dist_dot(p, Ap, mesh, axis)
    alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
    x = x + alpha * p
    r = r - alpha * Ap
    rz_new = dist_dot(r, r, mesh, axis)
    beta = rz_new / jnp.where(rz == 0, 1.0, rz)
    p = r + beta * p
    return (x, r, p, rz_new)


@annotate("dist.dist_pcg")
def dist_pcg(plan, b_padded, mesh: Mesh, tol: float = 1e-8,
             max_iters: int = 200, inv_diag=None, axis: str = "parts"):
    """Full distributed (Jacobi-)preconditioned CG solve on row-sharded
    vectors — SpMV, dots and the convergence test all run on-device with ICI
    collectives inside one jitted `lax.while_loop` (no host round-trips per
    iteration).  `plan` is a sharded RowPartition (all-gather schedule),
    HaloPlan (import-list all_to_all schedule) or DistGtPlan (Pallas
    gather-table local kernels — the fast path); `inv_diag` (row-sharded)
    enables Jacobi preconditioning.  Returns (x, iters, rel_res)."""
    spmv_fn = _spmv_fn_for(plan)

    def prec(r):
        return r if inv_diag is None else inv_diag * r

    @jax.jit
    def solve(b):
        bb = dist_dot(b, b, mesh, axis)
        tol2 = (tol * tol) * jnp.where(bb == 0, 1.0, bb)
        r0 = b  # x0 = 0
        z0 = prec(r0)
        rz0 = dist_dot(r0, z0, mesh, axis)

        def cond(s):
            _, _, _, _, rr, k = s
            return (k < max_iters) & (rr > tol2)

        def body(s):
            x, r, z, p, _, k = s
            Ap = spmv_fn(plan, p, mesh, axis)
            rz = dist_dot(r, z, mesh, axis)
            pAp = dist_dot(p, Ap, mesh, axis)
            alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
            x = x + alpha * p
            r = r - alpha * Ap
            z = prec(r)
            rz_new = dist_dot(r, z, mesh, axis)
            beta = rz_new / jnp.where(rz == 0, 1.0, rz)
            p = z + beta * p
            rr = dist_dot(r, r, mesh, axis)
            return (x, r, z, p, rr, k + 1)

        state = (jnp.zeros_like(b), r0, z0, z0,
                 dist_dot(r0, r0, mesh, axis), jnp.int32(0))
        x, r, _, _, rr, k = jax.lax.while_loop(cond, body, state)
        return x, k, jnp.sqrt(rr / jnp.where(bb == 0, 1.0, bb))

    return solve(b_padded)


@annotate("dist.dist_gmres")
def dist_gmres(plan, b_padded, mesh: Mesh, m: int = 30, tol: float = 1e-8,
               max_restarts: int = 10, inv_diag=None, axis: str = "parts"):
    """Distributed restarted GMRES(m) on row-sharded vectors.

    The Arnoldi cycle is the single-device one (sparse/gmres._arnoldi_cycle —
    pure jnp ops): the SpMV is the shard_map'd distributed schedule
    (all-gather RowPartition or halo-plan all_to_all), and GSPMD partitions
    the (m+1, N) Krylov basis over the mesh axis, inserting psums for the
    orthogonalization dots.  `inv_diag` (row-sharded) enables Jacobi
    preconditioning.  Returns (x_padded, iters, rel_res)."""
    import numpy as np

    from ..sparse.gmres import Ortho, _arnoldi_cycle

    spmv_fn = _spmv_fn_for(plan)

    class _Prec:
        def apply(self, r):
            return r if inv_diag is None else inv_diag * r

    Ah = lambda v: spmv_fn(plan, v, mesh, axis)
    prec = _Prec()
    spec = NamedSharding(mesh, P(axis))
    b = jax.device_put(jnp.asarray(b_padded), spec)
    m = min(m, int(b.shape[0]) - 1)
    cycle = jax.jit(lambda xx, bb: _arnoldi_cycle(Ah, prec, bb, xx, m, Ortho.CGS2))
    bnorm = float(np.sqrt(np.asarray(dist_dot(b, b, mesh, axis)))) or 1.0
    x = jnp.zeros_like(b)
    iters, rel = 0, float("inf")
    for _ in range(max_restarts):
        x, _ = cycle(x, b)
        iters += m
        r = b - Ah(x)
        rel = float(np.sqrt(np.asarray(dist_dot(r, r, mesh, axis)))) / bnorm
        if rel <= tol:
            break
    return x, iters, rel
