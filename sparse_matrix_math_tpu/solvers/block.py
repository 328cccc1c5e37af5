"""Multi-RHS (blocked) solves — one SpMM feeds every right-hand side.

The reference solves one RHS per call (``SolverStatus f(A, b, x, ...)``,
include/sparse_matrix_math.h:2316-2320); solving k systems costs k full
Krylov runs.  On TPU the SpMV generalises to SpMM for free (ops/spmv.py
broadcasts over trailing columns), and the MXU makes the extra columns
nearly free until the arithmetic-intensity knee — so the TPU-native
multi-RHS design runs ALL right-hand sides through one iteration loop:

* one SpMM ``A @ P`` per iteration instead of m SpMVs,
* per-column dots / axpys as axis-0 reductions on (n, m) panels,
* per-column convergence masking: columns that converged (or broke down)
  freeze exactly — their x/r/p stop updating — while the rest continue;
  the loop exits when every column has left the RUNNING state.

This is the "batched CG" formulation (independent recurrences, shared
kernels), chosen over classical block-CG (O'Leary) deliberately: block-CG
shares one Krylov space but needs rank-revealing re-orthogonalisation
when columns become linearly dependent — a poor fit for a fixed-shape
``lax.while_loop``.  Batched CG has no breakdown coupling: each column
behaves exactly like its own :func:`solvers.cg.cg` run.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.spmv import as_operator, matvec_fn
from .types import RUNNING, SolveResult, SolverStatus, resolve_max_iterations
from ..formats.reorder import reorder_hoisted

__all__ = ["cg_multi", "MultiSolveResult"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MultiSolveResult:
    """Per-column solve outcome for a multi-RHS run.

    ``x`` is (n, m); ``status``/``iterations``/``residual_norm`` are (m,)
    — one entry per right-hand side, same semantics as SolveResult.
    """

    x: jnp.ndarray
    status: jnp.ndarray          # (m,) int32 SolverStatus values
    iterations: jnp.ndarray      # (m,) int32: iteration count at freeze
    residual_norm: jnp.ndarray   # (m,)
    # (maxiter+1, m) per-column ||r|| history (nan beyond a column's
    # freeze point), or None when record_residuals was off
    residual_trace: Optional[jnp.ndarray] = None

    def __getitem__(self, j: int) -> SolveResult:
        """The j-th column's outcome as a plain SolveResult."""
        return SolveResult(
            x=self.x[:, j],
            status=self.status[j],
            iterations=self.iterations[j],
            residual_norm=self.residual_norm[j],
            residual_trace=(
                None if self.residual_trace is None
                else self.residual_trace[:, j]
            ),
        )


@reorder_hoisted
def cg_multi(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    max_iterations: int = -1,
    epsilon: float = 1e-8,
    preconditioner=None,
    record_residuals: bool = False,
) -> MultiSolveResult:
    """Solve ``a @ X = B`` for SPD ``a`` and B of shape (n, m).

    Equivalent to m independent :func:`cg` runs (same iterates per
    column), at roughly the cost of the SLOWEST column — every iteration
    is one SpMM + per-column reductions instead of m separate loops.

    ``preconditioner`` is any object with a panel-capable ``apply``
    (all of :mod:`precond.preconditioners` qualify: Jacobi/SGS/ILU0/IC0
    applies broadcast over trailing RHS columns — the triangular solves
    run take/segment_sum over axis 0, so one apply serves all m columns
    just like the SpMM serves all m matvecs).  With it, each column runs
    the :func:`solvers.cg.pcg_core` recurrence (z = M r, rz inner
    products) under the same freeze-on-convergence masking.
    """
    a = as_operator(a)
    if b.ndim != 2:
        raise ValueError(f"cg_multi expects B of shape (n, m), got {b.shape}")
    n = b.shape[0]
    if x0 is None:
        x0 = jnp.zeros_like(b)
    maxiter = resolve_max_iterations(max_iterations, n)
    eps = jnp.asarray(epsilon, dtype=b.dtype)
    return _cg_multi_loop(
        a, preconditioner, b, x0, eps, maxiter, bool(record_residuals)
    )


@partial(jax.jit, static_argnums=(5, 6))
def _cg_multi_loop(
    a, precond, b, x0, eps, maxiter: int, record: bool
) -> MultiSolveResult:
    matvec = matvec_fn(a)
    eps2 = eps * eps
    m = b.shape[1]

    def coldot(u, v):
        return jnp.sum(u * v, axis=0)  # (m,)

    def mapply(r):
        return r if precond is None else precond.apply(r)

    r = b - matvec(x0)
    z = mapply(r)
    rr = coldot(r, r)
    rz = coldot(r, z) if precond is not None else rr
    status0 = jnp.where(rr <= eps2, SolverStatus.SUCCESS, RUNNING).astype(
        jnp.int32
    )
    iters0 = jnp.zeros((m,), jnp.int32)
    trace0 = (
        jnp.full((maxiter + 1, m), jnp.nan, b.dtype).at[0].set(jnp.sqrt(rr))
        if record else None
    )

    def cond(carry):
        _, _, _, _, _, k, status, _, _ = carry
        return jnp.any(status == RUNNING) & (k < maxiter)

    def body(carry):
        x, r, p, rz, floor_rr, k, status, iters, trace = carry
        active = status == RUNNING
        ap = matvec(p)
        denom = coldot(ap, p)
        alpha = jnp.where(active, rz / denom, 0.0)
        alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
        x = x + alpha[None, :] * p
        r_new = r - alpha[None, :] * ap
        new_rr = coldot(r_new, r_new)
        converged = new_rr <= eps2
        newly = active & converged  # recurrence claims, pre-verification

        # verified convergence (same contract as cg_core): when any
        # column newly claims convergence, recompute the TRUE residual
        # panel once and replace the claiming columns' r/rr with it —
        # confirmed columns exit with the true residual, refuted ones
        # restart from it
        def verify(args):
            x, r_new, new_rr = args
            r_t = b - matvec(x)
            t_rr = coldot(r_t, r_t)
            r2 = jnp.where(newly[None, :], r_t, r_new)
            rr2 = jnp.where(newly, t_rr, new_rr)
            return r2, rr2

        r_new, new_rr = jax.lax.cond(
            jnp.any(newly), verify, lambda a: (a[1], a[2]), (x, r_new, new_rr)
        )
        verified = newly & (new_rr <= eps2)
        refuted = newly & ~verified
        stalled = refuted & (new_rr > floor_rr * 0.25)
        floor_rr = jnp.where(refuted, new_rr, floor_rr)

        z_new = mapply(r_new)
        new_rz = (
            coldot(r_new, z_new) if precond is not None else new_rr
        )
        # exact breakdown (denom == 0, i.e. p.A.p = 0 on an indefinite
        # system) and non-finite reductions both mean this column cannot
        # make progress: DIVERGED, matching the single-RHS cg's guard.
        diverged = (
            ~jnp.isfinite(new_rr)
            | (active & ~jnp.isfinite(denom))
            | (active & (denom == 0) & ~converged)
        )
        new_status = jnp.where(
            active,
            jnp.where(
                diverged,
                SolverStatus.DIVERGED,
                jnp.where(
                    verified,
                    SolverStatus.SUCCESS,
                    jnp.where(
                        stalled, SolverStatus.MAX_ITERATIONS_REACHED, RUNNING
                    ),
                ),
            ),
            status,
        ).astype(jnp.int32)
        iters = jnp.where(active, k + 1, iters)
        beta = jnp.where(active, new_rz / jnp.where(rz == 0, 1.0, rz), 0.0)
        p_next = jnp.where(
            refuted[None, :], z_new, z_new + beta[None, :] * p
        )
        p = jnp.where(active[None, :], p_next, p)
        r = jnp.where(active[None, :], r_new, r)
        new_rz2 = jnp.where(active, new_rz, rz)
        if trace is not None:
            trace = trace.at[k + 1].set(
                jnp.where(active, jnp.sqrt(new_rr), jnp.nan)
            )
        return x, r, p, new_rz2, floor_rr, k + 1, new_status, iters, trace

    inf0 = jnp.full((m,), jnp.inf, rr.dtype)
    carry = (x0, r, z, rz, inf0, jnp.int32(0), status0, iters0, trace0)
    x, r, _, _, _, _, status, iters, trace = jax.lax.while_loop(
        cond, body, carry
    )
    status = jnp.where(
        status == RUNNING, SolverStatus.MAX_ITERATIONS_REACHED, status
    ).astype(jnp.int32)
    # report ||b - A x|| per column: SUCCESS/stalled columns froze with
    # the true residual in r; cap-exit columns need one extra SpMM
    rr = coldot(r, r)

    def _fix(rr):
        r_t = b - matvec(x)
        t_rr = coldot(r_t, r_t)
        return jnp.where(status == SolverStatus.SUCCESS, rr, t_rr)

    rr = jax.lax.cond(
        jnp.all(status == SolverStatus.SUCCESS), lambda rr: rr, _fix, rr
    )
    return MultiSolveResult(
        x=x,
        status=status,
        iterations=iters,
        residual_norm=jnp.sqrt(rr),
        residual_trace=trace,
    )
