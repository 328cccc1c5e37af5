"""Conjugate Gradient Squared — transpose-free BiCG with squared residual
polynomial.

TPU-native implementation of the algorithm the reference *intends* in
``ConjugateGradientSquared`` (include/sparse_matrix_math.h:2109-2178).
The reference version does not compile when instantiated — its
``residualSquared`` is declared inside the do-block but referenced in the
while condition (h:2171-2172) — and is never exercised by any test
(test/cpp/cgsquared.cpp:21 calls ConjugateGradient instead).  Per SURVEY
§7 we reproduce the intent, not the bug: a working CGS with the
convergence check on ``||r||^2``.

Recursion (Saad, "Iterative Methods for Sparse Linear Systems" §7.4.1,
matching the reference's u/p/q/r recursion, h:2120-2126, 2131-2168):

    alpha = (r . r0) / (A p . r0)
    q     = u - alpha A p
    x    += alpha (u + q)
    r    -= alpha A (u + q)
    beta  = (r' . r0) / (r . r0)
    u     = r + beta q
    p     = u + beta (q + beta p)

Like the reference, a do-while: at least one iteration runs.  Improvements:
breakdown on vanishing (A p . r0) or (r . r0) and non-finite residuals →
DIVERGED (the reference leaves these as TODO comments, h:2134, 2153);
iteration-cap exit reports MAX_ITERATIONS_REACHED (reference bug h:2174).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.spmv import as_operator, matvec_fn
from ..ops.vector import dot
from .types import RUNNING, SolveResult, SolverStatus, resolve_max_iterations
from ..formats.reorder import reorder_hoisted

__all__ = ["conjugate_gradient_squared", "cgs", "cgs_core"]


@reorder_hoisted
def conjugate_gradient_squared(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    max_iterations: int = -1,
    epsilon: float = 1e-8,
    *,
    record_residuals: bool = False,
) -> SolveResult:
    """Solve ``a @ x = b`` (a need not be symmetric)."""
    a = as_operator(a)
    n = b.shape[0]
    if x0 is None:
        x0 = jnp.zeros_like(b)
    maxiter = resolve_max_iterations(max_iterations, n)
    eps = jnp.asarray(epsilon, dtype=b.dtype)
    from . import _padded

    if _padded.eligible(a):
        res = _padded.padded_solve(
            "cgs", a, b, x0, eps, maxiter, record_residuals
        )
        if res is not None:
            return res
    return _cgs_loop(a, b, x0, eps, maxiter, record_residuals)


cgs = conjugate_gradient_squared


@partial(jax.jit, static_argnums=(4, 5))
def _cgs_loop(a, b, x0, eps, maxiter: int, record: bool) -> SolveResult:
    return cgs_core(matvec_fn(a), dot, b, x0, eps, maxiter, record)


def cgs_core(matvec, dotfn, b, x0, eps, maxiter: int, record: bool) -> SolveResult:
    """Algorithm core, parameterised over ``matvec``/``dotfn`` for reuse by
    the distributed layer (see solvers/cg.py:cg_core)."""
    dot = dotfn
    eps2 = eps * eps
    tiny = jnp.asarray(jnp.finfo(b.dtype).tiny, b.dtype)

    r = b - matvec(x0)
    r0 = r
    rr0 = dot(r, r0)
    rr = dot(r, r)
    trace = (
        jnp.full((maxiter + 1,), jnp.nan, b.dtype).at[0].set(jnp.sqrt(rr))
        if record
        else None
    )

    def cond(carry):
        _, _, _, _, _, _, k, status, _ = carry
        return (status == RUNNING) & (k < maxiter)

    def body(carry):
        x, r, p, u, q, rr0, k, status, trace = carry
        ap = matvec(p)
        denom = dot(ap, r0)
        breakdown = jnp.abs(denom) < tiny
        alpha = jnp.where(breakdown, 0, rr0 / denom)
        q = u - alpha * ap
        uq = u + q
        x = x + alpha * uq
        r = r - alpha * matvec(uq)
        new_rr0 = dot(r, r0)
        rr = dot(r, r)
        breakdown |= (jnp.abs(rr0) < tiny) | ~jnp.isfinite(rr)
        converged = rr <= eps2
        status = jnp.where(
            breakdown & ~converged,
            SolverStatus.DIVERGED,
            jnp.where(converged, SolverStatus.SUCCESS, RUNNING),
        ).astype(jnp.int32)
        beta = jnp.where(jnp.abs(rr0) < tiny, 0, new_rr0 / rr0)
        u = r + beta * q
        p = u + beta * (q + beta * p)
        if trace is not None:
            trace = trace.at[k + 1].set(jnp.sqrt(rr))
        return x, r, p, u, q, new_rr0, k + 1, status, trace

    carry = (
        x0,
        r,
        r,
        r,
        jnp.zeros_like(r),
        rr0,
        jnp.int32(0),
        jnp.int32(RUNNING),
        trace,
    )
    x, r, _, _, _, _, k, status, trace = jax.lax.while_loop(cond, body, carry)
    status = jnp.where(status == RUNNING, SolverStatus.MAX_ITERATIONS_REACHED, status)
    rr = dot(r, r)
    return SolveResult(
        x=x,
        status=status.astype(jnp.int32),
        iterations=k,
        residual_norm=jnp.sqrt(rr),
        residual_trace=trace,
    )
