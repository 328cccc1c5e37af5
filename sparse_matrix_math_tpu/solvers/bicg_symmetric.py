"""BiCG specialisation for symmetric matrices.

TPU-native re-design of the reference ``BiCGSymmetric``
(include/sparse_matrix_math.h:2021-2102).  For SPD systems it produces
the same iterates as CG (reference README.md:27-28); it exists because —
unlike CG — it carries the reference's explicit breakdown heuristics for
indefinite matrices:

* serious breakdown: ``|Ap . p| < eps`` while ``||r||^2 > 1`` → DIVERGED
  (h:2047-2058; near a *lucky* breakdown the residual must be small, so
  a large residual with a vanishing denominator means indefiniteness).
* critical BiCG breakdown: ``||r'||^2 > 1`` after ``||r||^2 < eps`` →
  DIVERGED (h:2073-2081).

Like the reference, this is a do-while: at least one iteration always
runs (no initial-convergence short-circuit, h:2047).  Deviation (SURVEY
§7 known defects): the reference returns SUCCESS when stopped by the
iteration cap because its ``iterations > maxIterations`` check can never
fire (h:2098); we report MAX_ITERATIONS_REACHED correctly.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.spmv import as_operator, matvec_fn
from ..ops.vector import dot
from .types import harmonize_dtypes, RUNNING, SolveResult, SolverStatus, resolve_max_iterations
from ..formats.reorder import reorder_hoisted

__all__ = ["bicg_symmetric", "bicg_symmetric_core"]


@reorder_hoisted
def bicg_symmetric(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    max_iterations: int = -1,
    epsilon: float = 1e-8,
    *,
    record_residuals: bool = False,
) -> SolveResult:
    """Solve ``a @ x = b`` for symmetric ``a`` (x0 is the in/out initial
    guess in the reference; here it's a separate input)."""
    a = as_operator(a)
    n = b.shape[0]
    b, x0 = harmonize_dtypes(a, b, x0)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    maxiter = resolve_max_iterations(max_iterations, n)
    eps = jnp.asarray(epsilon, dtype=b.dtype)
    from . import _padded

    if _padded.eligible(a):
        res = _padded.padded_solve(
            "bicg_symmetric", a, b, x0, eps, maxiter, record_residuals
        )
        if res is not None:
            return res
    return _bicg_sym_loop(a, b, x0, eps, maxiter, record_residuals)


@partial(jax.jit, static_argnums=(4, 5))
def _bicg_sym_loop(a, b, x0, eps, maxiter: int, record: bool) -> SolveResult:
    return bicg_symmetric_core(matvec_fn(a), dot, b, x0, eps, maxiter, record)


def bicg_symmetric_core(
    matvec, dotfn, b, x0, eps, maxiter: int, record: bool
) -> SolveResult:
    """Algorithm core, parameterised over ``matvec``/``dotfn`` for reuse by
    the distributed layer (see solvers/cg.py:cg_core).

    Verified convergence: SUCCESS means the TRUE residual ``b - A x``
    passed eps (see cg_core for the full contract); a refuted recurrence
    claim restarts from the true residual, stalling twice in a row stops
    with MAX_ITERATIONS_REACHED at the precision floor."""
    dot = dotfn
    eps2 = eps * eps
    one = jnp.asarray(1.0, b.dtype)

    r = b - matvec(x0)
    rr = dot(r, r)
    trace = (
        jnp.full((maxiter + 1,), jnp.nan, b.dtype).at[0].set(jnp.sqrt(rr))
        if record
        else None
    )

    def cond(carry):
        _, _, _, rr, _, k, status, _ = carry
        # do-while semantics: the convergence test happens inside the body,
        # so the loop only continues while still RUNNING.
        return (status == RUNNING) & (k < maxiter)

    def body(carry):
        x, r, p, rr, floor_rr, k, status, trace = carry
        ap = matvec(p)
        denom = dot(ap, p)
        # serious breakdown heuristic (h:2056-2058); the reference exits
        # BEFORE applying the bogus alpha update, so mask all updates out.
        serious = (eps > jnp.abs(denom)) & (rr > one)
        alpha = jnp.where(serious, 0, rr / denom)
        x = x + alpha * p
        r = r - alpha * ap
        new_rr = jnp.where(serious, rr, dot(r, r))
        # critical BiCG breakdown heuristic (h:2079-2081); the reference
        # exits AFTER the x/r update here, so those stand.
        critical = (new_rr > one) & (rr < eps)
        rec_conv = (new_rr <= eps2) & ~serious & ~critical

        def verify(args):
            x, r, new_rr = args
            r_t = b - matvec(x)
            t_rr = dot(r_t, r_t)
            return r_t, t_rr, t_rr <= eps2

        def skip(args):
            _, r, new_rr = args
            return r, new_rr, jnp.bool_(False)

        r, new_rr, verified = jax.lax.cond(
            rec_conv, verify, skip, (x, r, new_rr)
        )
        refuted = rec_conv & ~verified
        stalled = refuted & (new_rr > floor_rr * 0.25)
        floor_rr = jnp.where(refuted, new_rr, floor_rr)

        diverged = serious | critical | ~jnp.isfinite(new_rr)
        status = jnp.where(
            diverged,
            SolverStatus.DIVERGED,
            jnp.where(
                verified,
                SolverStatus.SUCCESS,
                jnp.where(stalled, SolverStatus.MAX_ITERATIONS_REACHED, RUNNING),
            ),
        ).astype(jnp.int32)
        beta = new_rr / rr
        p = jnp.where(refuted, r, r + beta * p)
        if trace is not None:
            trace = trace.at[k + 1].set(jnp.sqrt(new_rr))
        return x, r, p, new_rr, floor_rr, k + 1, status, trace

    inf = jnp.asarray(jnp.inf, rr.dtype)
    carry = (x0, r, r, rr, inf, jnp.int32(0), jnp.int32(RUNNING), trace)
    x, r, _, rr, _, k, status, trace = jax.lax.while_loop(cond, body, carry)
    status = jnp.where(status == RUNNING, SolverStatus.MAX_ITERATIONS_REACHED, status)

    def _true_rr():
        r_t = b - matvec(x)
        return dot(r_t, r_t)

    rr = jax.lax.cond(status == SolverStatus.SUCCESS, lambda: rr, _true_rr)
    return SolveResult(
        x=x,
        status=status.astype(jnp.int32),
        iterations=k,
        residual_norm=jnp.sqrt(rr),
        residual_trace=trace,
    )
