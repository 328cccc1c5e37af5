"""BiCGStab — transpose-free stabilised BiCG, optionally preconditioned.

TPU-native re-design of the reference ``BiCGStab``
(include/sparse_matrix_math.h:2191-2283 + unpreconditioned overload
h:2294-2303).  Behavioral parity:

* unpreconditioned iteration: 2 SpMVs, ``alpha = (r.r0)/(Ap.r0)``,
  ``s = r - alpha Ap``, ``omega = (As.s)/(As.As)``, fused x/r updates
  with ||r|| accumulation (h:2262-2268),
  ``beta = (r'.r0) alpha / ((r.r0) omega)``,
  ``p = r + beta (p - omega Ap)`` (h:2271-2274).
* convergence on ``||r|| <= eps`` — the L2 norm itself, NOT squared
  (h:2277), unlike CG.  Do-while: at least one iteration runs.
* preconditioning (reference style, h:2217-2257): the *residuals* are
  preconditioned — ``r <- M^{-1}(b - A x)`` at start, and each SpMV
  result is preconditioned (``ap = M^{-1} A p``, ``as = M^{-1} A s``).
  Convergence is measured on the preconditioned residual, matching the
  reference exactly.  The reference selects this at compile time via
  ``if constexpr`` against the identity-preconditioner type (h:2209);
  here the Python-level None check plays that role (still zero cost
  inside the compiled loop).

Improvements (SURVEY §7): division-by-zero breakdowns the reference
leaves as TODOs (h:2260, 2270) are detected → DIVERGED; the
iteration-cap exit reports MAX_ITERATIONS_REACHED (reference bug h:2279).
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

__all__ = ["bicgstab", "bicgstab_core"]


@reorder_hoisted
def bicgstab(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    max_iterations: int = -1,
    epsilon: float = 1e-8,
    *,
    preconditioner=None,
    record_residuals: bool = False,
) -> SolveResult:
    """Solve ``a @ x = b`` (a may be non-symmetric / indefinite)."""
    a = as_operator(a)
    n = b.shape[0]
    if x0 is None:
        x0 = jnp.zeros_like(b)
    maxiter = resolve_max_iterations(max_iterations, n)
    eps = jnp.asarray(epsilon, dtype=b.dtype)
    from . import _padded

    if _padded.eligible(a, preconditioner):
        res = _padded.padded_solve(
            "bicgstab", a, b, x0, eps, maxiter, record_residuals,
            preconditioner=preconditioner,
        )
        if res is not None:
            return res
    if preconditioner is None:
        return _bicgstab_loop(a, b, x0, eps, maxiter, record_residuals)
    return _bicgstab_precond_loop(
        a, preconditioner, b, x0, eps, maxiter, record_residuals
    )


@partial(jax.jit, static_argnums=(4, 5))
def _bicgstab_loop(a, b, x0, eps, maxiter: int, record: bool) -> SolveResult:
    matvec = matvec_fn(a)
    return bicgstab_core(matvec, lambda v: v, dot, b, x0, eps, maxiter, record)


@partial(jax.jit, static_argnums=(5, 6))
def _bicgstab_precond_loop(a, m, b, x0, eps, maxiter: int, record: bool):
    matvec = matvec_fn(a)
    return bicgstab_core(matvec, m.apply, dot, b, x0, eps, maxiter, record)


# Divergence cutoff: residual above this multiple of the best seen is an
# explosion, not a BiCGStab transient.  Measured on the n=2M/SGS(4) f32
# system: legitimate mid-run spikes reach 2.3e4x the running best and
# recover (the global minimum comes 450 iterations after one); the
# terminal blow-up passes 1e6x ~80 iterations past the minimum and never
# recovers (docs/BENCH_NOTES.md round 3).
_EXPLOSION_FACTOR = 1e6


def bicgstab_core(matvec, precond, dotfn, b, x0, eps, maxiter: int, record: bool):
    """Algorithm core, parameterised over ``matvec``/``precond``/``dotfn``
    for reuse by the distributed layer (see solvers/cg.py:cg_core).

    Verified convergence (same contract as cg_core): SUCCESS means the
    TRUE residual ``M^{-1}(b - A x)`` — the quantity the reference's
    convergence test measures (h:2277) — passed eps, not merely the
    recurrence value.  When the recurrence claims convergence the loop
    recomputes the true residual (one extra SpMV+apply, only at claimed
    convergence); a refuted claim performs a full BiCGStab restart from
    the current x (r = r0 = p = true residual).  If a restart fails to
    shrink the true residual 2x the solve stops honestly with
    MAX_ITERATIONS_REACHED, reporting the floor.

    Best-iterate return: f32 BiCGStab can pass its precision floor and
    then EXPLODE (measured at n=2M/SGS(4): minimum 3.9e-4 at iteration
    832, +inf by 1653 — the reference's unguarded recursion does the
    same, its breakdown checks are TODOs h:2260/2270).  The loop tracks
    the best recurrence iterate, cuts off when the residual exceeds
    ``_EXPLOSION_FACTOR`` x the best (DIVERGED), and on any non-SUCCESS
    exit returns the BEST x with its verified true residual — a usable
    floor instead of the exploded tail."""
    dot = dotfn
    tiny = jnp.asarray(jnp.finfo(b.dtype).tiny, b.dtype)

    # r <- M^{-1}(b - A x0) (h:2215-2227); identity precond when plain.
    r = precond(b - matvec(x0))
    r0 = r
    rr0 = dot(r, r0)
    res_norm = jnp.sqrt(dot(r, r))
    trace = (
        jnp.full((maxiter + 1,), jnp.nan, b.dtype).at[0].set(res_norm)
        if record
        else None
    )

    def cond(carry):
        _, _, _, _, _, _, _, _, _, k, status, _ = carry
        return (status == RUNNING) & (k < maxiter)

    def body(carry):
        (x, r, r0, p, rr0, res_norm, floor, best_x, best_norm, k, status,
         trace) = carry
        ap = precond(matvec(p))
        denom = dot(ap, r0)
        bd1 = jnp.abs(denom) < tiny
        alpha = jnp.where(bd1, 0, rr0 / denom)
        s = r - alpha * ap
        as_ = precond(matvec(s))
        asas = dot(as_, as_)
        bd2 = jnp.abs(asas) < tiny
        omega = jnp.where(bd2, 0, dot(as_, s) / asas)
        x = x + alpha * p + omega * s
        r = s - omega * as_
        new_res_norm = jnp.sqrt(dot(r, r))
        rec_conv = new_res_norm <= eps

        def verify(args):
            x, r, new_res_norm = args
            r_t = precond(b - matvec(x))
            t_norm = jnp.sqrt(dot(r_t, r_t))
            return r_t, t_norm, t_norm <= eps

        def skip(args):
            _, r, new_res_norm = args
            return r, new_res_norm, jnp.bool_(False)

        r, new_res_norm, verified = jax.lax.cond(
            rec_conv, verify, skip, (x, r, new_res_norm)
        )
        refuted = rec_conv & ~verified
        stalled = refuted & (new_res_norm > floor * 0.5)
        floor = jnp.where(refuted, new_res_norm, floor)

        # Best-iterate tracking by TRUE residual (see docstring): the
        # recurrence minimum drifts from the truth (measured: recurrence
        # 3.9e-4 at an x whose true residual is 0.39), so best-by-
        # recurrence returns a useless iterate.  Sample the true residual
        # every 64 iterations (~1.5% extra SpMV) and reuse the verify
        # branch's value when it just ran (new_res_norm IS true there).
        def _true_now(x):
            r_t = precond(b - matvec(x))
            return jnp.sqrt(dot(r_t, r_t))

        # sample on the cap's final iteration too, so short MAX_ITER
        # runs return their latest progress rather than a stale best
        need = (((k % 64) == 63) | (k + 1 >= maxiter)) & ~rec_conv
        true_now = jax.lax.cond(
            need, _true_now, lambda _: jnp.asarray(jnp.inf, b.dtype), x
        )
        true_now = jnp.where(refuted, new_res_norm, true_now)
        better = true_now < best_norm
        best_x = jnp.where(better, x, best_x)
        best_norm = jnp.where(better, true_now, best_norm)
        # explosion cutoff: recurrence far past the best true residual
        exploded = new_res_norm > best_norm * jnp.asarray(
            _EXPLOSION_FACTOR, b.dtype
        )

        new_rr0 = dot(r, r0)
        bd3 = (jnp.abs(rr0) < tiny) | (jnp.abs(omega) < tiny)
        beta = jnp.where(bd3, 0, (new_rr0 * alpha) / (rr0 * omega))
        # full restart on refutation: shadow vector and direction reset
        # to the true residual (breakdown flags don't apply to the
        # restarted recursion)
        r0 = jnp.where(refuted, r, r0)
        new_rr0 = jnp.where(refuted, dot(r, r), new_rr0)
        p = jnp.where(refuted, r, r + beta * (p - omega * ap))
        diverged = (
            ((bd1 | bd2 | bd3) & ~refuted)
            | ~jnp.isfinite(new_res_norm)
            | exploded
        ) & ~verified
        status = jnp.where(
            diverged,
            SolverStatus.DIVERGED,
            jnp.where(
                verified,
                SolverStatus.SUCCESS,
                jnp.where(stalled, SolverStatus.MAX_ITERATIONS_REACHED, RUNNING),
            ),
        ).astype(jnp.int32)
        if trace is not None:
            trace = trace.at[k + 1].set(new_res_norm)
        return (
            x, r, r0, p, new_rr0, new_res_norm, floor, best_x, best_norm,
            k + 1, status, trace,
        )

    inf = jnp.asarray(jnp.inf, res_norm.dtype)
    carry = (
        x0, r, r0, r, rr0, res_norm, inf, x0, res_norm, jnp.int32(0),
        jnp.int32(RUNNING), trace,
    )
    (x, _, _, _, _, res_norm, _, best_x, _, k, status, trace) = (
        jax.lax.while_loop(cond, body, carry)
    )
    status = jnp.where(status == RUNNING, SolverStatus.MAX_ITERATIONS_REACHED, status)

    # non-SUCCESS exits return the BEST iterate with its verified true
    # residual (the exploded tail's x is useless)
    success = status == SolverStatus.SUCCESS
    x = jnp.where(success, x, best_x)

    def _true_norm():
        r_t = precond(b - matvec(x))
        return jnp.sqrt(dot(r_t, r_t))

    res_norm = jax.lax.cond(success, lambda: res_norm, _true_norm)
    return SolveResult(
        x=x,
        status=status.astype(jnp.int32),
        iterations=k,
        residual_norm=res_norm,
        residual_trace=trace,
    )
