"""Restarted GMRES — the general nonsymmetric workhorse, MXU-shaped.

TPU-native surplus (the reference's nonsymmetric solvers are
BiCGStab/CGS, include/sparse_matrix_math.h:2109-2303; it has no
minimal-residual method).  GMRES(m) is included because its inner
Arnoldi step is a natural MXU workload: with the Krylov panel V stored
as an (m+1, n) matrix, each orthogonalisation is two panel matmuls
(``V @ w`` then ``w - V.T @ h``, classical Gram-Schmidt twice — CGS2,
the communication-minimal variant that is also the TPU-friendly one),
not m sequential dot/axpy pairs.

Design points:

* fixed shapes under ``jit``: every restart cycle runs exactly ``m``
  Arnoldi steps as a ``fori_loop``; steps after in-cycle convergence
  freeze (H gets a unit diagonal, g a zero entry, so the final
  triangular solve yields y_j = 0 for them) — no dynamic shapes;
* Givens rotations applied on the fly keep a running residual estimate
  ``|g[j+1]|``, so the restart loop stops without forming residuals;
* RIGHT preconditioning (solve ``A M^{-1} u = b``, ``x = M^{-1} u``):
  the running estimate then tracks the TRUE residual norm, matching the
  library-wide ||b - A x|| <= eps convergence contract.  The
  preconditioner applies once per Arnoldi step and once per restart on
  the correction (V is stored unpreconditioned).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.spmv import as_operator, matvec_fn
from ..formats.reorder import reorder_hoisted
from .types import harmonize_dtypes, RUNNING, SolveResult, SolverStatus, resolve_max_iterations

__all__ = ["gmres", "gmres_core"]


@reorder_hoisted
def gmres(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    max_iterations: int = -1,
    epsilon: float = 1e-8,
    *,
    restart: int = 32,
    preconditioner=None,
    record_residuals: bool = False,
) -> SolveResult:
    """Solve ``a @ x = b`` (any invertible ``a``) by GMRES(restart).

    ``max_iterations`` counts ARNOLDI steps (matvecs), not cycles, so
    it is comparable with the other solvers' iteration counts; -1 means
    n as usual.  ``record_residuals`` records the per-step Givens
    residual estimates (free — GMRES tracks them anyway).
    """
    a = as_operator(a)
    n = b.shape[0]
    b, x0 = harmonize_dtypes(a, b, x0)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    m = int(restart)
    if m < 1:
        raise ValueError(f"restart must be >= 1, got {restart}")
    m = min(m, n)
    maxiter = resolve_max_iterations(max_iterations, n)
    eps = jnp.asarray(epsilon, dtype=b.dtype)
    return _gmres_loop(
        a, preconditioner, b, x0, eps, m, maxiter,
        bool(record_residuals),
    )


@partial(jax.jit, static_argnums=(5, 6, 7))
def _gmres_loop(
    a, precond, b, x0, eps, m: int, maxiter: int, record: bool
) -> SolveResult:
    matvec = matvec_fn(a)

    def mapply(v):
        return v if precond is None else precond.apply(v)

    return gmres_core(
        matvec, mapply, lambda u, v: jnp.vdot(u, v),
        lambda V, w: V @ w, b, x0, eps, m, maxiter, record,
    )


def gmres_core(
    matvec, precond_apply, dotfn, paneldot, b, x0, eps,
    m: int, maxiter: int, record: bool,
) -> SolveResult:
    """GMRES(m) algorithm core with injectable reductions.

    ``dotfn(u, v)`` is the (global) inner product and ``paneldot(V, w)``
    the (global) panel contraction ``V @ w`` — on a mesh both psum over
    the row axis while ``V.T @ h`` stays shard-local, which is the whole
    distribution story (parallel/dist.py wires this into dist_solve).
    """
    n = b.shape[0]
    dtype = b.dtype
    mapply = precond_apply

    def cycle(x, k0, trace):
        """One GMRES(m) restart cycle from iterate ``x``.

        Steps past ``maxiter - k0`` freeze exactly like post-convergence
        steps, so the iteration cap is honored mid-cycle (the library
        contract: caps are counted in matvecs and respected).

        Returns (x_new, residual_estimate, steps_taken, trace)."""
        cap = maxiter - k0
        r = b - matvec(x)
        beta = jnp.sqrt(dotfn(r, r))
        safe_beta = jnp.maximum(beta, jnp.asarray(1e-30, dtype))
        V = jnp.zeros((m + 1, n), dtype).at[0].set(r / safe_beta)
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros((m,), dtype)
        sn = jnp.zeros((m,), dtype)
        g = jnp.zeros((m + 1,), dtype).at[0].set(beta)
        rest = beta
        steps = jnp.int32(0)
        done = beta <= eps

        # BLOCKED Arnoldi: steps run in blocks of 8; within block bk the
        # CGS2 panel contractions use the STATIC slice V[:8*(bk+1)]
        # instead of the whole (m+1, n) panel under a mask.  The panel
        # matmuls dominate a GMRES step at scale (4 full-panel passes =
        # ~1 GB/step at n=2M/m=32, measured 2.6 ms/step) and rows > j
        # are zeros, so the masked form paid ~2x the average traffic for
        # nothing; the quantized slice stays exact.  The block outer
        # loop is the unroll granularity: ceil(m/8) compiled step bodies
        # (a fully per-j unroll compiled 30-45x slower than the round-3
        # masked fori_loop; this shape compiles ~4x, runs ~2x faster).
        def make_step(nrows: int):
            def step(j, carry):
                V, H, cs, sn, g, rest, steps, done, trace = carry
                frozen = done | (j >= cap)
                w = matvec(mapply(V[j]))
                Vj = jax.lax.slice(V, (0, 0), (nrows, n))
                h_low = paneldot(Vj, w)
                w = w - Vj.T @ h_low
                h2 = paneldot(Vj, w)
                w = w - Vj.T @ h2
                h_low = h_low + h2
                hj1 = jnp.sqrt(dotfn(w, w))
                V = V.at[j + 1].set(
                    jnp.where(
                        frozen, V[j + 1],
                        w / jnp.maximum(hj1, jnp.asarray(1e-30, dtype)),
                    )
                )

                # accumulated Givens rotations on the new column
                hcol = jnp.zeros((m + 1,), dtype).at[:nrows].set(h_low)
                hcol = hcol.at[j + 1].set(hj1)

                def rot(i, hc):
                    hi = cs[i] * hc[i] + sn[i] * hc[i + 1]
                    hi1 = -sn[i] * hc[i] + cs[i] * hc[i + 1]
                    return hc.at[i].set(hi).at[i + 1].set(hi1)

                hcol = jax.lax.fori_loop(0, j, rot, hcol)
                # new rotation zeroing hcol[j+1]
                denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
                safe = jnp.maximum(denom, jnp.asarray(1e-30, dtype))
                c, s = hcol[j] / safe, hcol[j + 1] / safe
                # `safe` also guards the R diagonal: an exact Krylov
                # breakdown (h_{j+1,j} = hcol_j = 0, the "lucky" case)
                # otherwise writes a zero pivot and NaNs the solve
                hcol = hcol.at[j].set(safe).at[j + 1].set(0.0)
                gj = c * g[j]
                gj1 = -s * g[j]

                # frozen steps write an identity column (and a zero g
                # entry) so the triangular solve returns y_j = 0 for them
                unit = jnp.zeros((m + 1,), dtype).at[j].set(1.0)
                H = H.at[:, j].set(jnp.where(frozen, unit, hcol))
                cs = cs.at[j].set(jnp.where(frozen, 1.0, c))
                sn = sn.at[j].set(jnp.where(frozen, 0.0, s))
                g = jnp.where(
                    frozen,
                    g.at[j].set(0.0),
                    g.at[j].set(gj).at[j + 1].set(gj1),
                )
                rest = jnp.where(frozen, rest, jnp.abs(gj1))
                steps = jnp.where(frozen, steps, (j + 1).astype(jnp.int32))
                if trace is not None:
                    trace = jnp.where(
                        frozen, trace,
                        trace.at[k0 + j + 1].set(jnp.abs(gj1)),
                    )
                done = done | (rest <= eps)
                return V, H, cs, sn, g, rest, steps, done, trace

            return step

        carry = (V, H, cs, sn, g, rest, steps, done, trace)
        for bk in range(-(-m // 8)):
            lo, hi = 8 * bk, min(8 * (bk + 1), m)
            carry = jax.lax.fori_loop(
                lo, hi, make_step(min(hi, m + 1)), carry
            )
        V, H, cs, sn, g, rest, steps, done, trace = carry
        # y = R^{-1} g over the rotated (upper-triangular) H
        y = jax.scipy.linalg.solve_triangular(H[:m, :], g[:m], lower=False)
        x = x + mapply(V[:m].T @ y)
        return x, rest, steps, trace

    def cond(carry):
        _, res, k, status, _ = carry
        return (status == RUNNING) & (k < maxiter)

    def body(carry):
        x, _, k, status, trace = carry
        x, res, steps, trace = cycle(x, k, trace)
        k = k + steps
        diverged = ~jnp.isfinite(res)
        status = jnp.where(
            diverged,
            SolverStatus.DIVERGED,
            jnp.where(res <= eps, SolverStatus.SUCCESS, RUNNING),
        ).astype(jnp.int32)
        return x, res, k, status, trace

    r0 = b - matvec(x0)
    res0 = jnp.sqrt(dotfn(r0, r0))
    status0 = jnp.where(res0 <= eps, SolverStatus.SUCCESS, RUNNING).astype(
        jnp.int32
    )
    trace0 = (
        jnp.full((maxiter + 1,), jnp.nan, dtype).at[0].set(res0)
        if record else None
    )
    carry = (x0, res0, jnp.int32(0), status0, trace0)
    x, res, k, status, trace = jax.lax.while_loop(cond, body, carry)
    status = jnp.where(
        status == RUNNING, SolverStatus.MAX_ITERATIONS_REACHED, status
    ).astype(jnp.int32)
    return SolveResult(
        x=x,
        status=status,
        iterations=k,
        residual_norm=res,
        residual_trace=trace,
    )
