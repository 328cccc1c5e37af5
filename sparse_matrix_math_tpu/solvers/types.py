"""Solver status and result types.

The reference returns a bare 3-value ``SolverStatus`` enum
(include/sparse_matrix_math.h:2010-2014) and exposes nothing else — no
iteration count, no residual.  Here the same enum exists (with matching
values for parity) and every solver returns a :class:`SolveResult`
carrying solution, status, iteration count, final residual norm, and an
optional residual trace (SURVEY §5 observability plan).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["SolverStatus", "SolveResult", "RUNNING"]


class SolverStatus(enum.IntEnum):
    """Matches the reference enum values (sparse_matrix_math.h:2010-2014)."""

    SUCCESS = 0
    DIVERGED = 1
    MAX_ITERATIONS_REACHED = 2


# Internal in-flight sentinel used inside while_loop carries (never returned).
RUNNING = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolveResult:
    """Result of an iterative solve.

    ``status`` and ``iterations`` are device scalars so the whole solve can
    stay inside ``jax.jit``; use :meth:`status_enum` for a host-side enum.
    """

    x: jnp.ndarray
    status: jnp.ndarray          # int32 scalar: SolverStatus value
    iterations: jnp.ndarray      # int32 scalar
    residual_norm: jnp.ndarray   # final ||r||_2 (same dtype as x)
    residual_trace: Optional[jnp.ndarray] = None  # (max_iter+1,) or None
    # True when a MAX_ITERATIONS_REACHED exit was actually a PRECISION
    # FLOOR: a verified-convergence restart failed to shrink the true
    # residual (cg_core/bicgstab_core stall guards), so more iterations
    # cannot help — escalate precision (cg_ir_df64) instead of raising
    # the cap.  None for solvers that don't measure it; the 3-value
    # ``status`` stays reference parity (sparse_matrix_math.h:2010-2014).
    floor_hit: Optional[jnp.ndarray] = None  # bool scalar

    def status_enum(self) -> SolverStatus:
        return SolverStatus(int(self.status))

    @property
    def hit_precision_floor(self) -> bool:
        """Host-side convenience: did the solve stop at its precision
        floor (as opposed to a genuine iteration cap)?"""
        return self.floor_hit is not None and bool(self.floor_hit)

    @property
    def success(self) -> bool:
        return int(self.status) == SolverStatus.SUCCESS

    def __repr__(self) -> str:  # concrete-friendly
        try:
            return (
                f"SolveResult(status={self.status_enum().name}, "
                f"iterations={int(self.iterations)}, "
                f"residual_norm={float(self.residual_norm):.3e})"
            )
        except Exception:
            return (
                f"SolveResult(status={self.status!r}, iterations={self.iterations!r},"
                f" residual_norm={self.residual_norm!r})"
            )


def harmonize_dtypes(a, b, x0):
    """Promote ``b``/``x0`` to the solve dtype when the operator's value
    dtype differs (e.g. an f64-loaded matrix with an f32 rhs).  The
    reference is templated on ONE scalar type throughout (h:2316
    ``ConjugateGradient<T>``); mixed inputs would otherwise promote
    mid-recurrence and break the while_loop carry typing."""
    dt = getattr(a, "dtype", None)
    if (
        dt is not None
        and jnp.issubdtype(dt, jnp.floating)
        and b.dtype != dt
    ):
        out = jnp.promote_types(dt, b.dtype)
        b = b.astype(out)
        if x0 is not None:
            x0 = x0.astype(out)
    return b, x0


def resolve_max_iterations(max_iterations, n: int) -> int:
    """-1 (or None) means "as many iterations as rows", matching the
    reference convention (sparse_matrix_math.h:2031-2033, 2345-2347).

    Deliberate deviation (SURVEY §7 "known defects"): the reference also
    *silently clamps* user-supplied caps to n (h:2030); we honor the
    user's cap as given.
    """
    if max_iterations is None or max_iterations == -1:
        return int(n)
    if max_iterations < 0:
        raise ValueError(f"max_iterations must be -1 or >= 0, got {max_iterations}")
    return int(max_iterations)
