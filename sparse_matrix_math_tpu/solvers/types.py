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

    def status_enum(self) -> SolverStatus:
        return SolverStatus(int(self.status))

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
