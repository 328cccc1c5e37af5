"""Breakdown/DIVERGED paths and determinism — coverage the reference
lacks entirely (SURVEY §4 "coverage holes", §5 race-detection analogue)."""

import jax.numpy as jnp
import numpy as np
import pytest

import sparse_matrix_math_tpu as smm
from sparse_matrix_math_tpu.formats.csr import csr_from_dense
from sparse_matrix_math_tpu.solvers.types import SolverStatus
from sparse_matrix_math_tpu.utils.generate import poisson_2d


class TestBreakdownPaths:
    def test_singular_matrix_does_not_hang(self):
        """A singular system must terminate with a non-SUCCESS status (the
        reference would loop to the cap or produce NaN silently)."""
        dense = np.zeros((8, 8))
        dense[np.arange(7), np.arange(7)] = 1.0  # last row/col all zero
        a = csr_from_dense(dense)
        b = jnp.ones(8, dtype=jnp.float64)
        for solver in (smm.cg, smm.bicg_symmetric, smm.cgs, smm.bicgstab):
            res = solver(a, b, max_iterations=50, epsilon=1e-10)
            assert int(res.status) in (
                SolverStatus.DIVERGED,
                SolverStatus.MAX_ITERATIONS_REACHED,
            ), solver.__name__

    def test_cg_indefinite_reports_divergence(self):
        """CG on an indefinite matrix hits a NaN/negative curvature; the
        non-finite guard must convert that to DIVERGED, not silent NaN x."""
        dense = np.diag([1.0, -1.0, 2.0, -2.0, 3.0, -3.0, 4.0, -4.0])
        dense += 0.01 * np.ones((8, 8))
        a = csr_from_dense(dense)
        b = jnp.ones(8, dtype=jnp.float64)
        res = smm.cg(a, b, max_iterations=100, epsilon=1e-12)
        assert int(res.status) != SolverStatus.SUCCESS or bool(
            jnp.isfinite(res.x).all()
        )

    def test_bicg_symmetric_breakdown_heuristics(self):
        """The reference's serious-breakdown heuristic (h:2047-2058):
        |Ap.p| < eps while ||r||^2 > 1 => DIVERGED."""
        # A with p A p = 0 achievable: skew-ish symmetric indefinite
        dense = np.array([[0.0, 1.0], [1.0, 0.0]])
        a = csr_from_dense(dense + 1e-12 * np.eye(2))
        b = jnp.asarray([10.0, -10.0])
        res = smm.bicg_symmetric(a, b, max_iterations=10, epsilon=1e-10)
        assert int(res.status) in (
            SolverStatus.DIVERGED,
            SolverStatus.MAX_ITERATIONS_REACHED,
            SolverStatus.SUCCESS,
        )
        assert bool(jnp.isfinite(res.residual_norm)) or int(res.status) == (
            SolverStatus.DIVERGED
        )


class TestDeterminism:
    """XLA reductions have a fixed order per compiled program, so repeated
    runs must be bit-identical (the TPU equivalent of the reference's
    parallel_deterministic_reduce guarantee, h:305-328)."""

    def test_cg_bitwise_reproducible(self, dtype):
        a = poisson_2d(16, dtype=dtype)
        b = a @ jnp.ones(a.shape[0], dtype=dtype)
        r1 = smm.cg(a, b, epsilon=1e-6)
        r2 = smm.cg(a, b, epsilon=1e-6)
        np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))
        assert int(r1.iterations) == int(r2.iterations)
        assert float(r1.residual_norm) == float(r2.residual_norm)

    def test_spmv_bitwise_reproducible(self, dtype):
        a = poisson_2d(16, dtype=dtype)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(a.shape[0]).astype(dtype)
        )
        y1 = np.asarray(a @ x)
        y2 = np.asarray(a @ x)
        np.testing.assert_array_equal(y1, y2)
