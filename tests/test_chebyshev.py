"""Chebyshev semi-iteration tests (no reference equivalent: the
collective-minimal solver for pods — solvers/chebyshev.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import sparse_matrix_math_tpu as smm
from sparse_matrix_math_tpu.solvers.chebyshev import chebyshev, lanczos_extremal
from sparse_matrix_math_tpu.solvers.types import SolverStatus
from sparse_matrix_math_tpu.utils.generate import poisson_2d, random_spd_csr


class TestLanczos:
    def test_extremal_estimates(self):
        a = poisson_2d(16)
        lo, hi = lanczos_extremal(a)
        w = np.linalg.eigvalsh(np.asarray(a.to_dense()))
        assert lo == pytest.approx(w[0], rel=1e-2)
        assert hi == pytest.approx(w[-1], rel=1e-2)
        # Lanczos estimates are interior (small tolerance for roundoff)
        assert lo >= w[0] - 1e-8 and hi <= w[-1] + 1e-8


class TestChebyshev:
    def test_auto_bounds_converges(self):
        a = poisson_2d(16)
        b = a @ jnp.ones(256)
        res = chebyshev(a, b, epsilon=1e-9, max_iterations=3000)
        assert int(res.status) == SolverStatus.SUCCESS
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-8)

    def test_explicit_bounds_faster(self):
        a = random_spd_csr(120, 0.08, seed=4)
        b = a @ jnp.ones(120)
        w = np.linalg.eigvalsh(np.asarray(a.to_dense()))
        res = chebyshev(
            a, b, epsilon=1e-9, eig_bounds=(float(w[0]), float(w[-1]))
        )
        assert int(res.status) == SolverStatus.SUCCESS

    def test_via_solve_api(self):
        a = poisson_2d(12)
        b = a @ jnp.ones(144)
        res = smm.solve(a, b, method="chebyshev", epsilon=1e-8,
                        max_iterations=2000)
        assert int(res.status) == SolverStatus.SUCCESS

    def test_record_residuals(self):
        a = poisson_2d(10)
        b = a @ jnp.ones(100)
        res = chebyshev(
            a, b, epsilon=1e-8, max_iterations=2000,
            check_every=5, record_residuals=True,
        )
        trace = np.asarray(res.residual_trace)
        k = int(res.iterations) // 5
        assert np.isfinite(trace[: k + 1]).all()

    def test_max_iterations_respected(self):
        a = poisson_2d(16)
        b = a @ jnp.ones(256)
        res = chebyshev(a, b, epsilon=1e-14, max_iterations=20, check_every=10)
        assert int(res.status) in (
            SolverStatus.MAX_ITERATIONS_REACHED, SolverStatus.SUCCESS
        )
        assert int(res.iterations) <= 20
