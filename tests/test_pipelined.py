"""Pipelined CG tests (single fused reduction per iteration —
solvers/pipelined.py, after Ghysels & Vanroose 2014)."""

import jax.numpy as jnp
import numpy as np
import pytest

import sparse_matrix_math_tpu as smm
from sparse_matrix_math_tpu.solvers.types import SolverStatus
from sparse_matrix_math_tpu.utils.generate import poisson_2d, random_spd_csr


class TestPipelinedCG:
    @pytest.mark.parametrize("gen", [lambda: poisson_2d(16),
                                     lambda: random_spd_csr(120, 0.08, seed=4)])
    def test_converges_like_cg(self, gen):
        a = gen()
        b = a @ jnp.ones(a.shape[0])
        rp = smm.cg_pipelined(a, b, epsilon=1e-10)
        rc = smm.cg(a, b, epsilon=1e-10)
        assert int(rp.status) == SolverStatus.SUCCESS
        np.testing.assert_allclose(np.asarray(rp.x), 1.0, atol=1e-9)
        # pipelined detects convergence one step late (gamma is the
        # entering residual) — at most +1 iteration vs plain CG
        assert int(rp.iterations) <= int(rc.iterations) + 1

    def test_via_solve_api(self):
        a = poisson_2d(12)
        b = a @ jnp.ones(144)
        res = smm.solve(a, b, method="cg_pipelined", epsilon=1e-9)
        assert int(res.status) == SolverStatus.SUCCESS

    def test_max_iterations(self):
        a = poisson_2d(16)
        b = a @ jnp.ones(256)
        res = smm.cg_pipelined(a, b, max_iterations=3, epsilon=1e-14)
        assert int(res.status) == SolverStatus.MAX_ITERATIONS_REACHED
        assert int(res.iterations) == 3

    def test_residual_replacement_bounds_drift(self):
        """Periodic true-residual replacement keeps the recurrence honest:
        without it, at high iteration counts in f32 the recurrence
        residual underreports the TRUE residual by orders of magnitude;
        with it the two agree (pipelined.py drift caveat, measured)."""
        a = poisson_2d(64, dtype=np.float32)
        b = a @ jnp.ones(a.shape[0], jnp.float32)

        def true_res(res):
            return float(jnp.linalg.norm(b - a @ res.x))

        drift = smm.cg_pipelined(
            a, b, max_iterations=3000, epsilon=1e-12, replace_every=0
        )
        fixed = smm.cg_pipelined(
            a, b, max_iterations=3000, epsilon=1e-12, replace_every=25
        )
        # no replacement: recurrence residual lies by >100x
        assert true_res(drift) > 100 * float(drift.residual_norm)
        # replacement: recurrence and true residuals agree to 2x
        assert true_res(fixed) <= 2 * float(fixed.residual_norm)
        assert true_res(fixed) < 1e-2

    def test_record_residuals(self):
        a = poisson_2d(10)
        b = a @ jnp.ones(100)
        res = smm.cg_pipelined(a, b, epsilon=1e-9, record_residuals=True)
        trace = np.asarray(res.residual_trace)
        assert np.isfinite(trace[: int(res.iterations)]).all()
