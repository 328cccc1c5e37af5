"""Observability + checkpoint/resume subsystem tests (SURVEY §5)."""

import numpy as np
import pytest

import sparse_matrix_math_tpu as smm
from sparse_matrix_math_tpu.solvers.types import SolverStatus
from sparse_matrix_math_tpu.utils.checkpoint import (
    checkpointed_solve,
    load_checkpoint,
    load_csr_npz,
    save_csr_npz,
)
from sparse_matrix_math_tpu.utils.generate import poisson_2d
from sparse_matrix_math_tpu.utils.profiling import (
    solve_with_stats,
    spmv_throughput,
)


@pytest.fixture(scope="module")
def system():
    import jax.numpy as jnp

    a = poisson_2d(16)
    b = a @ jnp.ones(a.shape[0], dtype=a.dtype)
    return a, b


class TestProfiling:
    def test_spmv_throughput(self, system):
        a, _ = system
        stats = spmv_throughput(a, iters=3)
        assert stats["gnnz_per_s"] > 0
        assert stats["gflop_per_s"] == pytest.approx(2 * stats["gnnz_per_s"])

    def test_solve_with_stats(self, system):
        a, b = system
        st = solve_with_stats(
            smm.cg, a, b, solver_name="cg", epsilon=1e-8, record_residuals=True
        )
        assert st.status == SolverStatus.SUCCESS
        assert st.iterations > 0
        assert st.wall_seconds > 0
        assert st.spmv_gnnz_per_s > 0
        assert st.residual_trace is not None
        assert st.residual_trace[st.iterations] <= 1e-8


class TestCheckpoint:
    def test_chunked_resume_matches(self, system, tmp_path):
        a, b = system
        path = str(tmp_path / "ck.npz")
        res = checkpointed_solve(
            smm.cg, a, b,
            checkpoint_path=path, chunk_iterations=10, epsilon=1e-9,
        )
        assert int(res.status) == SolverStatus.SUCCESS
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-7)
        ck = load_checkpoint(path)
        assert ck is not None and ck.iterations_done == int(res.iterations)

    def test_resume_after_interrupt(self, system, tmp_path):
        a, b = system
        path = str(tmp_path / "ck.npz")
        # phase 1: run only 2 chunks' worth and stop (simulated preemption)
        r1 = checkpointed_solve(
            smm.cg, a, b,
            checkpoint_path=path, chunk_iterations=5, max_iterations=10,
            epsilon=1e-12,
        )
        assert int(r1.status) == SolverStatus.MAX_ITERATIONS_REACHED
        ck = load_checkpoint(path)
        assert ck.iterations_done == 10
        # phase 2: resume to convergence
        r2 = checkpointed_solve(
            smm.cg, a, b,
            checkpoint_path=path, chunk_iterations=50, epsilon=1e-9,
        )
        assert int(r2.status) == SolverStatus.SUCCESS
        assert int(r2.iterations) > 10  # includes the resumed-from count
        np.testing.assert_allclose(np.asarray(r2.x), 1.0, atol=1e-7)

    def test_csr_npz_roundtrip(self, system, tmp_path):
        a, _ = system
        p = str(tmp_path / "m.npz")
        save_csr_npz(p, a)
        a2 = load_csr_npz(p)
        assert a2.shape == a.shape
        assert a.has_same_nonzero_pattern(a2)
        np.testing.assert_array_equal(np.asarray(a.data), np.asarray(a2.data))


class TestPoisson3d27pt:
    """27-point generator (utils/generate.py:poisson_3d_27pt): symmetric,
    26 on the diagonal, -1 on every 26-neighborhood coupling."""

    def test_structure(self):
        from sparse_matrix_math_tpu.utils.generate import poisson_3d_27pt

        a = poisson_3d_27pt(3, dtype=np.float64)
        d = np.asarray(a.to_dense())
        assert np.array_equal(d, d.T)
        assert (np.diag(d) == 26.0).all()
        off = d - np.diag(np.diag(d))
        assert set(np.unique(off)) == {-1.0, 0.0}
        # corner row: 7 neighbors; center row: 26
        assert (d[0] != 0).sum() == 8
        assert (d[13] != 0).sum() == 27
        assert np.linalg.eigvalsh(d).min() > 0  # SPD

    def test_dia_width(self):
        from sparse_matrix_math_tpu.formats.dia import dia_from_csr
        from sparse_matrix_math_tpu.utils.generate import poisson_3d_27pt

        d = dia_from_csr(poisson_3d_27pt(5, dtype=np.float32))
        assert len(d.offsets) == 27
