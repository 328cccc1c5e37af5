"""Pallas SpMV kernel tests (interpret mode on CPU; the same kernels run
compiled on TPU — SURVEY §7 step 6)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_math_tpu.formats.dia import dia_from_csr
from sparse_matrix_math_tpu.formats.ell import ell_from_csr
from sparse_matrix_math_tpu.ops.pallas_spmv import dia_spmv, ell_spmv
from sparse_matrix_math_tpu.ops.spmv import rmult
from sparse_matrix_math_tpu.utils.generate import laplace_1d, poisson_2d, random_spd_csr


def _rand_x(n, dtype, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(n).astype(dtype)
    )


class TestDiaKernel:
    @pytest.mark.parametrize("nx", [7, 37, 64])
    def test_poisson(self, nx, dtype):
        a = poisson_2d(nx, dtype=dtype)
        d = dia_from_csr(a)
        x = _rand_x(a.shape[1], dtype)
        ref = rmult(a, x)
        out = dia_spmv(d, x, interpret=True)
        tol = 1e-5 if dtype == np.float32 else 1e-12
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=tol)

    def test_tridiagonal(self, dtype):
        a = laplace_1d(501, dtype=dtype)
        d = dia_from_csr(a)
        x = _rand_x(501, dtype)
        np.testing.assert_allclose(
            np.asarray(dia_spmv(d, x, interpret=True)),
            np.asarray(rmult(a, x)),
            atol=1e-5 if dtype == np.float32 else 1e-12,
        )


class TestPaddedDiaPath:
    """Padded-domain fast path: vectors stay in the kernel's 2-D layout
    across whole solver loops (solvers/_padded.py)."""

    def test_padded_spmv_exact(self, dtype):
        from sparse_matrix_math_tpu.ops.pallas_spmv import (
            dia_spmv_padded,
            pad_dia,
        )

        a = poisson_2d(37, dtype=dtype)
        d = dia_from_csr(a)
        p = pad_dia(d, rows_blk=8)
        x = _rand_x(a.shape[1], dtype)
        yp = dia_spmv_padded(p, p.to_padded(x), interpret=True)
        np.testing.assert_allclose(
            np.asarray(p.from_padded(yp)),
            np.asarray(rmult(a, x)),
            atol=1e-5 if dtype == np.float32 else 1e-12,
        )
        # padding must stay exactly zero (keeps dots/axpys exact)
        flat = np.asarray(yp).reshape(-1)
        lead = p.lblk * p.rows_blk * 128
        assert np.all(flat[:lead] == 0)
        assert np.all(flat[lead + a.shape[0]:] == 0)

    @pytest.mark.parametrize(
        "core", ["cg", "bicg_symmetric", "cgs", "bicgstab"]
    )
    def test_padded_solve_matches_unpadded(self, core):
        import jax.numpy as jnp

        from sparse_matrix_math_tpu.solvers import _padded

        a = poisson_2d(16, dtype=np.float32)
        d = dia_from_csr(a)
        b = rmult(a, jnp.ones(a.shape[0], jnp.float32))
        x0 = jnp.zeros_like(b)
        eps = jnp.float32(1e-5)
        res = _padded.padded_solve(
            core, d, b, x0, eps, 256, False, interpret=True
        )
        assert int(res.status) == 0
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-4)

    def test_padded_pcg_jacobi(self):
        import jax.numpy as jnp

        import sparse_matrix_math_tpu as smm
        from sparse_matrix_math_tpu.solvers import _padded

        a = poisson_2d(16, dtype=np.float32)
        d = dia_from_csr(a)
        b = rmult(a, jnp.ones(a.shape[0], jnp.float32))
        pre = smm.JacobiPreconditioner.from_matrix(a)
        res = _padded.padded_solve(
            "cg", d, b, jnp.zeros_like(b), jnp.float32(1e-5), 256, False,
            preconditioner=pre, interpret=True,
        )
        assert int(res.status) == 0
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-4)


class TestEllKernel:
    def test_poisson(self, dtype):
        a = poisson_2d(23, dtype=dtype)
        e = ell_from_csr(a)
        x = _rand_x(a.shape[1], dtype)
        np.testing.assert_allclose(
            np.asarray(ell_spmv(e, x, interpret=True)),
            np.asarray(rmult(a, x)),
            atol=1e-5 if dtype == np.float32 else 1e-12,
        )

    def test_unstructured(self, dtype):
        a = random_spd_csr(150, density=0.1, seed=9, dtype=dtype)
        e = ell_from_csr(a)
        x = _rand_x(150, dtype)
        np.testing.assert_allclose(
            np.asarray(ell_spmv(e, x, interpret=True)),
            np.asarray(rmult(a, x)),
            atol=1e-4 if dtype == np.float32 else 1e-11,
        )

    def test_empty_rows(self, dtype):
        dense = np.zeros((40, 40), dtype)
        dense[3, 5] = 2.5
        dense[17, 0] = -1.0
        dense[39, 39] = 4.0
        from sparse_matrix_math_tpu.formats.csr import csr_from_dense

        a = csr_from_dense(dense)
        e = ell_from_csr(a)
        x = _rand_x(40, dtype)
        np.testing.assert_allclose(
            np.asarray(ell_spmv(e, x, interpret=True)),
            np.asarray(dense @ np.asarray(x)),
            atol=1e-5 if dtype == np.float32 else 1e-12,
        )


class TestDfPaddedDiaKernel:
    """Double-word padded DIA kernel (interpret mode; the hardware run
    incl. the EFT-exactness guarantee is tests/tpu/test_tpu_df64.py)."""

    def _df_poisson(self, nx):
        from sparse_matrix_math_tpu.ops.df32 import DfDiaMatrix

        a = poisson_2d(nx, dtype=np.float64)
        data = np.asarray(a.data, np.float64) * (
            1.0 + 1e-9 * np.arange(a.nnz)  # non-trivial lo planes
        )
        indices = np.asarray(a.indices, np.int64)
        indptr = np.asarray(a.indptr, np.int64)
        dfa = DfDiaMatrix.from_host_csr(data, indices, indptr, a.shape)
        return dfa, data, indices, indptr

    @pytest.mark.parametrize("nx", [7, 48])
    def test_matches_host_f64(self, nx):
        from sparse_matrix_math_tpu.ops.pallas_spmv import (
            dia_spmv_padded_df,
            pad_dia_df,
        )

        dfa, data, indices, indptr = self._df_poisson(nx)
        n = dfa.shape[0]
        x64 = np.random.default_rng(3).standard_normal(n)
        hi = x64.astype(np.float32)
        lo = (x64 - hi.astype(np.float64)).astype(np.float32)
        p = pad_dia_df(dfa)
        yh, yl = dia_spmv_padded_df(
            p, p.to_padded(jnp.asarray(hi)), p.to_padded(jnp.asarray(lo)),
            interpret=True,
        )
        got = (
            np.asarray(p.from_padded(yh), np.float64)
            + np.asarray(p.from_padded(yl), np.float64)
        )
        x48 = hi.astype(np.float64) + lo.astype(np.float64)
        want = np.add.reduceat(data * x48[indices], indptr[:-1])
        rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
        assert rel < 1e-12, rel

    def test_matches_xla_df_path(self, ):
        from sparse_matrix_math_tpu.ops.pallas_spmv import (
            dia_spmv_padded_df,
            pad_dia_df,
        )

        dfa, *_ = self._df_poisson(24)
        n = dfa.shape[0]
        x64 = np.random.default_rng(4).standard_normal(n)
        from sparse_matrix_math_tpu.ops.df32 import df_from_host, df_to_host

        x = df_from_host(x64)
        want = df_to_host(dfa.rmult_df(x))  # XLA formulation (CPU here)
        p = pad_dia_df(dfa)
        yh, yl = dia_spmv_padded_df(
            p, p.to_padded(x[0]), p.to_padded(x[1]), interpret=True
        )
        got = (
            np.asarray(p.from_padded(yh), np.float64)
            + np.asarray(p.from_padded(yl), np.float64)
        )
        rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
        assert rel < 1e-12, rel

    def test_streamed_matches_resident(self):
        from sparse_matrix_math_tpu.ops.pallas_spmv import (
            dia_spmv_padded_df,
            dia_spmv_streamed_df,
            pad_dia_df,
        )

        dfa, data, indices, indptr = self._df_poisson(32)
        n = dfa.shape[0]
        x64 = np.random.default_rng(5).standard_normal(n)
        hi = jnp.asarray(x64.astype(np.float32))
        lo = jnp.asarray(
            (x64 - np.asarray(hi, np.float64)).astype(np.float32)
        )
        p = pad_dia_df(dfa)
        rh, rl = dia_spmv_padded_df(
            p, p.to_padded(hi), p.to_padded(lo), interpret=True
        )
        sh, sl = dia_spmv_streamed_df(
            p, p.to_padded(hi), p.to_padded(lo), interpret=True
        )
        np.testing.assert_array_equal(np.asarray(rh), np.asarray(sh))
        np.testing.assert_array_equal(np.asarray(rl), np.asarray(sl))


class TestWideStencilBlockSizing:
    """default_rows_blk keeps the double-buffered diagonal slab within
    scoped VMEM: a fixed 512-row block at 27 diagonals allocates
    2 x 6.9 MB and dies at Mosaic compile time (observed round 5 on the
    27-point 3-D Laplacian)."""

    def test_block_shrinks_with_width(self):
        from sparse_matrix_math_tpu.ops.pallas_spmv import default_rows_blk

        assert default_rows_blk(5) == 512       # 5-point family unchanged
        assert default_rows_blk(7) == 512
        assert default_rows_blk(27) == 256      # 27-point 3-D (any dtype)
        # slab bound holds at every width
        for nd in (1, 9, 27, 64, 128):
            rb = default_rows_blk(nd)
            assert 2 * nd * rb * 128 * 4 <= 12 * 2**20 or rb == 64

    def test_27pt_padded_spmv_exact(self):
        from sparse_matrix_math_tpu.formats.dia import dia_from_csr
        from sparse_matrix_math_tpu.ops.pallas_spmv import (
            dia_spmv_padded,
            pad_dia,
        )
        from sparse_matrix_math_tpu.utils.generate import poisson_3d_27pt

        a = poisson_3d_27pt(6, dtype=np.float32)
        d = dia_from_csr(a)
        p = pad_dia(d)
        assert p.rows_blk == 256
        x = np.random.default_rng(11).standard_normal(216).astype(np.float32)
        yp = dia_spmv_padded(p, p.to_padded(jnp.asarray(x)), interpret=True)
        np.testing.assert_allclose(
            np.asarray(p.from_padded(yp)),
            np.asarray(d.rmult(jnp.asarray(x))),
            rtol=2e-5, atol=2e-4,
        )
