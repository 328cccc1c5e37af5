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
