"""HYB (diagonals + remainder) format tests."""

import jax.numpy as jnp
import numpy as np
import pytest

import sparse_matrix_math_tpu as smm
from sparse_matrix_math_tpu.formats.hyb import hyb_from_csr
from sparse_matrix_math_tpu.ops.spmv import rmult
from sparse_matrix_math_tpu.utils.generate import poisson_2d, random_spd_csr

from conftest import SHERMAN1, asset_path


def _rand_x(n, dtype, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(n).astype(dtype))


class TestHyb:
    def test_pure_banded_goes_all_dia(self):
        a = poisson_2d(20)
        h = hyb_from_csr(a)
        assert h.rest is None and h.dia is not None
        assert h.diagonal_fraction == 1.0

    def test_sherman1_is_pure_dia(self):
        # sherman1 = 7 diagonals at fills 0.31-1.0 (offsets 0, ±1, ±10, ±100)
        a = smm.load_matrix_csr(asset_path(SHERMAN1))
        h = hyb_from_csr(a, min_diag_fill=0.3)
        assert h.dia is not None and len(h.dia.offsets) == 7
        assert h.rest is None
        # default threshold keeps the 3 dense diagonals + remainder
        h2 = hyb_from_csr(a)
        assert h2.dia is not None and h2.rest is not None
        x = jnp.asarray(np.random.default_rng(0).standard_normal(1000))
        np.testing.assert_allclose(
            np.asarray(rmult(h2, x)), np.asarray(rmult(a, x)), rtol=1e-12
        )

    def test_unstructured_splits(self, dtype):
        a = random_spd_csr(200, density=0.05, seed=3, dtype=dtype)
        h = hyb_from_csr(a)  # only the (dense) main diagonal qualifies
        assert h.dia is not None and h.rest is not None
        x = _rand_x(200, dtype)
        np.testing.assert_allclose(
            np.asarray(rmult(h, x)),
            np.asarray(rmult(a, x)),
            rtol=2e-4 if dtype == np.float32 else 1e-11,
        )
        np.testing.assert_allclose(
            np.asarray(h.to_dense()), np.asarray(a.to_dense()),
            atol=1e-6 if dtype == np.float32 else 1e-14,
        )

    def test_solver_on_hyb(self, dtype):
        a = random_spd_csr(120, density=0.08, seed=11, dtype=dtype)
        h = hyb_from_csr(a)
        b = rmult(a, jnp.ones(120, dtype=dtype))
        eps = 1e-4 if dtype == np.float32 else 1e-9
        res = smm.cg(h, b, epsilon=eps)
        assert int(res.status) == 0
        np.testing.assert_allclose(
            np.asarray(res.x), 1.0, atol=100 * eps
        )

    def test_empty_matrix_total(self):
        """All-zero matrices must stay total through every format
        (regression: empty-offsets DIA / double-None HYB crashed)."""
        from sparse_matrix_math_tpu.formats.csr import csr_from_dense
        from sparse_matrix_math_tpu.formats.dia import dia_from_csr

        z = csr_from_dense(np.zeros((4, 4)))
        d = dia_from_csr(z)
        h = hyb_from_csr(z)
        x = jnp.ones(4)
        np.testing.assert_array_equal(np.asarray(d @ x), 0.0)
        np.testing.assert_array_equal(np.asarray(h @ x), 0.0)
        np.testing.assert_array_equal(np.asarray(h.to_dense()), 0.0)
        assert h.dtype is not None

    def test_mixed_precision_dia(self):
        """bf16 diagonal storage with f32 multiplicand: exact for exactly
        representable stencil weights (Poisson: -1, 4)."""
        a = poisson_2d(20, dtype=np.float32)
        d = smm.dia_from_csr(a).astype(jnp.bfloat16)
        x = _rand_x(400, np.float32)
        y = rmult(d, x)
        assert y.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(rmult(a, x)), rtol=1e-6
        )
