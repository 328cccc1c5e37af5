"""Real-TPU df64 (double-word f32) tests — run manually on a chip:

    SMM_TPU_TESTS=1 python -m pytest tests/tpu -q --no-header

The CPU suite routes the EFT primitives through native f64
(ops/df32.py `_via_f64`); only here does the pure-f32 Dekker/Knuth
path — the one production TPU users run — get exercised end-to-end.
The first test IS the contraction probe: if a backend change ever
starts emitting FMA inside the fusions, it fails loudly.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU backend"
)


def test_eft_exactness_on_hardware():
    """two_sum/two_prod must be EXACT on the chip (no FMA contraction).

    Oracle: f32 ± f32 and f32 * f32 are exactly representable in host
    f64, so s + e == a + b and p + e == a * b must hold bit-for-bit."""
    import jax.numpy as jnp
    from sparse_matrix_math_tpu.ops.df32 import two_prod, two_sum

    rng = np.random.default_rng(0)
    a = (rng.standard_normal(8192) * 10.0 ** rng.integers(-6, 7, 8192)).astype(
        np.float32
    )
    b = (rng.standard_normal(8192) * 10.0 ** rng.integers(-6, 7, 8192)).astype(
        np.float32
    )
    s, e = jax.jit(two_sum)(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, a.astype(np.float64) + b.astype(np.float64))
    p, e = jax.jit(two_prod)(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, a.astype(np.float64) * b.astype(np.float64))


def test_eft_exactness_inside_loop_fusion():
    """The same exactness INSIDE a fused while_loop body (the context
    where XLA:CPU demonstrably breaks it — see ops/df32.py docstring)."""
    import jax.numpy as jnp
    from sparse_matrix_math_tpu.ops.df32 import df_add, two_prod

    rng = np.random.default_rng(1)
    a = rng.standard_normal(4096).astype(np.float32)
    b = rng.standard_normal(4096).astype(np.float32)

    @jax.jit
    def accumulate(a, b):
        def body(i, acc):
            p, e = two_prod(a * (1.0 + 0.0 * i), b)
            return df_add(acc, (p, e))

        z = jnp.zeros_like(a)
        return jax.lax.fori_loop(0, 7, body, (z, z))

    hi, lo = accumulate(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    want = 7.0 * a.astype(np.float64) * b.astype(np.float64)
    assert np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-30)) < 1e-13


def test_cg_df64_poisson_1e10_on_chip():
    """eps=1e-10 — far past plain f32's reach — verified on the host in
    f64 against the original operator."""
    from sparse_matrix_math_tpu import SolverStatus, cg_df64
    from sparse_matrix_math_tpu.ops.df32 import DfEllMatrix
    from sparse_matrix_math_tpu.utils import poisson_2d

    a = poisson_2d(48, dtype=np.float32)
    data = np.asarray(a.data, np.float64)
    indices = np.asarray(a.indices, np.int64)
    indptr = np.asarray(a.indptr, np.int64)
    n = a.shape[0]
    x_true = np.random.default_rng(0).standard_normal(n)
    b = np.zeros(n)
    for r in range(n):
        s, e = indptr[r], indptr[r + 1]
        b[r] = np.dot(data[s:e], x_true[indices[s:e]])
    dfa = DfEllMatrix.from_host_csr(data, indices, indptr, a.shape)
    res = cg_df64(dfa, b, epsilon=1e-10)
    assert res.status_enum() == SolverStatus.SUCCESS, res
    x = res.x_f64()
    tr = np.zeros(n)
    for r in range(n):
        s, e = indptr[r], indptr[r + 1]
        tr[r] = b[r] - np.dot(data[s:e], x[indices[s:e]])
    assert np.linalg.norm(tr) < 1e-9, np.linalg.norm(tr)
    assert np.linalg.norm(x - x_true) / np.linalg.norm(x_true) < 1e-10


def test_df_dia_fast_path_on_chip():
    """DfDiaMatrix (gather-free shifted reads) vs host f64 oracle."""
    import jax.numpy as jnp
    from sparse_matrix_math_tpu.ops.df32 import (
        DfDiaMatrix, df_from_host, df_to_host, df_operator_from_host_csr,
    )
    from sparse_matrix_math_tpu.utils import poisson_2d

    a = poisson_2d(64, dtype=np.float32)
    data = np.asarray(a.data, np.float64) * (1.0 + 1e-9)
    indices = np.asarray(a.indices, np.int64)
    indptr = np.asarray(a.indptr, np.int64)
    op = df_operator_from_host_csr(data, indices, indptr, a.shape)
    assert isinstance(op, DfDiaMatrix)
    n = a.shape[0]
    x64 = np.random.default_rng(3).standard_normal(n)
    got = df_to_host(jax.jit(op.rmult_df)(df_from_host(x64)))
    want = np.add.reduceat(data * x64[indices], indptr[:-1])
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-12
