"""CSR construction, element access, iteration, arithmetic.

Mirrors the reference CSR suite (test/cpp/csr.cpp): constructors/init
(:4-57), direct access (:59-106), iterators incl. empty rows (:108-221),
densify (:223-256), scalar mult + inplaceAdd/Subtract (:525-785).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_math_tpu import (
    CSRMatrix,
    TripletMatrix,
    csr_from_dense,
    csr_from_triplet,
)


def make_matrix(dense, dtype=np.float64) -> CSRMatrix:
    return csr_from_dense(np.asarray(dense, dtype=dtype))


@pytest.fixture
def sample():
    # includes an empty row (row 2) like the reference iterator tests
    dense = np.array(
        [
            [4.0, 0.0, 1.0, 0.0],
            [0.0, 3.0, 0.0, 2.0],
            [0.0, 0.0, 0.0, 0.0],
            [1.0, 0.0, 0.0, 5.0],
        ]
    )
    return dense, make_matrix(dense)


def test_from_empty_triplet():
    t = TripletMatrix(3, 3)
    m = csr_from_triplet(t)
    assert m.shape == (3, 3)
    assert m.nnz == 0
    assert np.all(np.asarray(m.to_dense()) == 0)


def test_construction_from_triplet(dtype):
    t = TripletMatrix(3, 3)
    t.add_entry(0, 0, 2.0)
    t.add_entry(0, 2, 1.0)
    t.add_entry(2, 1, -3.0)
    t.add_entry(2, 1, 1.0)  # duplicate accumulates before CSR build
    m = csr_from_triplet(t, dtype=dtype)
    assert m.nnz == 3
    expected = np.array([[2, 0, 1], [0, 0, 0], [0, -2, 0]], dtype=dtype)
    np.testing.assert_allclose(np.asarray(m.to_dense()), expected)


def test_columns_sorted_within_rows(sample):
    # the reference invariant: positions ascending per row (h:1246-1251)
    _, m = sample
    indptr = np.asarray(m.indptr)
    indices = np.asarray(m.indices)
    for r in range(m.shape[0]):
        row_cols = indices[indptr[r]: indptr[r + 1]]
        assert np.all(np.diff(row_cols) > 0)


def test_get_value(sample):
    dense, m = sample
    for i in range(4):
        for j in range(4):
            assert float(m.get_value(i, j)) == pytest.approx(dense[i, j])


def test_update_entry(sample):
    dense, m = sample
    m2 = m.update_entry(0, 2, 9.0)
    assert float(m2.get_value(0, 2)) == 9.0
    # absent position: no-op (reference h:1572-1580)
    m3 = m.update_entry(0, 1, 9.0)
    np.testing.assert_allclose(np.asarray(m3.to_dense()), dense)


def test_add_entry_existing_position(sample):
    dense, m = sample
    m2 = m.add_entry(1, 3, 1.5)
    assert float(m2.get_value(1, 3)) == pytest.approx(3.5)
    m3 = m.add_entry(2, 2, 1.0)  # empty row: pattern can't change
    np.testing.assert_allclose(np.asarray(m3.to_dense()), dense)


def test_zero_values_keeps_pattern(sample):
    _, m = sample
    z = m.zero_values()
    assert z.nnz == m.nnz
    assert np.all(np.asarray(z.data) == 0)
    assert z.has_same_nonzero_pattern(m)


def test_iteration_skips_empty_rows(sample):
    dense, m = sample
    seen = [(r, c, v) for r, c, v in m]
    assert [(r, c) for r, c, _ in seen] == [
        (0, 0), (0, 2), (1, 1), (1, 3), (3, 0), (3, 3),
    ]
    for r, c, v in seen:
        assert v == pytest.approx(dense[r, c])


def test_row_iteration(sample):
    dense, m = sample
    row1 = list(m.iter_row(1))
    assert row1 == [(1, 1, 3.0), (1, 3, 2.0)]
    assert list(m.iter_row(2)) == []
    assert m.row_nnz(2) == 0


def test_scalar_multiplication(sample):
    dense, m = sample
    m2 = m * 2.0
    np.testing.assert_allclose(np.asarray(m2.to_dense()), dense * 2.0)
    m3 = 0.5 * m
    np.testing.assert_allclose(np.asarray(m3.to_dense()), dense * 0.5)


def test_inplace_add_subtract_same_pattern(sample):
    dense, m = sample
    m2 = m.add(m)
    np.testing.assert_allclose(np.asarray(m2.to_dense()), 2 * dense)
    m3 = m2.subtract(m)
    np.testing.assert_allclose(np.asarray(m3.to_dense()), dense)


def test_add_pattern_mismatch_raises(sample):
    _, m = sample
    other = make_matrix(np.eye(4))
    with pytest.raises(ValueError):
        m.add(other)


def test_has_same_nonzero_pattern(sample):
    dense, m = sample
    assert m.has_same_nonzero_pattern(m * 3.0)
    assert not m.has_same_nonzero_pattern(make_matrix(np.eye(4)))


def test_transpose(sample):
    dense, m = sample
    np.testing.assert_allclose(np.asarray(m.transpose().to_dense()), dense.T)


def test_densify_matches(sample):
    dense, m = sample
    np.testing.assert_allclose(np.asarray(m.to_dense()), dense)


def test_pytree_roundtrip(sample):
    import jax

    _, m = sample
    leaves, treedef = jax.tree_util.tree_flatten(m)
    m2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert m2.shape == m.shape
    np.testing.assert_allclose(np.asarray(m2.data), np.asarray(m.data))


def test_matmul_under_jit(sample):
    import jax

    dense, m = sample
    x = jnp.arange(4.0)

    @jax.jit
    def f(mat, v):
        return mat @ v

    np.testing.assert_allclose(np.asarray(f(m, x)), dense @ np.arange(4.0))


def test_get_value_index_bisection(sample):
    """Every stored (row, col) resolves to its data index; absent columns
    and empty rows give -1 — concrete AND under jit (the search is a
    while_loop bisection, reference getValueIndex h:1551-1570)."""
    import jax

    dense, m = sample
    indptr = np.asarray(m.indptr)
    indices = np.asarray(m.indices)
    jitted = jax.jit(lambda r, c: m.get_value_index(r, c))
    for r in range(m.shape[0]):
        stored = set(indices[indptr[r]: indptr[r + 1]].tolist())
        for c in range(m.shape[1]):
            got = int(m.get_value_index(r, c))
            assert got == int(jitted(r, c))
            if c in stored:
                assert indices[got] == c and indptr[r] <= got < indptr[r + 1]
            else:
                assert got == -1
