"""Triplet/COO assembly semantics.

Mirrors the reference triplet suite (test/cpp/triplet.cpp): construction,
duplicate accumulation in addEntry, dense conversion, getValue /
updateEntry behavior.
"""

import numpy as np
import pytest

from sparse_matrix_math_tpu import TripletMatrix, coo_from_arrays


def test_empty_construction():
    m = TripletMatrix(4, 5)
    assert m.shape == (4, 5)
    assert m.nnz == 0
    assert list(m) == []
    assert np.all(m.to_dense() == 0)


def test_add_entry_accumulates_duplicates():
    # reference: addEntry sums duplicates (sparse_matrix_math.h:607-618;
    # test/cpp/triplet.cpp duplicate tests)
    m = TripletMatrix(3, 3)
    m.add_entry(1, 2, 1.5)
    m.add_entry(1, 2, 2.5)
    m.add_entry(0, 0, -1.0)
    assert m.nnz == 2
    assert m.get_value(1, 2) == pytest.approx(4.0)
    assert m.get_value(0, 0) == pytest.approx(-1.0)


def test_get_value_missing_is_zero():
    m = TripletMatrix(2, 2)
    assert m.get_value(0, 1) == 0.0


def test_update_entry_only_existing():
    # reference: updateEntry only touches present entries (h:621-632)
    m = TripletMatrix(2, 2)
    assert m.update_entry(0, 0, 5.0) is False
    m.add_entry(0, 0, 1.0)
    assert m.update_entry(0, 0, 5.0) is True
    assert m.get_value(0, 0) == 5.0


def test_iteration_row_major_order():
    m = TripletMatrix(3, 3)
    m.add_entry(2, 0, 1.0)
    m.add_entry(0, 1, 2.0)
    m.add_entry(0, 0, 3.0)
    m.add_entry(1, 2, 4.0)
    entries = [(r, c) for r, c, _ in m]
    assert entries == [(0, 0), (0, 1), (1, 2), (2, 0)]


def test_out_of_bounds_raises():
    m = TripletMatrix(2, 2)
    with pytest.raises(IndexError):
        m.add_entry(2, 0, 1.0)
    with pytest.raises(IndexError):
        m.add_entry(0, -1, 1.0)


def test_scale():
    m = TripletMatrix(2, 2)
    m.add_entry(0, 0, 2.0)
    m.add_entry(1, 1, 3.0)
    m *= 2.0
    assert m.get_value(0, 0) == 4.0
    assert m.get_value(1, 1) == 6.0


def test_to_dense():
    m = TripletMatrix(2, 3)
    m.add_entry(0, 1, 7.0)
    m.add_entry(1, 2, -2.0)
    expected = np.array([[0, 7, 0], [0, 0, -2.0]])
    np.testing.assert_allclose(m.to_dense(), expected)


def test_coo_from_arrays_sums_duplicates_and_sorts():
    coo = coo_from_arrays(
        rows=[2, 0, 2, 0],
        cols=[1, 2, 1, 2],
        vals=[1.0, 3.0, 4.0, -1.0],
        shape=(3, 3),
    )
    assert coo.nnz == 2
    np.testing.assert_array_equal(np.asarray(coo.rows), [0, 2])
    np.testing.assert_array_equal(np.asarray(coo.cols), [2, 1])
    np.testing.assert_allclose(np.asarray(coo.vals), [2.0, 5.0])


def test_coo_out_of_range_raises():
    with pytest.raises(ValueError):
        coo_from_arrays([0], [5], [1.0], shape=(2, 2))


def test_coo_scale_and_dense():
    coo = coo_from_arrays([0, 1], [1, 0], [2.0, 3.0], shape=(2, 2))
    scaled = coo.scale(2.0)
    np.testing.assert_allclose(
        np.asarray(scaled.to_dense()), [[0, 4], [6, 0]]
    )
