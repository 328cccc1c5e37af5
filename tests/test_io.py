"""File I/O: Matrix Market, SMMDT, dispatch.

Mirrors the reference I/O tests (test/cpp/csr.cpp:787-865): symmetric MM
load with explicit-zero handling, saveDenseText -> loadSMMDT round-trip
with a temp file, and extension dispatch errors.
"""

import io
import os

import numpy as np
import pytest

from sparse_matrix_math_tpu import (
    MatrixLoadStatus,
    MatrixMarketError,
    csr_from_dense,
    csr_from_triplet,
    load_matrix,
    load_matrix_csr,
    load_matrix_market,
    load_smmdt,
    save_dense_text,
)
from conftest import MESH_MATRICES, asset_path

SYMMETRIC_MTX = """%%MatrixMarket matrix coordinate real symmetric
% comment line
5 5 6
1 1 4.0
2 2 5.0
3 3 6.0
2 1 -1.0
4 3 0.0
5 5 2.5
"""


def test_symmetric_load_mirrors_offdiagonal():
    m = load_matrix_market(io.StringIO(SYMMETRIC_MTX))
    assert m.shape == (5, 5)
    # (2,1) mirrored to (1,2) — reference h:2596-2601
    assert m.get_value(1, 0) == -1.0
    assert m.get_value(0, 1) == -1.0
    # explicit zero entries are stored by the triplet (they're entries),
    # mirroring the reference's load_symmetric_test.mtx case
    assert m.get_value(3, 2) == 0.0
    assert m.get_value(4, 4) == 2.5


def test_reference_asset_loads():
    m = load_matrix_market(asset_path(MESH_MATRICES[0]))
    assert m.shape == (48, 48)
    # 177 stored entries expand to 306 with mirroring (BASELINE.md)
    assert m.nnz == 306
    csr = csr_from_triplet(m)
    dense = np.asarray(csr.to_dense())
    np.testing.assert_allclose(dense, dense.T)  # symmetric expansion


def test_reference_load_symmetric_test_asset():
    # the reference's own 5x5 asset with an explicit zero
    m = load_matrix_market(asset_path("load_symmetric_test.mtx"))
    assert m.shape[0] == m.shape[1] == 5


@pytest.mark.parametrize(
    "banner,status",
    [
        ("%%MatrixMarket matrix coordinate real general",
         MatrixLoadStatus.UNSUPPORTED_FORMAT),
        ("%%MatrixMarket matrix coordinate complex symmetric",
         MatrixLoadStatus.UNSUPPORTED_FORMAT),
        ("%%MatrixMarket matrix array real symmetric",
         MatrixLoadStatus.UNSUPPORTED_FORMAT),
        ("%%MatrixMarket matrix coordinate pattern symmetric",
         MatrixLoadStatus.UNSUPPORTED_FORMAT),
        ("not a banner at all", MatrixLoadStatus.PARSE_ERROR),
    ],
)
def test_rejected_banners(banner, status):
    # the reference accepts ONLY coordinate real|integer symmetric
    # (h:2544-2573)
    text = banner + "\n1 1 1\n1 1 1.0\n"
    with pytest.raises(MatrixMarketError) as exc:
        load_matrix_market(io.StringIO(text))
    assert exc.value.status == status


def test_general_allowed_with_flag():
    text = "%%MatrixMarket matrix coordinate real general\n2 2 2\n1 2 3.0\n2 1 4.0\n"
    m = load_matrix_market(io.StringIO(text), allow_general=True)
    assert m.get_value(0, 1) == 3.0
    assert m.get_value(1, 0) == 4.0


def test_integer_field_accepted():
    text = "%%MatrixMarket matrix coordinate integer symmetric\n2 2 1\n2 1 7\n"
    m = load_matrix_market(io.StringIO(text))
    assert m.get_value(1, 0) == 7.0
    assert m.get_value(0, 1) == 7.0


def test_wrong_entry_count_is_parse_error():
    text = "%%MatrixMarket matrix coordinate real symmetric\n2 2 3\n1 1 1.0\n"
    with pytest.raises(MatrixMarketError) as exc:
        load_matrix_market(io.StringIO(text))
    assert exc.value.status == MatrixLoadStatus.PARSE_ERROR


def test_save_load_roundtrip(tmp_path):
    # reference csr.cpp:828-865 round-trips through a temp file
    dense = np.array(
        [
            [1.5, 0.0, 2.0],
            [0.0, 0.0, 0.0],
            [-3.25, 0.0, 4.0],
        ]
    )
    m = csr_from_dense(dense)
    path = tmp_path / "roundtrip.smmdt"
    save_dense_text(path, m)
    m2 = load_smmdt(path)
    np.testing.assert_allclose(m2.to_dense(), dense, atol=1e-6)
    # zeros are skipped on ingest (h:2634-2636)
    assert m2.nnz == 4


def test_save_format_grammar(tmp_path):
    dense = np.array([[0.0, 1.0], [2.0, 0.0]])
    buf = io.StringIO()
    save_dense_text(buf, csr_from_dense(dense))
    text = buf.getvalue()
    lines = text.splitlines()
    assert lines[0] == "2 2"
    assert lines[1] == "{"
    assert lines[2] == "{0,1.000000},"
    assert lines[3] == "{2.000000,0}"
    assert lines[4] == "}"


def test_dispatch_by_extension(tmp_path):
    path = tmp_path / "m.smmdt"
    dense = np.eye(3) * 2.0
    save_dense_text(path, csr_from_dense(dense))
    t = load_matrix(path)
    np.testing.assert_allclose(t.to_dense(), dense)
    csr = load_matrix_csr(path)
    np.testing.assert_allclose(np.asarray(csr.to_dense()), dense)


def test_dispatch_unknown_extension():
    with pytest.raises(MatrixMarketError) as exc:
        load_matrix("matrix.txt")
    assert exc.value.status == MatrixLoadStatus.FAILED_TO_OPEN_FILE_UNKNOWN_FORMAT


def test_missing_file():
    with pytest.raises(MatrixMarketError) as exc:
        load_matrix_market("/nonexistent/path.mtx")
    assert exc.value.status == MatrixLoadStatus.FAILED_TO_OPEN_FILE
