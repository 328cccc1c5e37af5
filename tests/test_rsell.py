"""R-SELL routed-format tests: parity vs CSR across pattern classes,
packer invariants, and chain composition (formats/rsell.py).

Reference analogue: rMultOp is pattern-agnostic
(/root/reference/include/sparse_matrix_math.h:1458-1515) — these tests
pin the routed chain to the same "any pattern" contract on the class of
patterns W-SELL cannot serve (zero tile locality)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparse_matrix_math_tpu.formats.csr import csr_from_coo
from sparse_matrix_math_tpu.formats.rsell import (
    RoutedMatrix,
    routed_from_csr,
    try_routed_from_csr,
)
from sparse_matrix_math_tpu.formats.triplet import coo_from_arrays
from sparse_matrix_math_tpu.ops.spmv import rmult
from sparse_matrix_math_tpu.utils.generate import uniform_random_csr


def _csr_from_entries(r, c, v, shape):
    return csr_from_coo(
        coo_from_arrays(r, c, v, shape), needs_sort=True
    )


def _relerr(y, ref):
    scale = max(1.0, float(np.abs(ref).max()))
    return float(np.abs(np.asarray(y) - ref).max()) / scale


class TestRoutedParity:
    def test_uniform_random(self):
        a = uniform_random_csr(20_000, per_row=5, seed=7, dtype=np.float32)
        x = np.random.default_rng(1).standard_normal(20_000).astype(np.float32)
        ref = np.asarray(rmult(a, jnp.asarray(x)))
        ra = routed_from_csr(a, max_slot_ratio=99.0)
        assert isinstance(ra, RoutedMatrix)
        assert _relerr(ra.rmult(jnp.asarray(x)), ref) < 1e-5

    def test_matmul_operator(self):
        a = uniform_random_csr(5_000, per_row=4, seed=3, dtype=np.float32)
        x = np.random.default_rng(2).standard_normal(5_000).astype(np.float32)
        ra = routed_from_csr(a, max_slot_ratio=99.0)
        ref = np.asarray(a @ jnp.asarray(x))
        assert _relerr(ra @ jnp.asarray(x), ref) < 1e-5

    def test_multi_column_x(self):
        a = uniform_random_csr(4_000, per_row=4, seed=5, dtype=np.float32)
        X = np.random.default_rng(3).standard_normal((4_000, 3)).astype(
            np.float32
        )
        ra = routed_from_csr(a, max_slot_ratio=99.0)
        ref = np.stack(
            [np.asarray(a @ jnp.asarray(X[:, j])) for j in range(3)], axis=1
        )
        assert _relerr(rmult(ra, jnp.asarray(X)), ref) < 1e-5

    def test_rectangular(self):
        rng = np.random.default_rng(11)
        n_rows, n_cols, nnz = 3_000, 7_000, 12_000
        r = rng.integers(0, n_rows, nnz)
        c = rng.integers(0, n_cols, nnz)
        key = r * n_cols + c
        _, idx = np.unique(key, return_index=True)
        r, c = r[idx], c[idx]
        v = rng.standard_normal(r.shape[0]).astype(np.float32)
        a = _csr_from_entries(r, c, v, (n_rows, n_cols))
        x = rng.standard_normal(n_cols).astype(np.float32)
        ref = np.asarray(rmult(a, jnp.asarray(x)))
        ra = routed_from_csr(a, max_slot_ratio=99.0)
        assert ra.shape == (n_rows, n_cols)
        assert _relerr(ra.rmult(jnp.asarray(x)), ref) < 1e-5

    def test_power_law_columns(self):
        # heavy column reuse: exercises duplicate-source claim sharing
        rng = np.random.default_rng(13)
        n, nnz = 6_000, 40_000
        r = rng.integers(0, n, nnz)
        c = (n * rng.random(nnz) ** 3).astype(np.int64)
        key = r * n + c
        _, idx = np.unique(key, return_index=True)
        r, c = r[idx], c[idx]
        v = rng.standard_normal(r.shape[0]).astype(np.float32)
        a = _csr_from_entries(r, c, v, (n, n))
        x = rng.standard_normal(n).astype(np.float32)
        ref = np.asarray(rmult(a, jnp.asarray(x)))
        ra = routed_from_csr(a, max_slot_ratio=99.0)
        assert _relerr(ra.rmult(jnp.asarray(x)), ref) < 1e-5

    @pytest.mark.parametrize("window_f", [4, 8, 16])
    def test_window_widths(self, window_f):
        a = uniform_random_csr(8_000, per_row=5, seed=9, dtype=np.float32)
        x = np.random.default_rng(4).standard_normal(8_000).astype(np.float32)
        ref = np.asarray(rmult(a, jnp.asarray(x)))
        ra = routed_from_csr(a, window_f=window_f, max_slot_ratio=99.0)
        assert _relerr(ra.rmult(jnp.asarray(x)), ref) < 1e-5

    @pytest.mark.slow
    def test_fuzz_small(self):
        rng = np.random.default_rng(0)
        for trial in range(6):
            n = int(rng.integers(300, 4_000))
            nnz = int(rng.integers(n, 6 * n))
            r = rng.integers(0, n, nnz)
            c = rng.integers(0, n, nnz)
            key = r * n + c
            _, idx = np.unique(key, return_index=True)
            v = rng.standard_normal(idx.shape[0]).astype(np.float32)
            a = _csr_from_entries(r[idx], c[idx], v, (n, n))
            x = rng.standard_normal(n).astype(np.float32)
            ref = np.asarray(rmult(a, jnp.asarray(x)))
            ra = routed_from_csr(a, max_slot_ratio=99.0)
            assert _relerr(ra.rmult(jnp.asarray(x)), ref) < 1e-5, trial


class TestRoutedContract:
    def test_try_returns_none_over_cap(self):
        a = uniform_random_csr(3_000, per_row=2, seed=1, dtype=np.float32)
        assert try_routed_from_csr(a, max_slot_ratio=1.0) is None

    def test_slot_ratio_reported(self):
        a = uniform_random_csr(20_000, per_row=5, seed=7, dtype=np.float32)
        ra = routed_from_csr(a, max_slot_ratio=99.0)
        total = sum(p.out_len for p in ra.passes) + ra.final.n_vregs * 1024
        assert abs(ra.slot_ratio - total / a.nnz) < 1e-9

    def test_solver_integration(self):
        # routed matrix drives CG end-to-end (diagonally dominant SPD)
        from sparse_matrix_math_tpu.solvers.cg import cg

        rng = np.random.default_rng(21)
        n, per = 4_000, 3
        r = np.repeat(np.arange(n), per)
        c = rng.integers(0, n, n * per)
        key = np.minimum(r, c) * n + np.maximum(r, c)
        _, idx = np.unique(key, return_index=True)
        ru, cu = r[idx], c[idx]
        off = ru != cu
        ru, cu = ru[off], cu[off]
        v = rng.standard_normal(ru.shape[0]).astype(np.float32) * 0.1
        rr = np.concatenate([ru, cu, np.arange(n)])
        cc = np.concatenate([cu, ru, np.arange(n)])
        vv = np.concatenate([v, v, np.full(n, 4.0, np.float32)])
        a = _csr_from_entries(rr, cc, vv, (n, n))
        ra = routed_from_csr(a, max_slot_ratio=99.0)
        x_true = rng.standard_normal(n).astype(np.float32)
        b = np.asarray(a @ jnp.asarray(x_true))
        res = cg(ra, jnp.asarray(b), epsilon=1e-5, max_iterations=500)
        assert int(res.status) == 0
        assert _relerr(res.x, x_true) < 1e-3


class TestNativePackerParity:
    """smm_stream_pack_cf must reproduce the NumPy closed-form packer
    EXACTLY (same rows/lanes/plane contents), not just validly — the
    NumPy version is the executable specification."""

    @pytest.mark.parametrize(
        "gen",
        [
            lambda: uniform_random_csr(50_000, per_row=5, dtype=np.float32),
            lambda: uniform_random_csr(20_000, per_row=17, dtype=np.float32),
        ],
        ids=["rand50k", "rand20k_dense"],
    )
    def test_exact_layout_parity(self, gen, monkeypatch):
        import sparse_matrix_math_tpu.native as native

        if not native.available():
            pytest.skip("native library unavailable")
        csr = gen()
        nat = routed_from_csr(csr, max_slot_ratio=999.0)
        monkeypatch.setattr(
            native, "stream_pack_cf_native", lambda *a, **k: None
        )
        ref = routed_from_csr(csr, max_slot_ratio=999.0)
        assert len(nat.passes) == len(ref.passes)
        assert nat.slot_ratio == ref.slot_ratio
        for i, (pn, pr) in enumerate(zip(nat.passes, ref.passes)):
            assert (pn.x_rows, pn.window_f) == (pr.x_rows, pr.window_f)
            np.testing.assert_array_equal(
                np.asarray(pn.vals), np.asarray(pr.vals), err_msg=f"pass{i}"
            )
            np.testing.assert_array_equal(
                np.asarray(pn.meta), np.asarray(pr.meta), err_msg=f"pass{i}"
            )
            np.testing.assert_array_equal(
                np.asarray(pn.base), np.asarray(pr.base), err_msg=f"pass{i}"
            )
        np.testing.assert_array_equal(
            np.asarray(nat.final.vals), np.asarray(ref.final.vals)
        )
        np.testing.assert_array_equal(
            np.asarray(nat.final.meta), np.asarray(ref.final.meta)
        )


@pytest.mark.slow
def test_hbm_streamed_table_parity():
    """stream_gather's HBM window-DMA variant must match the
    VMEM-resident path exactly on every pass of a routed chain."""
    from sparse_matrix_math_tpu.ops.pallas_rsell import stream_gather
    from sparse_matrix_math_tpu.ops.pallas_wsell import wsell_spmv

    a = uniform_random_csr(30_000, per_row=5, dtype=np.float32)
    ra = routed_from_csr(a, max_slot_ratio=99.0)
    rng = np.random.default_rng(11)
    t_v = jnp.asarray(rng.standard_normal(a.shape[1]).astype(np.float32))
    t_h = t_v
    for p in ra.passes:
        kw = dict(x_rows=p.x_rows, window_f=p.window_f, interpret=True)
        t_v = stream_gather(p.base, p.meta, p.vals, t_v, **kw)
        t_h = stream_gather(p.base, p.meta, p.vals, t_h, force_hbm=True,
                            **kw)
        np.testing.assert_array_equal(np.asarray(t_h), np.asarray(t_v))
    y_v = wsell_spmv(ra.final, t_v, interpret=True)
    y_h = wsell_spmv(ra.final, t_h, interpret=True, force_hbm=True)
    np.testing.assert_array_equal(np.asarray(y_h), np.asarray(y_v))
