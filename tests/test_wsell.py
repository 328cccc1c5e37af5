"""W-SELL general-format correctness (formats/wsell.py, ops/pallas_wsell.py).

The build-time colouring + two-step-gather kernel must reproduce the CSR
reference SpMV exactly for every pattern class: diagonal-structured,
banded, banded-broken (random perturbations), moderately random, empty
slabs, and the reference's own sherman1 matrix.  Kernels run in interpret
mode on CPU (same code path the TPU hardware suite compiles for real).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_math_tpu.formats.csr import CSRMatrix, csr_from_dense
from sparse_matrix_math_tpu.formats.wsell import (
    WSellMatrix,
    try_wsell_from_csr,
    wsell_from_csr,
)
from sparse_matrix_math_tpu.io import load_matrix_csr
from sparse_matrix_math_tpu.ops.spmv import rmult
from sparse_matrix_math_tpu.utils.generate import poisson_2d

ASSETS = "/root/reference/test/assets"


def _check(csr: CSRMatrix, seed=0, atol=1e-5):
    ws = wsell_from_csr(csr)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(csr.shape[1]).astype(np.float32))
    want = np.asarray(rmult(csr, x))
    got = np.asarray(rmult(ws, x))
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)
    return ws


class TestWSellCorrectness:
    def test_tridiagonal(self):
        n = 300
        d = np.zeros((n, n), np.float32)
        i = np.arange(n)
        d[i, i] = 2.0
        d[i[:-1], i[:-1] + 1] = -1.0
        d[i[1:], i[1:] - 1] = -1.0
        ws = _check(csr_from_dense(d))
        # at n=300 the floor is vreg quantisation + the static-target
        # layout's empty buckets (rows only span t=0..2 of one slab)
        assert ws.slot_ratio < 4.5

    def test_tridiagonal_packing_at_scale(self):
        # full slabs: diagonal structure colours near-perfectly (one slot
        # row per diagonal per bucket) — the padding floor is ~K/deg
        n = 4096
        d = np.zeros((n, n), np.float32)
        i = np.arange(n)
        d[i, i] = 2.0
        d[i[:-1], i[:-1] + 1] = -1.0
        d[i[1:], i[1:] - 1] = -1.0
        ws = wsell_from_csr(csr_from_dense(d))
        assert ws.slot_ratio < 1.8

    def test_poisson2d(self):
        a = poisson_2d(40, dtype=np.float32)  # n=1600, crosses slab bounds
        ws = _check(a)
        assert ws.slot_ratio < 3.0

    def test_banded_broken(self):
        # banded + random long-range perturbations ("banded-broken random")
        rng = np.random.default_rng(3)
        n = 2100
        rows, cols = [], []
        i = np.arange(n)
        for off in (-7, -1, 0, 1, 7):
            r = i[(i + off >= 0) & (i + off < n)]
            rows.append(r)
            cols.append(r + off)
        nr = rng.integers(0, n, 400)
        nc = rng.integers(0, n, 400)
        rows.append(nr)
        cols.append(nc)
        r = np.concatenate(rows)
        c = np.concatenate(cols)
        keep = np.unique(np.stack([r, c], 1), axis=0)
        d = np.zeros((n, n), np.float32)
        d[keep[:, 0], keep[:, 1]] = rng.standard_normal(keep.shape[0])
        _check(csr_from_dense(d))

    def test_random_moderate_density(self):
        rng = np.random.default_rng(7)
        n = 900
        d = (rng.random((n, n)) < 0.02).astype(np.float32)
        d *= rng.standard_normal((n, n)).astype(np.float32)
        _check(csr_from_dense(d))

    def test_empty_rows_and_slabs(self):
        # nnz confined to the first rows: later slabs must still emit zeros
        # (slot_ratio is astronomical for 3 nnz — lift the cap, this test
        # is about dummy-slab zero-fill, not packing)
        d = np.zeros((2500, 2500), np.float32)
        d[3, 5] = 2.5
        d[0, 0] = 1.0
        d[4, 2400] = -1.5  # far window
        csr = csr_from_dense(d)
        ws = wsell_from_csr(csr, max_slot_ratio=1e9)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(2500).astype(np.float32)
        )
        np.testing.assert_allclose(
            np.asarray(rmult(ws, x)), np.asarray(rmult(csr, x)),
            atol=1e-5, rtol=1e-4,
        )

    def test_rectangular(self):
        rng = np.random.default_rng(11)
        d = np.zeros((700, 1500), np.float32)
        m = rng.random((700, 1500)) < 0.01
        d[m] = rng.standard_normal(int(m.sum()))
        _check(csr_from_dense(d))

    def test_sherman1(self):
        a = load_matrix_csr(f"{ASSETS}/sherman1_1000_1000_2375.mtx")
        ws = _check(a.astype(jnp.float32))
        assert ws.slot_ratio < 4.0

    def test_duplicate_column_reads(self):
        # many rows reading the same column (dense column) — equal-c slots
        # may share a slot row; colouring must still terminate and be exact
        n = 400
        d = np.zeros((n, n), np.float32)
        d[:, 7] = 1.5
        d[np.arange(n), np.arange(n)] = 2.0
        _check(csr_from_dense(d))

    def test_spmm_columns(self):
        a = poisson_2d(16, dtype=np.float32)
        ws = wsell_from_csr(a)
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.standard_normal((a.shape[1], 3)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(rmult(ws, X)), np.asarray(rmult(a, X)),
            atol=1e-5, rtol=1e-4,
        )

    def test_spmm_kernel_tiles_over_call_cap(self):
        """k=10 > the 8-RHS per-call cap: the SpMM kernel must tile
        across calls and match the CSR result column-for-column."""
        from sparse_matrix_math_tpu.ops.pallas_wsell import wsell_spmm

        a = poisson_2d(20, dtype=np.float32)
        ws = wsell_from_csr(a)
        rng = np.random.default_rng(1)
        X = jnp.asarray(
            rng.standard_normal((a.shape[1], 10)).astype(np.float32)
        )
        got = wsell_spmm(ws, X, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(rmult(a, X)), atol=1e-5, rtol=1e-4
        )

    def test_spmm_rejects_1d(self):
        from sparse_matrix_math_tpu.ops.pallas_wsell import wsell_spmm

        ws = wsell_from_csr(poisson_2d(16, dtype=np.float32))
        with pytest.raises(ValueError):
            wsell_spmm(ws, jnp.ones(256), interpret=True)

    def test_refusal_on_tile_sparse(self):
        # uniform random, ~1 nnz per (slab, window) tile: must refuse
        rng = np.random.default_rng(13)
        n = 4000
        k = 500
        r = rng.integers(0, n, k)
        c = rng.integers(0, n, k)
        d = np.zeros((n, n), np.float32)
        d[r, c] = 1.0
        csr = csr_from_dense(d)
        assert try_wsell_from_csr(csr, max_slot_ratio=4.0) is None

    def test_solver_integration(self):
        a = poisson_2d(32, dtype=np.float32)
        ws = wsell_from_csr(a)
        import sparse_matrix_math_tpu as smm

        b = rmult(a, jnp.ones(a.shape[0], jnp.float32))
        res = smm.cg(ws, b, epsilon=1e-4)
        assert int(res.status) == 0
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-2)


class TestNonsymmetricSolvers:
    """Nonsymmetric (convection-diffusion) systems through the W-SELL
    operator: the nonsymmetric Krylov cores (BiCGStab/CGS) must produce
    the SAME iterates over W-SELL as over the CSR source — the format is
    an exact SpMV, so status, iteration count, and solution all match."""

    def _system(self):
        from sparse_matrix_math_tpu.utils.generate import (
            convection_diffusion_2d,
        )

        a = convection_diffusion_2d(24, cx=0.8, cy=0.3, dtype=np.float64)
        b = rmult(a, jnp.ones(a.shape[0], jnp.float64))
        return a, b

    def test_matrix_is_nonsymmetric(self):
        a, _ = self._system()
        d = np.asarray(a.to_dense())
        assert np.abs(d - d.T).max() > 0.1

    @pytest.mark.parametrize("method", ["bicgstab", "cgs"])
    def test_wsell_matches_csr(self, method):
        import sparse_matrix_math_tpu as smm

        a, b = self._system()
        ws = wsell_from_csr(a)
        ref = smm.solve(a, b, method=method, epsilon=1e-10)
        got = smm.solve(ws, b, method=method, epsilon=1e-10)
        assert int(got.status) == int(ref.status) == 0
        assert int(got.iterations) == int(ref.iterations)
        np.testing.assert_allclose(np.asarray(got.x), 1.0, atol=1e-7)

    def test_bicgstab_sgs_preconditioned(self):
        """SGS preconditioning is defined for any nonzero-diagonal matrix
        (reference h:2191-2283 applies it inside BiCGStab) — it must cut
        iterations on the nonsymmetric system too."""
        import sparse_matrix_math_tpu as smm

        a, b = self._system()
        plain = smm.solve(a, b, method="bicgstab", epsilon=1e-10)
        pre = smm.solve(a, b, method="bicgstab", preconditioner="sgs",
                        epsilon=1e-10)
        assert int(pre.status) == 0
        assert int(pre.iterations) < int(plain.iterations)
        np.testing.assert_allclose(np.asarray(pre.x), 1.0, atol=1e-7)

    @pytest.mark.slow
    def test_routed_bicgstab(self):
        """R-SELL is pattern-agnostic and exact — the nonsymmetric cores
        run over it unchanged."""
        import sparse_matrix_math_tpu as smm
        from sparse_matrix_math_tpu.formats.rsell import routed_from_csr

        a, b = self._system()
        ra = routed_from_csr(a, max_slot_ratio=99)
        got = smm.solve(ra, b.astype(jnp.float64), method="bicgstab",
                        epsilon=1e-8)
        assert int(got.status) == 0
        np.testing.assert_allclose(np.asarray(got.x), 1.0, atol=1e-5)


def test_best_format_selection():
    """formats.best_format: matrix-free grid stencil for
    constant-coefficient stencils (round 4), DIA for other diagonal
    patterns, W-SELL for banded-broken, CSR for tile-sparse patterns
    (the auto-selection contract)."""
    from sparse_matrix_math_tpu import best_format
    from sparse_matrix_math_tpu.formats.dia import DIAMatrix
    from sparse_matrix_math_tpu.formats.stencil import GridStencilMatrix
    from sparse_matrix_math_tpu.utils.generate import laplace_3d_jittered

    assert isinstance(
        best_format(poisson_2d(12, dtype=np.float32)), GridStencilMatrix
    )
    # same pattern, non-constant values: stays on DIA
    pv = poisson_2d(12, dtype=np.float32)
    data = np.asarray(pv.data).copy()
    data[7] *= 1.5
    import jax.numpy as jnp
    pv = pv.with_data(jnp.asarray(data))
    assert isinstance(best_format(pv), DIAMatrix)
    assert isinstance(
        best_format(laplace_3d_jittered(14, dtype=np.float32)), WSellMatrix
    )
    rng = np.random.default_rng(3)
    n = 4000
    d = np.zeros((n, n), np.float32)
    r = rng.integers(0, n, 400)
    c = rng.integers(0, n, 400)
    d[r, c] = 1.0
    sparse = csr_from_dense(d)
    assert isinstance(best_format(sparse), CSRMatrix)


@pytest.mark.slow
def test_uniform_random_routes():
    """Zero-locality pattern (docs/BENCH_NOTES 'entropy wall'): W-SELL
    must refuse (tile density ~nnz/n^2, reorder-invariant); best_format
    now falls through to the R-SELL routed chain at this scale (round-3
    upgrade — previously it surrendered to the XLA CSR path); the
    fallback CSR SpMV must still be exact."""
    from sparse_matrix_math_tpu import best_format
    from sparse_matrix_math_tpu.formats.rsell import RoutedMatrix
    from sparse_matrix_math_tpu.formats.wsell import try_wsell_from_csr
    from sparse_matrix_math_tpu.utils.generate import uniform_random_csr

    a = uniform_random_csr(20_000, per_row=5, seed=1, dtype=np.float32)
    assert try_wsell_from_csr(a) is None
    bf = best_format(a)
    assert isinstance(bf, RoutedMatrix)
    x = np.random.default_rng(0).standard_normal(a.shape[1]).astype(np.float32)
    y = np.asarray(a @ jnp.asarray(x))
    yd = np.asarray(a.to_dense()) @ x
    np.testing.assert_allclose(y, yd, rtol=2e-4, atol=2e-4)


def test_hbm_streamed_table_parity():
    """The HBM window-DMA kernel variant must produce bit-identical
    results to the VMEM-resident path (same windows, same selects)."""
    from sparse_matrix_math_tpu.formats.wsell import wsell_from_csr
    from sparse_matrix_math_tpu.ops.pallas_wsell import wsell_spmv

    a = poisson_2d(48, dtype=np.float32)
    ws = wsell_from_csr(a)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal(a.shape[1]).astype(np.float32))
    y_vmem = np.asarray(wsell_spmv(ws, x, interpret=True))
    y_hbm = np.asarray(wsell_spmv(ws, x, interpret=True, force_hbm=True))
    np.testing.assert_array_equal(y_hbm, y_vmem)


class TestBoundedReduction:
    """nway > 1 layouts (round 3): per-slot SHIFT routing replaces the
    static-target rule; slot_ratio drops toward the colouring bound
    (measured 4.01 -> 2.62 on the 17.5M jittered Laplacian for +37%
    SpMV throughput on hardware — docs/BENCH_NOTES.md)."""

    @pytest.mark.parametrize("nway", [2, 4, 8])
    def test_parity_scattered_pattern(self, nway):
        from sparse_matrix_math_tpu.ops.pallas_wsell import wsell_spmv
        from sparse_matrix_math_tpu.utils.generate import random_spd_csr

        a = random_spd_csr(600, density=0.012, seed=5, dtype=np.float32)
        w = wsell_from_csr(a, max_slot_ratio=64.0, nway=nway)
        w1 = wsell_from_csr(a, max_slot_ratio=64.0, nway=1)
        assert w.slot_ratio <= w1.slot_ratio + 1e-9
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal(a.shape[1]).astype(np.float32))
        y = np.asarray(wsell_spmv(w, x, interpret=True))
        y_ref = np.asarray(a.to_dense() @ x)
        np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)

    def test_try_wsell_defaults_to_nway4(self):
        from sparse_matrix_math_tpu.utils.generate import laplace_3d_jittered

        b = laplace_3d_jittered(16, dtype=np.float32, symmetric=True,
                                shift=0.25)
        w4 = try_wsell_from_csr(b)
        w1 = wsell_from_csr(b, nway=1)
        assert w4.nway == 4
        assert w4.slot_ratio < w1.slot_ratio

    def test_auto_bail_keeps_shiftless_layout_cheap(self):
        """When the placement can't cut >=10% of vregs the builder must
        come back as nway=1 (no rotation cost for nothing)."""
        # a fully dense slab x window tile: every bucket equally
        # loaded -> K identical under any nway
        rng = np.random.default_rng(0)
        n = 1024
        dense = np.zeros((n, n), np.float32)
        dense[:, :128] = rng.standard_normal((n, 128))
        a = csr_from_dense(dense)
        w = wsell_from_csr(a, max_slot_ratio=64.0, nway=4)
        assert w.nway == 1

    def test_spmm_routes_nway(self):
        from sparse_matrix_math_tpu.utils.generate import random_spd_csr
        from sparse_matrix_math_tpu.ops.pallas_wsell import wsell_spmm

        a = random_spd_csr(512, density=0.015, seed=7, dtype=np.float32)
        w = wsell_from_csr(a, max_slot_ratio=64.0, nway=4)
        rng = np.random.default_rng(3)
        xs = jnp.asarray(rng.standard_normal((a.shape[1], 3)).astype(np.float32))
        y = np.asarray(wsell_spmm(w, xs, interpret=True))
        y_ref = np.asarray(a.to_dense() @ xs)
        np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)
