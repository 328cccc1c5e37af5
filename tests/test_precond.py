"""Preconditioner correctness + preconditioned-solver convergence.

Mirrors the reference tests: IC0 apply on a hand-computed 5x5 SPD system
(test/cpp/cg.cpp:28-60), PCG+IC0 on the mesh suite (cg.cpp:62-84), and
SGS-preconditioned BiCGStab (bicgstab.cpp:145-167).  Adds coverage the
reference lacks (SURVEY §4 holes): ILU0 (reference's is broken), Jacobi,
non-SPD rejection, approximate (Jacobi-sweep) triangular solves.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_math_tpu import (
    FactorizationError,
    SolverStatus,
    bicgstab,
    cg,
    csr_from_dense,
    get_preconditioner,
    load_matrix_csr,
)
from sparse_matrix_math_tpu.precond import (
    IC0Preconditioner,
    IdentityPreconditioner,
    ILU0Preconditioner,
    JacobiPreconditioner,
    SGSPreconditioner,
)
from sparse_matrix_math_tpu.utils import poisson_2d
from conftest import MESH_MATRICES, SHERMAN1, asset_path, inf_eps, l2_eps


@pytest.fixture
def spd5():
    # small SPD system in the spirit of the reference's hand-computed 5x5
    # IC0 check (test/cpp/cg.cpp:28-60)
    dense = np.array(
        [
            [4.0, 1.0, 0.0, 0.0, 1.0],
            [1.0, 5.0, 2.0, 0.0, 0.0],
            [0.0, 2.0, 6.0, 1.0, 0.0],
            [0.0, 0.0, 1.0, 4.0, 1.0],
            [1.0, 0.0, 0.0, 1.0, 3.0],
        ]
    )
    return dense, csr_from_dense(dense)


def test_identity_apply():
    m = IdentityPreconditioner()
    r = jnp.asarray([1.0, -2.0, 3.0])
    np.testing.assert_array_equal(np.asarray(m.apply(r)), np.asarray(r))


def test_jacobi_apply(spd5):
    dense, a = spd5
    m = JacobiPreconditioner.from_matrix(a)
    r = jnp.asarray(np.arange(1.0, 6.0))
    np.testing.assert_allclose(
        np.asarray(m.apply(r)), np.arange(1.0, 6.0) / np.diag(dense)
    )


def test_sgs_apply_matches_dense_formula(spd5):
    dense, a = spd5
    m = SGSPreconditioner.from_matrix(a)
    d = np.diag(np.diag(dense))
    msgs = (np.tril(dense)) @ np.linalg.inv(d) @ (np.triu(dense))
    r = np.linspace(-1, 1, 5)
    np.testing.assert_allclose(
        np.asarray(m.apply(jnp.asarray(r))), np.linalg.solve(msgs, r), rtol=1e-10
    )


def test_ic0_apply_is_exact_cholesky_solve_when_pattern_full(spd5):
    dense, a = spd5
    m = IC0Preconditioner.from_matrix(a)
    ld = np.asarray(m.lower.dense)
    r = np.arange(1.0, 6.0)
    np.testing.assert_allclose(
        np.asarray(m.apply(jnp.asarray(r))),
        np.linalg.solve(ld @ ld.T, r),
        rtol=1e-10,
    )
    # IC0 identity: L L^T == A on the pattern of A
    prod = ld @ ld.T
    mask = dense != 0
    np.testing.assert_allclose(prod[mask], dense[mask], rtol=1e-10)


def test_ilu0_factor_matches_pattern(spd5):
    dense, a = spd5
    m = ILU0Preconditioner.from_matrix(a)
    lu = np.asarray(m.lower.dense) @ np.asarray(m.upper.dense)
    mask = dense != 0
    np.testing.assert_allclose(lu[mask], dense[mask], rtol=1e-10)


def test_ic0_rejects_non_spd():
    # reference silently NaNs on non-SPD under NDEBUG (h:1879); we raise
    dense = np.array([[1.0, 4.0], [4.0, 1.0]])  # indefinite
    with pytest.raises(FactorizationError):
        IC0Preconditioner.from_matrix(csr_from_dense(dense))


def test_ic0_rejects_sherman1():
    a = load_matrix_csr(asset_path(SHERMAN1))
    with pytest.raises(FactorizationError):
        IC0Preconditioner.from_matrix(a)


def test_sgs_rejects_tiny_diagonal():
    dense = np.array([[1e-7, 1.0], [1.0, 2.0]])
    with pytest.raises(FactorizationError):
        SGSPreconditioner.from_matrix(csr_from_dense(dense))


@pytest.mark.parametrize("kind", ["jacobi", "sgs", "ilu0", "ic0"])
def test_pcg_converges_mesh_suite(kind, dtype):
    a = load_matrix_csr(asset_path(MESH_MATRICES[0]), dtype=dtype)
    ones = jnp.ones(a.shape[0], dtype=dtype)
    b = a @ ones
    m = get_preconditioner(a, kind)
    res = cg(a, b, epsilon=l2_eps(dtype), preconditioner=m)
    assert res.status_enum() == SolverStatus.SUCCESS
    assert float(jnp.max(jnp.abs(res.x - 1.0))) <= inf_eps(dtype) * 10


def test_pcg_ic0_iteration_parity_mesh1e1():
    # BASELINE.md: PCG+IC0 on mesh1e1 = 8 iterations (vs CG's 21)
    a = load_matrix_csr(asset_path(MESH_MATRICES[0]))
    b = a @ jnp.ones(a.shape[0], dtype=jnp.float64)
    m = get_preconditioner(a, "ic0")
    res = cg(a, b, epsilon=1e-8, preconditioner=m)
    assert abs(int(res.iterations) - 8) <= 2


def test_bicgstab_sgs_parity_mesh1e1():
    # BASELINE.md: BiCGStab+SGS on mesh1e1 = 5 iterations
    a = load_matrix_csr(asset_path(MESH_MATRICES[0]))
    b = a @ jnp.ones(a.shape[0], dtype=jnp.float64)
    m = get_preconditioner(a, "sgs")
    res = bicgstab(a, b, epsilon=1e-8, preconditioner=m)
    assert res.status_enum() == SolverStatus.SUCCESS
    assert abs(int(res.iterations) - 5) <= 2


def test_bicgstab_sgs_sherman1():
    # BASELINE.md: BiCGStab+SGS on sherman1 = 83 iterations
    a = load_matrix_csr(asset_path(SHERMAN1))
    b = a @ jnp.ones(a.shape[0], dtype=jnp.float64)
    m = get_preconditioner(a, "sgs")
    res = bicgstab(a, b, epsilon=1e-8, preconditioner=m)
    assert res.status_enum() == SolverStatus.SUCCESS
    assert int(res.iterations) <= 120


def test_jacobi_sweep_trisolve_exact():
    # sweeps="exact" must reproduce the dense solve exactly (nilpotency)
    a = poisson_2d(6, 6)
    for kind in ("sgs", "ic0", "ilu0"):
        md = get_preconditioner(a, kind, method="dense")
        mj = get_preconditioner(a, kind, method="jacobi", sweeps="exact")
        r = jnp.asarray(np.random.default_rng(0).normal(size=36))
        np.testing.assert_allclose(
            np.asarray(mj.apply(r)), np.asarray(md.apply(r)), rtol=1e-10
        )


def test_approximate_trisolve_still_preconditions():
    # few-sweep approximate triangular solve: PCG must still converge
    a = poisson_2d(10, 10)
    b = a @ jnp.ones(100, dtype=jnp.float64)
    m = get_preconditioner(a, "ic0", method="jacobi", sweeps=4)
    res = cg(a, b, epsilon=1e-8, preconditioner=m)
    assert res.status_enum() == SolverStatus.SUCCESS


def test_factory_parity_spellings():
    a = poisson_2d(4, 4)
    # the reference enum misspells SYMMETRIC_GAUS_SEIDEL (h:1002-1006)
    m1 = get_preconditioner(a, "symmetric_gaus_seidel")
    m2 = get_preconditioner(a, "symmetric_gauss_seidel")
    assert type(m1) is type(m2) is SGSPreconditioner
    assert isinstance(get_preconditioner(a, "none"), IdentityPreconditioner)


class TestPaddedSGS:
    """PaddedSGS (precond/padded_sgs.py): the padded-DIA-domain SGS whose
    truncated-sweep apply must match the generic CSR-based
    SGSPreconditioner with the same sweep count bit-for-... well, to
    float tolerance (same math, different layout/kernel)."""

    def _dia(self, nx=12, dtype=np.float64):
        from sparse_matrix_math_tpu.formats.dia import dia_from_csr

        a = poisson_2d(nx, dtype=dtype)
        return a, dia_from_csr(a)

    @pytest.mark.parametrize("sweeps", [1, 2, 4])
    def test_apply_matches_generic_sgs(self, sweeps):
        from sparse_matrix_math_tpu.precond import PaddedSGS

        a, dia = self._dia()
        generic = get_preconditioner(a, "sgs", method="jacobi", sweeps=sweeps)
        padded = PaddedSGS.from_dia(dia, sweeps=sweeps)
        r = jnp.asarray(
            np.random.default_rng(1).normal(size=a.shape[0])
        )
        np.testing.assert_allclose(
            np.asarray(padded.apply(r)),
            np.asarray(generic.apply(r)),
            rtol=1e-12, atol=1e-12,
        )

    def test_padded_layout_roundtrip_zero_padding(self):
        from sparse_matrix_math_tpu.precond import PaddedSGS

        _, dia = self._dia(9)
        p = PaddedSGS.from_dia(dia, sweeps=2)
        ref = p.p_lower
        r = jnp.asarray(np.random.default_rng(2).normal(size=dia.shape[0]))
        rp = ref.to_padded(r)
        zp = p.apply_padded(rp, resident=True, interpret=True)
        # padding regions must remain exactly zero through the apply
        mask = np.asarray(ref.to_padded(jnp.ones_like(r)))
        np.testing.assert_array_equal(np.asarray(zp)[mask == 0], 0.0)

    def test_requires_diagonal(self):
        from sparse_matrix_math_tpu.formats.dia import DIAMatrix
        from sparse_matrix_math_tpu.precond import PaddedSGS

        off_diag = DIAMatrix(
            diags=jnp.ones((1, 8)), offsets=(1,), shape=(8, 8), nnz=7
        )
        with pytest.raises(FactorizationError):
            PaddedSGS.from_dia(off_diag, sweeps=2)

    def test_pure_diagonal_matrix(self):
        from sparse_matrix_math_tpu.formats.dia import DIAMatrix
        from sparse_matrix_math_tpu.precond import PaddedSGS

        d = jnp.asarray(np.linspace(1.0, 2.0, 8))
        a = DIAMatrix(diags=d[None, :], offsets=(0,), shape=(8, 8), nnz=8)
        p = PaddedSGS.from_dia(a, sweeps=3)
        r = jnp.asarray(np.random.default_rng(3).normal(size=8))
        np.testing.assert_allclose(
            np.asarray(p.apply(r)), np.asarray(r / d), rtol=1e-12
        )


def test_exact_deep_sweeps_warns():
    # a 200-deep bidiagonal chain: sweeps="exact" must warn that the
    # apply costs depth SpMVs (VERDICT weak #8: silent exactness trap)
    import warnings

    n = 200
    d = np.diag(np.full(n, 2.0)) + np.diag(np.full(n - 1, -1.0), -1)
    a = csr_from_dense(d)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        get_preconditioner(a, "sgs", method="jacobi", sweeps="exact")
    assert any("practically unusable" in str(x.message) for x in w)
    # explicit sweep counts stay silent (and skip the depth scan)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m = get_preconditioner(a, "sgs", method="jacobi", sweeps=4)
    assert not any("practically unusable" in str(x.message) for x in w)
    assert m.fwd.depth == -1  # not computed


class TestChebyshevPreconditioner:
    """Polynomial preconditioning (precond/cheby_poly.py) — TPU-native
    addition: the apply is k SpMVs with A itself."""

    def test_apply_approximates_inverse(self):
        a = poisson_2d(12)
        m = get_preconditioner(a, "chebyshev", degree=24)
        r = jnp.asarray(np.random.default_rng(0).normal(size=a.shape[0]))
        z = m.apply(r)
        # p_k(A) r ~= A^{-1} r: the preconditioned residual must shrink a lot
        res = np.linalg.norm(np.asarray(a @ z - r)) / np.linalg.norm(
            np.asarray(r)
        )
        assert res < 0.15

    def test_pcg_converges_faster(self):
        a = poisson_2d(24)
        n = a.shape[0]
        b = a @ jnp.ones(n, jnp.float64)
        plain = cg(a, b, epsilon=1e-10)
        m = get_preconditioner(a, "cheby", degree=8)
        pre = cg(a, b, epsilon=1e-10, preconditioner=m)
        assert pre.status_enum() == SolverStatus.SUCCESS
        np.testing.assert_allclose(np.asarray(pre.x), 1.0, atol=1e-7)
        # polynomial preconditioning trades matvecs for iterations (and
        # hence dots/axpys); a degree-8 polynomial roughly halves the
        # outer iteration count at this conditioning
        assert int(pre.iterations) < int(plain.iterations)

    def test_linear_operator(self):
        # the fixed-step apply must be LINEAR (required for CG theory)
        a = poisson_2d(8)
        m = get_preconditioner(a, "cheby", degree=5)
        rng = np.random.default_rng(1)
        u = jnp.asarray(rng.normal(size=a.shape[0]))
        v = jnp.asarray(rng.normal(size=a.shape[0]))
        lhs = np.asarray(m.apply(2.5 * u - 1.25 * v))
        rhs = 2.5 * np.asarray(m.apply(u)) - 1.25 * np.asarray(m.apply(v))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-10, atol=1e-12)


class TestFusedSGSApply:
    """ops/pallas_trisweep.py: the fused halo-deep-sweep SGS apply must
    match the compositional padded apply exactly (same math, one kernel)."""

    @pytest.mark.parametrize("sweeps", [2, 4])
    def test_matches_compositional(self, sweeps):
        from sparse_matrix_math_tpu.formats.dia import dia_from_csr
        from sparse_matrix_math_tpu.ops.pallas_trisweep import sgs_apply_fused
        from sparse_matrix_math_tpu.precond import PaddedSGS

        a = poisson_2d(40, dtype=np.float32)  # big enough for > 1 window
        dia = dia_from_csr(a)
        p = PaddedSGS.from_dia(dia, sweeps=sweeps)
        ref_layout = p.p_lower
        r = ref_layout.to_padded(
            jnp.asarray(
                np.random.default_rng(0)
                .standard_normal(a.shape[0])
                .astype(np.float32)
            )
        )
        want = p.apply_padded(r, resident=True, interpret=True)
        got = sgs_apply_fused(p, r, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def test_small_matrix_fallback(self):
        from sparse_matrix_math_tpu.formats.dia import dia_from_csr
        from sparse_matrix_math_tpu.ops.pallas_trisweep import sgs_apply_fused
        from sparse_matrix_math_tpu.precond import PaddedSGS

        a = poisson_2d(6, dtype=np.float64)
        dia = dia_from_csr(a)
        p = PaddedSGS.from_dia(dia, sweeps=3)
        r = p.p_lower.to_padded(jnp.ones(a.shape[0], jnp.float64))
        want = p.apply_padded(r, resident=True, interpret=True)
        got = sgs_apply_fused(p, r, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)

    def test_no_subdiagonal_matrix(self):
        """Regression (round-2 review): a DIA matrix with no sub-diagonal
        used to get a padded layout with no leading guard block, so the
        fused kernel's first window rows were REAL rows that never
        received sweep updates — silently wrong first ~1024 entries."""
        import jax.numpy as jnp

        from sparse_matrix_math_tpu.formats.dia import DIAMatrix
        from sparse_matrix_math_tpu.ops.pallas_trisweep import sgs_apply_fused
        from sparse_matrix_math_tpu.precond import PaddedSGS

        n = 200_000
        rng = np.random.default_rng(0)
        diags = jnp.asarray(
            np.stack([
                rng.uniform(2.0, 3.0, n),          # main
                rng.uniform(-1.0, -0.5, n),        # +1 super-diagonal
            ]).astype(np.float32)
        )
        a = DIAMatrix(diags=diags, offsets=(0, 1), shape=(n, n), nnz=2 * n - 1)
        p = PaddedSGS.from_dia(a, sweeps=4)
        ref_layout = p.p_upper
        r = ref_layout.to_padded(
            jnp.asarray(rng.standard_normal(n).astype(np.float32))
        )
        want = p.apply_padded(r, resident=True, interpret=True)
        got = sgs_apply_fused(p, r, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


class TestPaddedTriPair:
    """IC0/ILU0 factor pairs in the padded DIA domain
    (precond/padded_tri.py + ops/pallas_trisweep.py tri_pair_apply_fused)."""

    def _setup(self, kind, sweeps=4, nx=40):
        from sparse_matrix_math_tpu.formats.dia import dia_from_csr
        from sparse_matrix_math_tpu.precond import PaddedTriPair

        a = poisson_2d(nx, dtype=np.float32)
        dia = dia_from_csr(a)
        pre = get_preconditioner(a, kind, method="jacobi", sweeps=sweeps)
        pair = PaddedTriPair.from_factors(pre.lower, pre.upper, dia)
        return a, dia, pre, pair

    @pytest.mark.parametrize("kind", ["ic0", "ilu0"])
    def test_fused_matches_compositional_and_generic(self, kind):
        a, dia, pre, pair = self._setup(kind)
        ref = pair.p_lower if pair.p_lower is not None else pair.p_upper
        r1 = jnp.asarray(
            np.random.default_rng(0).standard_normal(a.shape[0]).astype(np.float32)
        )
        rp = ref.to_padded(r1)
        comp = pair.apply_padded_compositional(rp, interpret=True)
        fused = pair.apply_padded(rp, interpret=True)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(comp), rtol=2e-5, atol=2e-5
        )
        # and the padded apply must match the GENERIC trisolve apply
        got = ref.from_padded(fused)
        want = pre.apply(r1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    def test_pcg_ic0_padded_converges(self):
        a, dia, pre, pair = self._setup("ic0", sweeps=8, nx=24)
        b = a @ jnp.ones(a.shape[0], jnp.float32)
        res = cg(a, b, epsilon=1e-5, preconditioner=pre)
        assert res.status_enum() == SolverStatus.SUCCESS


class TestWSellStrictLayout:
    """Jacobi-sweep triangular applies with the strict part in the
    W-SELL Pallas layout (general-pattern production path) must match
    the take/segment_sum strict SpMV bit-for-logic."""

    @pytest.mark.parametrize("kind", ["sgs", "ic0", "ilu0"])
    def test_apply_matches_csr_strict(self, kind):
        # dense enough strict pattern that the W-SELL slot-ratio cap
        # accepts it (poisson_2d 48x48 -> n=2304, ~2 strict nnz/row/side)
        a = poisson_2d(48, dtype=np.float32)
        pre_ws = get_preconditioner(
            a, kind, method="jacobi", sweeps=4, strict_layout="wsell"
        )
        pre_cs = get_preconditioner(
            a, kind, method="jacobi", sweeps=4, strict_layout="csr"
        )
        tri = pre_ws.fwd if kind == "sgs" else pre_ws.lower
        assert tri.wsell is not None, "strict pattern should pack"
        r = jnp.asarray(
            np.random.default_rng(1).standard_normal(a.shape[0]).astype(
                np.float32
            )
        )
        np.testing.assert_allclose(
            np.asarray(pre_ws.apply(r)), np.asarray(pre_cs.apply(r)),
            rtol=2e-5, atol=2e-5,
        )

    @pytest.mark.slow
    def test_apply_matches_panel(self):
        a = poisson_2d(48, dtype=np.float32)
        pre = get_preconditioner(
            a, "sgs", method="jacobi", sweeps=3, strict_layout="wsell"
        )
        r = jnp.asarray(
            np.random.default_rng(2).standard_normal(
                (a.shape[0], 3)
            ).astype(np.float32)
        )
        cols = jnp.stack([pre.apply(r[:, j]) for j in range(3)], axis=1)
        np.testing.assert_allclose(
            np.asarray(pre.apply(r)), np.asarray(cols), rtol=2e-5, atol=2e-5
        )

    def test_pcg_sgs_wsell_converges(self):
        a = poisson_2d(40, dtype=np.float32)
        pre = get_preconditioner(
            a, "sgs", method="jacobi", sweeps=6, strict_layout="wsell"
        )
        b = a @ jnp.ones(a.shape[0], jnp.float32)
        res = cg(a, b, epsilon=1e-5, preconditioner=pre)
        assert res.status_enum() == SolverStatus.SUCCESS
        assert float(jnp.max(jnp.abs(res.x - 1.0))) < 1e-3


class TestIlu0PivotShift:
    """Data-dependent zero pivots (VERDICT r4 #6): ILU(0) elimination can
    hit an exact or near-zero pivot on a perfectly nonsingular matrix.
    from_matrix escalates through diagonal shifts (A + alpha*I,
    Manteuffel-style) and reports the applied shift; pivot_shift='never'
    restores the strict raise."""

    # u22 = 4 - (2/1)*2 = 0 during elimination, but det(A) = -1
    ZERO_PIVOT = np.array([
        [1.0, 2.0, 0.0],
        [2.0, 4.0, 1.0],
        [0.0, 1.0, 3.0],
    ])

    def test_shifted_factorization_and_convergence(self):
        a = csr_from_dense(self.ZERO_PIVOT)
        pre = ILU0Preconditioner.from_matrix(a)
        assert pre.shift > 0.0
        b = jnp.asarray(self.ZERO_PIVOT @ np.ones(3))
        res = bicgstab(
            a, b, epsilon=1e-10, max_iterations=100, preconditioner=pre
        )
        assert res.status_enum() == SolverStatus.SUCCESS
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-7)

    def test_never_mode_raises(self):
        a = csr_from_dense(self.ZERO_PIVOT)
        with pytest.raises(FactorizationError, match="pivot"):
            ILU0Preconditioner.from_matrix(a, pivot_shift="never")

    def test_healthy_matrix_unshifted(self):
        pre = ILU0Preconditioner.from_matrix(poisson_2d(16, dtype=np.float64))
        assert pre.shift == 0.0

    def test_jittered_tiled_sherman1_factors(self):
        """The exact system class the round-4 bench had to curate around
        (BENCH_NOTES 'jittered values break ILU0'): jittered tiled
        sherman1 hits a data-dependent zero pivot unshifted; the
        escalation factors it with a finite, bounded factor."""
        from sparse_matrix_math_tpu.precond._factorize import (
            ilu0_factorize_host,
        )
        from sparse_matrix_math_tpu.utils.generate import sherman1_tiled

        a = sherman1_tiled(4, jitter=True, dtype=np.float64)
        data = np.asarray(a.data, np.float64)
        ind = np.asarray(a.indices, np.int64)
        ptr = np.asarray(a.indptr, np.int64)
        pre = ILU0Preconditioner.from_matrix(a, method="jacobi", sweeps=6)
        assert np.isfinite(pre.shift)
        # the factor the apply uses is finite everywhere
        r = jnp.asarray(np.random.default_rng(0).standard_normal(a.shape[0]))
        assert bool(jnp.all(jnp.isfinite(pre.apply(r))))
