"""cg_ir_df64: mixed-precision iterative refinement to the f64 contract.

The reference solves in ``double`` end-to-end at 1e-8
(include/sparse_matrix_math.h:2316; test/include/test_common.h:30-38).
``cg_ir_df64`` reaches that bar with f32 inner CG solves corrected by a
double-word true residual (solvers/ir_df64.py) — these tests check the
accuracy against host f64 oracles and the refinement-specific status
machinery (stall floor, iteration budgets, preconditioned inner solves).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_math_tpu import (
    JacobiPreconditioner,
    SolverStatus,
    cg_df64,
    cg_ir_df64,
    load_matrix_df,
    solve,
)
from sparse_matrix_math_tpu.ops import df32 as D
from sparse_matrix_math_tpu.solvers.df64 import DfSolveResult
from sparse_matrix_math_tpu.solvers.ir_df64 import hi_operator
from sparse_matrix_math_tpu.solvers.multigrid import PoissonMultigrid
from sparse_matrix_math_tpu.utils import poisson_2d
from conftest import MESH_MATRICES, asset_path


def _poisson_host(nx):
    a = poisson_2d(nx, dtype=np.float64)
    data = np.asarray(a.data, np.float64)
    indices = np.asarray(a.indices, np.int64)
    indptr = np.asarray(a.indptr, np.int64)
    return a, data, indices, indptr


def _csr_mv(data, indices, indptr, x):
    n = indptr.shape[0] - 1
    out = np.zeros(n)
    for r in range(n):
        s, e = indptr[r], indptr[r + 1]
        out[r] = np.dot(data[s:e], x[indices[s:e]])
    return out


def test_cg_ir_df64_poisson_1e10():
    """Past f32's floor: eps=1e-10 true residual on a 2-D Poisson, with
    the inner solves running plain f32."""
    a, data, indices, indptr = _poisson_host(48)
    n = a.shape[0]
    x_true = np.random.default_rng(0).standard_normal(n)
    b = _csr_mv(data, indices, indptr, x_true)
    dfa = D.DfEllMatrix.from_host_csr(data, indices, indptr, a.shape)
    res = cg_ir_df64(dfa, b, epsilon=1e-10)
    assert isinstance(res, DfSolveResult)
    assert res.status_enum() == SolverStatus.SUCCESS, res
    assert int(res.outer_rounds) >= 2  # genuinely refined, not one shot
    x = res.x_f64()
    true_res = b - _csr_mv(data, indices, indptr, x)
    assert np.linalg.norm(true_res) < 1e-9
    assert np.linalg.norm(x - x_true) / np.linalg.norm(x_true) < 1e-10


@pytest.mark.parametrize("matrix", MESH_MATRICES)
def test_cg_ir_df64_reference_assets_1e8(matrix):
    """The reference's f64 contract on its own assets (all-ones oracle,
    test_common.h:13-21), through the refinement path."""
    dfa = load_matrix_df(asset_path(matrix))
    n = dfa.shape[0]
    b64 = np.asarray(dfa.vals_hi, np.float64).sum(axis=1)[:n] + np.asarray(
        dfa.vals_lo, np.float64
    ).sum(axis=1)[:n]
    res = cg_ir_df64(dfa, b64, epsilon=1e-8)
    assert res.status_enum() == SolverStatus.SUCCESS, res
    x = res.x_f64()
    hi = np.asarray(dfa.vals_hi, np.float64)
    lo = np.asarray(dfa.vals_lo, np.float64)
    cols = np.asarray(dfa.cols)
    ax = ((hi + lo) * x[cols]).sum(axis=1)[:n]
    assert np.linalg.norm(b64 - ax) <= 2e-8
    assert np.max(np.abs(x - 1.0)) < 1e-5


def test_cg_ir_df64_matches_cg_df64():
    """Same problem, same contract: the refinement and the full
    double-word recurrence agree to the tolerance they both enforce."""
    a, data, indices, indptr = _poisson_host(24)
    n = a.shape[0]
    b = np.sin(np.arange(n) * 0.37)
    dfa = D.DfEllMatrix.from_host_csr(data, indices, indptr, a.shape)
    r1 = cg_ir_df64(dfa, b, epsilon=1e-10)
    r2 = cg_df64(dfa, b, epsilon=1e-10)
    assert r1.status_enum() == SolverStatus.SUCCESS
    assert r2.status_enum() == SolverStatus.SUCCESS
    x1, x2 = r1.x_f64(), r2.x_f64()
    assert np.linalg.norm(x1 - x2) / np.linalg.norm(x2) < 1e-8


def test_cg_ir_df64_jacobi_inner():
    a, data, indices, indptr = _poisson_host(32)
    n = a.shape[0]
    b = np.random.default_rng(3).standard_normal(n)
    dfa = D.DfEllMatrix.from_host_csr(data, indices, indptr, a.shape)
    pre = JacobiPreconditioner.from_matrix(
        poisson_2d(32, dtype=np.float32)
    )
    res = cg_ir_df64(dfa, b, epsilon=1e-9, preconditioner=pre)
    assert res.status_enum() == SolverStatus.SUCCESS, res
    x = res.x_f64()
    assert np.linalg.norm(b - _csr_mv(data, indices, indptr, x)) < 1e-9


def test_cg_ir_df64_multigrid_inner():
    """A V-cycle-preconditioned inner solve reaches 1e-9 in a small
    TOTAL iteration count — the composition that makes the f64 contract
    cheap at scale."""
    nx = 48
    a, data, indices, indptr = _poisson_host(nx)
    n = a.shape[0]
    b = np.random.default_rng(5).standard_normal(n)
    dfa = D.DfEllMatrix.from_host_csr(data, indices, indptr, a.shape)
    mg = PoissonMultigrid.for_grid(nx, dtype=jnp.float32)
    res = cg_ir_df64(dfa, b, epsilon=1e-9, preconditioner=mg)
    assert res.status_enum() == SolverStatus.SUCCESS, res
    x = res.x_f64()
    assert np.linalg.norm(b - _csr_mv(data, indices, indptr, x)) < 1e-9
    plain = cg_ir_df64(dfa, b, epsilon=1e-9)
    assert int(res.iterations) < int(plain.iterations) / 3


def test_cg_ir_df64_inner_matrix_override():
    """A deliberately rounded inner operator (bf16 values) still reaches
    the f64 contract — the outer residual corrects inner operator error."""
    a, data, indices, indptr = _poisson_host(24)
    n = a.shape[0]
    b = np.random.default_rng(7).standard_normal(n)
    # perturb values so rounding to bf16 is lossy
    data = data * (1.0 + 1e-3 * np.sin(np.arange(data.size)))
    dfa = D.DfEllMatrix.from_host_csr(data, indices, indptr, a.shape)
    ell = hi_operator(dfa)
    rough = type(ell)(
        vals=ell.vals.astype(jnp.bfloat16).astype(jnp.float32),
        cols=ell.cols, shape=ell.shape, nnz=ell.nnz,
    )
    res = cg_ir_df64(dfa, b, epsilon=1e-9, inner_matrix=rough)
    assert res.status_enum() == SolverStatus.SUCCESS, res
    x = res.x_f64()
    assert np.linalg.norm(b - _csr_mv(data, indices, indptr, x)) < 1e-9


def test_cg_ir_df64_x0_resume():
    a, data, indices, indptr = _poisson_host(16)
    n = a.shape[0]
    x_true = np.linspace(-1.0, 1.0, n)
    b = _csr_mv(data, indices, indptr, x_true)
    dfa = D.DfEllMatrix.from_host_csr(data, indices, indptr, a.shape)
    full = cg_ir_df64(dfa, b, epsilon=1e-9)
    resumed = cg_ir_df64(dfa, b, x0=x_true + 1e-7, epsilon=1e-9)
    assert resumed.status_enum() == SolverStatus.SUCCESS
    assert int(resumed.iterations) < int(full.iterations)


def test_cg_ir_df64_status_paths():
    a, data, indices, indptr = _poisson_host(8)
    n = a.shape[0]
    b = np.ones(n)
    dfa = D.DfEllMatrix.from_host_csr(data, indices, indptr, a.shape)
    # zero budget -> MAX_ITERATIONS_REACHED before any round
    res = cg_ir_df64(dfa, b, max_iterations=0, epsilon=1e-8)
    assert res.status_enum() == SolverStatus.MAX_ITERATIONS_REACHED
    # unreachable epsilon -> the stall guard reports the floor with a
    # finite residual instead of looping to max_outer
    res = cg_ir_df64(dfa, b, epsilon=1e-18)
    assert res.status_enum() == SolverStatus.MAX_ITERATIONS_REACHED
    assert np.isfinite(float(res.residual_norm2))
    # epsilon below the f32-square representable floor is rejected
    with pytest.raises(ValueError):
        cg_ir_df64(dfa, b, epsilon=1e-20)
    # x0 already converged -> SUCCESS with zero work
    x_true = np.random.default_rng(1).standard_normal(n)
    bx = _csr_mv(data, indices, indptr, x_true)
    res = cg_ir_df64(dfa, bx, x0=x_true, epsilon=1e-8)
    assert res.status_enum() == SolverStatus.SUCCESS
    assert int(res.iterations) == 0 and int(res.outer_rounds) == 0


def test_cg_ir_df64_accepts_csr_and_plain_b():
    a = poisson_2d(12, dtype=np.float64)
    n = a.shape[0]
    b = jnp.ones(n, jnp.float32)
    res = cg_ir_df64(a, b, epsilon=1e-8)
    assert res.status_enum() == SolverStatus.SUCCESS


def test_cg_ir_df64_via_solve_front_door():
    a = poisson_2d(16, dtype=np.float64)
    n = a.shape[0]
    b = np.random.default_rng(11).standard_normal(n)
    res = solve(a, b, method="cg_ir_df64", epsilon=1e-9)
    assert isinstance(res, DfSolveResult)
    assert res.status_enum() == SolverStatus.SUCCESS
    with pytest.raises(ValueError):
        solve(a, b, method="cg_ir_df64", preconditioner="jacobi")


# -------------------------------------------------------------- bicgstab IR


def _nonsym_host(nx, drift=0.3):
    """Poisson + a one-sided convection term: nonsymmetric, well posed."""
    a = poisson_2d(nx, dtype=np.float64)
    data = np.asarray(a.data, np.float64).copy()
    indices = np.asarray(a.indices, np.int64)
    indptr = np.asarray(a.indptr, np.int64)
    rows = np.repeat(np.arange(a.shape[0]), np.diff(indptr))
    data[indices == rows + 1] += drift  # upwind bias on the +1 diagonal
    return data, indices, indptr, a.shape


def test_bicgstab_ir_df64_convection_1e10():
    data, indices, indptr, shape = _nonsym_host(32)
    n = shape[0]
    x_true = np.random.default_rng(2).standard_normal(n)
    b = np.add.reduceat(data * x_true[indices], indptr[:-1])
    dfa = D.df_operator_from_host_csr(data, indices, indptr, shape)
    from sparse_matrix_math_tpu import bicgstab_ir_df64

    res = bicgstab_ir_df64(dfa, b, epsilon=1e-10)
    assert res.status_enum() == SolverStatus.SUCCESS, res
    x = res.x_f64()
    tr = b - np.add.reduceat(data * x[indices], indptr[:-1])
    assert np.linalg.norm(tr) < 1e-9
    assert int(res.outer_rounds) >= 2


def test_bicgstab_ir_df64_sherman1_sgs_reference_contract():
    """sherman1 at 1e-8 — the reference's hard nonsymmetric case.  The
    inner f32 BiCGStab needs SGS there (the reference records the same
    instability unpreconditioned, test/cpp/bicgstab.cpp:68)."""
    from sparse_matrix_math_tpu import (
        bicgstab_ir_df64,
        get_preconditioner,
        load_matrix_csr,
    )
    from conftest import SHERMAN1

    path = asset_path(SHERMAN1)
    dfa = load_matrix_df(path)
    n = dfa.shape[0]
    if isinstance(dfa, D.DfDiaMatrix):
        hi = np.asarray(dfa.diags_hi, np.float64)
        lo = np.asarray(dfa.diags_lo, np.float64)
        b64 = np.zeros(n)
        for d, off in enumerate(dfa.offsets):
            rows = np.arange(n)
            cols = rows + off
            valid = (cols >= 0) & (cols < n)
            b64[rows[valid]] += (hi + lo)[d, rows[valid]]
    else:
        b64 = (
            np.asarray(dfa.vals_hi, np.float64).sum(axis=1)[:n]
            + np.asarray(dfa.vals_lo, np.float64).sum(axis=1)[:n]
        )
    a32 = load_matrix_csr(path)
    sgs = get_preconditioner(a32, "sgs")
    res = bicgstab_ir_df64(dfa, b64, epsilon=1e-8, preconditioner=sgs)
    assert res.status_enum() == SolverStatus.SUCCESS, res
    x = res.x_f64()
    assert np.max(np.abs(x - 1.0)) < 1e-5
    assert float(res.residual_norm2) ** 0.5 <= 1e-8 * (1 + 1e-6)


def test_bicgstab_ir_df64_status_and_front_door():
    data, indices, indptr, shape = _nonsym_host(8)
    n = shape[0]
    dfa = D.df_operator_from_host_csr(data, indices, indptr, shape)
    from sparse_matrix_math_tpu import bicgstab_ir_df64

    res = bicgstab_ir_df64(dfa, np.ones(n), max_iterations=0)
    assert res.status_enum() == SolverStatus.MAX_ITERATIONS_REACHED
    res0 = bicgstab_ir_df64(dfa, np.zeros(n), epsilon=1e-12)
    assert res0.status_enum() == SolverStatus.SUCCESS
    assert int(res0.iterations) == 0
    a = poisson_2d(12, dtype=np.float64)
    b = np.random.default_rng(13).standard_normal(a.shape[0])
    res = solve(a, b, method="bicgstab_ir_df64", epsilon=1e-9)
    assert res.status_enum() == SolverStatus.SUCCESS
