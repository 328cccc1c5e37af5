"""Distributed double-word f64: the 1e-8 contract over the row mesh.

parallel/dist_df64.py shards the (hi, lo) DIA planes and runs the
iterative-refinement loop (solvers/ir_df64.py:ir_df_core) inside
shard_map — these tests run it on the simulated 8-device CPU mesh and
check the double-word SpMV and both solvers against host-f64 oracles
and the single-chip results.
"""

import numpy as np
import pytest

from sparse_matrix_math_tpu import SolverStatus, cg_ir_df64
from sparse_matrix_math_tpu.ops.df32 import DfDiaMatrix, df_from_host
from sparse_matrix_math_tpu.parallel import (
    dist_bicgstab_ir_df64,
    dist_cg_ir_df64,
    dist_df_dia_spmv,
    distribute_df_dia,
    make_mesh,
    put_sharded,
)
from jax.sharding import PartitionSpec as P
from sparse_matrix_math_tpu.utils import poisson_2d


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def _df_dia_host(nx, perturb=True, drift=0.0):
    a = poisson_2d(nx, dtype=np.float64)
    data = np.asarray(a.data, np.float64).copy()
    indices = np.asarray(a.indices, np.int64)
    indptr = np.asarray(a.indptr, np.int64)
    if perturb:  # non-trivial lo planes
        data = data * (1.0 + 1e-9 * np.arange(data.size))
    if drift:
        rows = np.repeat(np.arange(a.shape[0]), np.diff(indptr))
        data[indices == rows + 1] += drift
    dfa = DfDiaMatrix.from_host_csr(data, indices, indptr, a.shape)
    return dfa, data, indices, indptr


def _csr_mv(data, indices, indptr, x):
    return np.add.reduceat(data * x[indices], indptr[:-1])


def test_dist_df_spmv_matches_host_f64(mesh):
    dfa, data, indices, indptr = _df_dia_host(24)
    n = dfa.shape[0]
    dist = distribute_df_dia(dfa, mesh)
    x64 = np.random.default_rng(0).standard_normal(n)
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    pad = dist.padded_rows - n
    x_sh = (
        put_sharded(np.concatenate([hi, np.zeros(pad, np.float32)]),
                    mesh, P(dist.axis)),
        put_sharded(np.concatenate([lo, np.zeros(pad, np.float32)]),
                    mesh, P(dist.axis)),
    )
    yh, yl = dist_df_dia_spmv(dist, x_sh, mesh)
    got = np.asarray(yh, np.float64)[:n] + np.asarray(yl, np.float64)[:n]
    x48 = hi.astype(np.float64) + lo.astype(np.float64)
    want = _csr_mv(data, indices, indptr, x48)
    rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert rel < 1e-12, rel


def test_dist_cg_ir_df64_poisson_1e10(mesh):
    dfa, data, indices, indptr = _df_dia_host(48)
    n = dfa.shape[0]
    x_true = np.random.default_rng(1).standard_normal(n)
    b = _csr_mv(data, indices, indptr, x_true)
    dist = distribute_df_dia(dfa, mesh)
    res = dist_cg_ir_df64(dist, b, epsilon=1e-10)
    assert res.status_enum() == SolverStatus.SUCCESS, res
    x = res.x_f64()
    assert np.linalg.norm(b - _csr_mv(data, indices, indptr, x)) < 1e-9
    assert np.linalg.norm(x - x_true) / np.linalg.norm(x_true) < 1e-10
    # same outcome as the single-chip refinement
    single = cg_ir_df64(dfa, b, epsilon=1e-10)
    assert single.status_enum() == SolverStatus.SUCCESS
    xs = single.x_f64()
    assert np.linalg.norm(x - xs) / np.linalg.norm(xs) < 1e-8


def test_dist_bicgstab_ir_df64_nonsym(mesh):
    dfa, data, indices, indptr = _df_dia_host(32, drift=1e-2)
    n = dfa.shape[0]
    x_true = np.random.default_rng(2).standard_normal(n)
    b = _csr_mv(data, indices, indptr, x_true)
    dist = distribute_df_dia(dfa, mesh)
    res = dist_bicgstab_ir_df64(dist, b, epsilon=1e-9)
    assert res.status_enum() == SolverStatus.SUCCESS, res
    x = res.x_f64()
    assert np.linalg.norm(b - _csr_mv(data, indices, indptr, x)) < 1e-9


def test_dist_ir_df64_status_paths(mesh):
    dfa, data, indices, indptr = _df_dia_host(8)
    n = dfa.shape[0]
    dist = distribute_df_dia(dfa, mesh)
    res = dist_cg_ir_df64(dist, np.ones(n), max_iterations=0)
    assert res.status_enum() == SolverStatus.MAX_ITERATIONS_REACHED
    # x0 resume from the exact solution -> zero work
    x_true = np.random.default_rng(3).standard_normal(n)
    bx = _csr_mv(data, indices, indptr, x_true)
    res = dist_cg_ir_df64(dist, bx, x0=x_true, epsilon=1e-8)
    assert res.status_enum() == SolverStatus.SUCCESS
    assert int(res.iterations) == 0 and int(res.outer_rounds) == 0
    with pytest.raises(ValueError):
        dist_cg_ir_df64(dist, np.ones(n), epsilon=1e-20)


def test_distribute_df_dia_rejects_wide_band(mesh):
    # offsets exceeding the block cannot be halo-covered
    n = 64
    data = np.ones(2 * n - 40, np.float64)
    rows = np.concatenate([np.arange(n), np.arange(n - 40)])
    cols = np.concatenate([np.arange(n), np.arange(40, n)])
    order = np.lexsort((cols, rows))
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr)
    dfa = DfDiaMatrix.from_host_csr(
        data[order], cols[order], indptr, (n, n)
    )
    with pytest.raises(ValueError):
        distribute_df_dia(dfa, mesh)
