"""Distributed R-SELL (parallel/dist_rsell.py) on the 8-virtual-device
CPU mesh: the zero-locality fast path inside shard_map must reproduce
the single-chip routed/CSR results exactly (all_gather halo, per-shard
chains, psum dots)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_math_tpu.ops.spmv import rmult
from sparse_matrix_math_tpu.parallel import (
    collect,
    dist_routed_solve,
    dist_routed_spmv,
    distribute_routed,
    distribute_vector,
    make_mesh,
)
from sparse_matrix_math_tpu.solvers.types import SolverStatus
from sparse_matrix_math_tpu.utils.generate import uniform_random_csr

N = 6 * 1024  # not a multiple of 8*1024: the last shards run near-empty


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


@pytest.fixture(scope="module")
def system():
    a = uniform_random_csr(N, per_row=4, seed=7, dtype=np.float32)
    x = np.random.default_rng(0).standard_normal(N).astype(np.float32)
    return a, x


class TestDistRoutedSpMV:
    @pytest.mark.slow
    def test_matches_csr(self, mesh, system):
        a, x = system
        da = distribute_routed(a, mesh, max_slot_ratio=99.0)
        assert da.n_shards == mesh.shape["rows"]
        xs = distribute_vector(x, da, mesh)
        y = collect(dist_routed_spmv(da, xs, mesh), da)
        want = np.asarray(rmult(a, jnp.asarray(x)))
        np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-4)

    def test_padding_is_inert(self, mesh, system):
        """Rows beyond n (the last shard's padding) must come back 0."""
        a, x = system
        da = distribute_routed(a, mesh, max_slot_ratio=99.0)
        xs = distribute_vector(x, da, mesh)
        y_pad = np.asarray(dist_routed_spmv(da, xs, mesh))
        assert y_pad.shape[0] == da.padded_rows
        np.testing.assert_array_equal(y_pad[N:], 0.0)

    def test_rejects_rectangular(self, mesh):
        from sparse_matrix_math_tpu.formats.csr import csr_from_dense

        a = csr_from_dense(np.ones((8, 4)))
        with pytest.raises(ValueError):
            distribute_routed(a, mesh)


class TestDistRoutedSolve:
    @pytest.mark.slow
    def test_bicgstab_converges_to_oracle(self, mesh, system):
        a, _ = system
        b = np.asarray(rmult(a, jnp.ones(N, jnp.float32)))
        res = dist_routed_solve(
            # eps above the f32 true-residual floor (~2e-5 here; see cg_core)
            a_dist(mesh, a), b, epsilon=1e-4, solver="bicgstab", mesh=mesh
        )
        assert int(res.status) == SolverStatus.SUCCESS
        x = np.asarray(res.x)[:N]
        np.testing.assert_allclose(x, 1.0, atol=1e-3)


def a_dist(mesh, a):
    return distribute_routed(a, mesh, max_slot_ratio=99.0)


@pytest.mark.slow
def test_gmres_over_routed(mesh, system):
    """GMRES (the minimal-residual nonsymmetric core) over the
    distributed routed chain — the natural pairing for zero-locality
    nonsymmetric systems."""
    a, _ = system
    da = distribute_routed(a, mesh, max_slot_ratio=99.0)
    b = np.asarray(rmult(a, jnp.ones(N, jnp.float32)))
    res = dist_routed_solve(da, b, epsilon=1e-4, solver="gmres", mesh=mesh)
    assert int(res.status) == SolverStatus.SUCCESS
    np.testing.assert_allclose(np.asarray(res.x)[:N], 1.0, atol=1e-3)
