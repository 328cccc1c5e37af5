"""Distributed multigrid (parallel/dist_multigrid.py) on the simulated
8-device CPU mesh: V-cycle/solve parity vs the single-chip hierarchy."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_math_tpu.parallel import (
    dist_mg_solve,
    dist_mg_vcycle,
    distribute_multigrid,
    make_mesh,
)
from sparse_matrix_math_tpu.solvers import cg
from sparse_matrix_math_tpu.solvers.multigrid import PoissonMultigrid
from sparse_matrix_math_tpu.solvers.types import SolverStatus
from sparse_matrix_math_tpu.utils.generate import poisson_2d, poisson_3d


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def _rand(n, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(n).astype(np.float32)
    )


class TestVcycleParity:
    @pytest.mark.slow
    @pytest.mark.parametrize("nx", [96, 90, 48])
    def test_2d_vcycle_matches_single_chip(self, mesh, nx):
        """One distributed V-cycle == one single-chip V-cycle: the padded
        axis-0 system restricted to real planes is exactly the true
        hierarchy (even 96, odd/uneven 90, shallow 48)."""
        mg = PoissonMultigrid.for_grid(nx)
        dmg = distribute_multigrid(mg, mesh)
        r = _rand(nx * nx, seed=nx)
        z_ref = np.asarray(mg.apply(r))
        z_dist = np.asarray(dist_mg_vcycle(dmg, r, mesh))
        scale = np.abs(z_ref).max()
        np.testing.assert_allclose(z_dist, z_ref, atol=2e-5 * scale)

    @pytest.mark.slow
    def test_3d_vcycle_matches_single_chip(self, mesh):
        mg = PoissonMultigrid.for_grid(24, 24, 24)
        dmg = distribute_multigrid(mg, mesh)
        r = _rand(24 ** 3, seed=3)
        z_ref = np.asarray(mg.apply(r))
        z_dist = np.asarray(dist_mg_vcycle(dmg, r, mesh))
        scale = np.abs(z_ref).max()
        np.testing.assert_allclose(z_dist, z_ref, atol=2e-5 * scale)

    def test_rectangular_grid(self, mesh):
        mg = PoissonMultigrid.for_grid(40, 72)  # nx=40, ny=72 (axis0=72)
        dmg = distribute_multigrid(mg, mesh)
        r = _rand(40 * 72, seed=7)
        z_ref = np.asarray(mg.apply(r))
        z_dist = np.asarray(dist_mg_vcycle(dmg, r, mesh))
        scale = np.abs(z_ref).max()
        np.testing.assert_allclose(z_dist, z_ref, atol=2e-5 * scale)


class TestDistMGSolve:
    @pytest.mark.slow
    def test_pcg_matches_single_chip_iterations(self, mesh):
        """Distributed PCG+V-cycle reproduces the single-chip pairing:
        same status, same iteration count, same solution."""
        nx = 96
        a = poisson_2d(nx, dtype=np.float32)
        mg = PoissonMultigrid.for_grid(nx)
        b = a @ jnp.ones(nx * nx, jnp.float32)

        # eps must sit above the f32 true-residual floor (~2e-5 at this
        # n): solvers verify convergence against ||b - A x|| and honestly
        # refuse SUCCESS below the floor (see cg_core)
        ref = cg(a, b, epsilon=1e-4, preconditioner=mg)
        dmg = distribute_multigrid(mg, mesh)
        res = dist_mg_solve(dmg, b, solver="pcg", epsilon=1e-4, mesh=mesh)

        assert int(res.status) == SolverStatus.SUCCESS
        assert int(res.iterations) == int(ref.iterations)
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=5e-4)

    def test_plain_cg_path(self, mesh):
        nx = 48
        a = poisson_2d(nx, dtype=np.float32)
        mg = PoissonMultigrid.for_grid(nx)
        dmg = distribute_multigrid(mg, mesh)
        b = a @ jnp.ones(nx * nx, jnp.float32)
        # eps above the f32 true-residual floor (solvers verify SUCCESS
        # against ||b - A x|| — see cg_core)
        res = dist_mg_solve(dmg, b, solver="cg", epsilon=1e-4, mesh=mesh)
        assert int(res.status) == SolverStatus.SUCCESS
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=5e-4)

    def test_stationary_mg_matches_single_chip(self, mesh):
        nx = 90
        mg = PoissonMultigrid.for_grid(nx)
        a = poisson_2d(nx, dtype=np.float32)
        b = a @ jnp.ones(nx * nx, jnp.float32)
        # eps well above the f32 stagnation floor (~2e-5 here): at the
        # floor, psum-vs-fused summation roundoff decides convergence
        ref = mg.solve(b, epsilon=1e-3)
        dmg = distribute_multigrid(mg)
        res = dist_mg_solve(dmg, b, solver="mg", epsilon=1e-3)
        assert int(res.status) == SolverStatus.SUCCESS
        assert int(res.iterations) == int(ref.iterations)
        np.testing.assert_allclose(
            np.asarray(res.x), np.asarray(ref.x), atol=5e-4
        )

    @pytest.mark.slow
    def test_3d_pcg(self, mesh):
        nx = 20
        a = poisson_3d(nx, dtype=np.float32)
        mg = PoissonMultigrid.for_grid(nx, nx, nx)
        dmg = distribute_multigrid(mg, mesh)
        b = a @ jnp.ones(nx ** 3, jnp.float32)
        # eps above the f32 true-residual floor (see cg_core)
        res = dist_mg_solve(dmg, b, solver="pcg", epsilon=1e-4, mesh=mesh)
        assert int(res.status) == SolverStatus.SUCCESS
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=5e-4)

    def test_rejects_unknown_solver(self, mesh):
        mg = PoissonMultigrid.for_grid(48)
        dmg = distribute_multigrid(mg, mesh)
        with pytest.raises(ValueError):
            dist_mg_solve(dmg, jnp.ones(48 * 48), solver="gmres", mesh=mesh)
