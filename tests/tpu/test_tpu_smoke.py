"""Real-TPU smoke tests — run manually on a chip:

    python -m pytest tests/tpu -q --no-header -p no:cacheprovider

The main suite pins jax_platforms=cpu (tests/conftest.py), so Pallas
kernels there only run in interpret mode and MXU/dense-trisolve paths are
never exercised on hardware.  This file is skipped unless the default
backend is TPU.  Keep it small: first compile on a fresh tunnel is slow.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU backend"
)


@pytest.fixture(scope="module")
def jnp():
    import jax.numpy as jnp

    return jnp


@pytest.fixture(scope="module")
def smm():
    import sparse_matrix_math_tpu as smm

    return smm


def test_pallas_dia_dispatch_exact(smm, jnp):
    from sparse_matrix_math_tpu.formats.dia import dia_from_csr
    from sparse_matrix_math_tpu.utils.generate import poisson_2d

    a = poisson_2d(128, dtype=np.float32)
    d = dia_from_csr(a)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(a.shape[0]).astype(np.float32)
    )
    y_pallas = np.asarray(d @ x)       # dispatches to the Pallas kernel
    y_ref = np.asarray(
        a.to_dense() @ x
    )
    np.testing.assert_allclose(y_pallas, y_ref, atol=2e-4)


def test_all_solvers_padded_path(smm, jnp):
    from sparse_matrix_math_tpu.formats.dia import dia_from_csr
    from sparse_matrix_math_tpu.utils.generate import poisson_2d

    a = dia_from_csr(poisson_2d(32, dtype=np.float32))
    b = a @ jnp.ones(1024, jnp.float32)
    for solver in (smm.cg, smm.bicg_symmetric, smm.cgs, smm.bicgstab):
        res = solver(a, b, epsilon=1e-4)
        assert int(res.status) == 0, solver.__name__
        assert float(jnp.abs(res.x - 1).max()) < 1e-2, solver.__name__


def test_preconditioned_solves_on_hw(smm, jnp):
    """IC0 + SGS applies (dense trisolve -> MXU solve_triangular) on HW."""
    a = smm.load_matrix_csr(
        "/root/reference/test/assets/mesh1e1_structural_48_48_177.mtx",
        dtype=np.float32,
    )
    b = a @ jnp.ones(48, jnp.float32)
    res = smm.cg(a, b, epsilon=1e-4, preconditioner=smm.get_preconditioner(a, "ic0"))
    assert int(res.status) == 0 and int(res.iterations) <= 10
    res = smm.bicgstab(
        a, b, epsilon=1e-4, preconditioner=smm.get_preconditioner(a, "sgs")
    )
    assert int(res.status) == 0 and int(res.iterations) <= 7


def test_dense_mxu_csr_path(smm, jnp):
    a = smm.load_matrix_csr(
        "/root/reference/test/assets/sherman1_1000_1000_2375.mtx",
        dtype=np.float32,
    )
    b = a @ jnp.ones(1000, jnp.float32)
    res = smm.cg(a, b, epsilon=1e-4)
    assert int(res.status) == 0
    # f32 per-element error bar from the reference's own f32 behavior
    # (BASELINE.md: 6.0e-3 max err on sherman1)
    assert float(jnp.abs(res.x - 1).max()) < 2e-2


def test_single_device_dist_solve(smm, jnp):
    from sparse_matrix_math_tpu.parallel import (
        collect,
        dist_solve,
        distribute_csr,
        make_mesh,
    )
    from sparse_matrix_math_tpu.utils.generate import poisson_2d

    a = poisson_2d(16, dtype=np.float32)
    mesh = make_mesh(1)
    da = distribute_csr(a, mesh)
    b = np.asarray(a.to_dense()).sum(axis=1)
    res = dist_solve(da, b, solver="cg", epsilon=1e-4, mesh=mesh)
    assert int(res.status) == 0
    assert np.abs(collect(res.x, da) - 1).max() < 1e-3


def test_wsell_general_pattern_on_hw(smm, jnp):
    """W-SELL two-step-gather kernel on chip vs a host reference."""
    from sparse_matrix_math_tpu.formats.wsell import wsell_from_csr
    from sparse_matrix_math_tpu.utils.generate import laplace_3d_jittered

    a = laplace_3d_jittered(24, dtype=np.float32)  # banded-broken, no DIA
    ws = wsell_from_csr(a)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(a.shape[1]).astype(np.float32))
    y = np.asarray(ws @ x, dtype=np.float64)
    r = np.asarray(a.row_ids)
    c = np.asarray(a.indices)
    v = np.asarray(a.data, np.float64)
    ref = np.zeros(a.shape[0], np.float64)
    np.add.at(ref, r, v * np.asarray(x, np.float64)[c])
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(y / scale, ref / scale, atol=2e-6)


def test_fused_sgs_apply_on_hw(smm, jnp):
    """Fused halo-deep-sweep SGS apply vs the compositional apply."""
    from sparse_matrix_math_tpu.formats.dia import dia_from_csr
    from sparse_matrix_math_tpu.ops.pallas_trisweep import sgs_apply_fused
    from sparse_matrix_math_tpu.precond import PaddedSGS
    from sparse_matrix_math_tpu.utils.generate import poisson_2d

    dia = dia_from_csr(poisson_2d(120, dtype=np.float32))
    p = PaddedSGS.from_dia(dia, sweeps=4)
    r = p.p_lower.to_padded(
        jnp.asarray(
            np.random.default_rng(2).standard_normal(120 * 120).astype(np.float32)
        )
    )
    want = np.asarray(p.apply_padded(r, resident=True, interpret=False))
    got = np.asarray(sgs_apply_fused(p, r, interpret=False))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_multigrid_pcg_on_hw(smm, jnp):
    from sparse_matrix_math_tpu.solvers.multigrid import PoissonMultigrid
    from sparse_matrix_math_tpu.utils.generate import poisson_2d

    nx = 128
    a = poisson_2d(nx, dtype=np.float32)
    b = a @ jnp.ones(a.shape[0], jnp.float32)
    mg = PoissonMultigrid.for_grid(nx)
    res = smm.cg(a, b, epsilon=1e-4, preconditioner=mg)
    assert int(res.status) == 0
    assert int(res.iterations) <= 15


def test_routed_chain_on_hw(smm, jnp):
    """R-SELL routing passes + final W-SELL on chip vs a host reference
    (the zero-locality pattern every windowed layout refuses)."""
    from sparse_matrix_math_tpu.formats.rsell import routed_from_csr
    from sparse_matrix_math_tpu.utils.generate import uniform_random_csr

    a = uniform_random_csr(50_000, per_row=5, dtype=np.float32)
    ra = routed_from_csr(a, max_slot_ratio=99.0)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(a.shape[1]).astype(np.float32))
    y = np.asarray(ra @ x, dtype=np.float64)
    r = np.asarray(a.row_ids)
    c = np.asarray(a.indices)
    v = np.asarray(a.data, np.float64)
    ref = np.zeros(a.shape[0], np.float64)
    np.add.at(ref, r, v * np.asarray(x, np.float64)[c])
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(y / scale, ref / scale, atol=2e-6)


def test_hbm_window_dma_variants_on_hw(smm, jnp):
    """The HBM window-DMA kernel variants must match the VMEM-resident
    paths on real hardware (DMA semantics differ from interpret mode)."""
    from sparse_matrix_math_tpu.formats.wsell import wsell_from_csr
    from sparse_matrix_math_tpu.ops.pallas_rsell import stream_gather
    from sparse_matrix_math_tpu.ops.pallas_wsell import wsell_spmv
    from sparse_matrix_math_tpu.formats.rsell import routed_from_csr
    from sparse_matrix_math_tpu.utils.generate import (
        laplace_3d_jittered, uniform_random_csr,
    )

    a = laplace_3d_jittered(24, dtype=np.float32)
    ws = wsell_from_csr(a)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(a.shape[1]).astype(np.float32))
    y0 = np.asarray(wsell_spmv(ws, x))
    y1 = np.asarray(wsell_spmv(ws, x, force_hbm=True))
    np.testing.assert_array_equal(y1, y0)

    ar = uniform_random_csr(60_000, per_row=5, dtype=np.float32)
    ra = routed_from_csr(ar, max_slot_ratio=99.0)
    t0 = t1 = jnp.asarray(
        rng.standard_normal(ar.shape[1]).astype(np.float32)
    )
    for p in ra.passes:
        kw = dict(x_rows=p.x_rows, window_f=p.window_f)
        t0 = stream_gather(p.base, p.meta, p.vals, t0, **kw)
        t1 = stream_gather(p.base, p.meta, p.vals, t1, force_hbm=True, **kw)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


def test_wsell_nway_routing_on_chip(smm, jnp):
    """Bounded-reduction W-SELL (nway=4, the solver-facing default) must
    match the rotation-free layout bit-for-tolerance on hardware."""
    from sparse_matrix_math_tpu.formats.wsell import wsell_from_csr
    from sparse_matrix_math_tpu.ops.pallas_wsell import wsell_spmv
    from sparse_matrix_math_tpu.utils.generate import laplace_3d_jittered

    a = laplace_3d_jittered(16, dtype=np.float32, symmetric=True, shift=0.25)
    w1 = wsell_from_csr(a, nway=1)
    w4 = wsell_from_csr(a, nway=4)
    assert w4.nway == 4 and w4.slot_ratio < w1.slot_ratio
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(a.shape[0]).astype(np.float32)
    )
    y1 = np.asarray(wsell_spmv(w1, x))
    y4 = np.asarray(wsell_spmv(w4, x))
    np.testing.assert_allclose(y4, y1, rtol=1e-5, atol=1e-5)


def test_grid_stencil_solve_on_chip(smm, jnp):
    """Matrix-free grid stencil (round 4): detection + grid-resident CG
    on hardware; verified against the DIA route on the same system."""
    from sparse_matrix_math_tpu.formats.dia import try_dia_from_csr
    from sparse_matrix_math_tpu.formats.stencil import (
        try_grid_stencil_from_csr,
    )
    from sparse_matrix_math_tpu.utils.generate import poisson_2d

    a = poisson_2d(160, dtype=np.float32)  # 25.6k rows: quick on-chip
    dia = try_dia_from_csr(a)
    st = try_grid_stencil_from_csr(a, dia=dia)
    assert st is not None
    b = st @ jnp.ones((a.shape[0],), jnp.float32)
    res = smm.cg(st, b, epsilon=1e-4)
    ref = smm.cg(dia, b, epsilon=1e-4)
    assert int(res.status) == int(ref.status) == 0
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x), rtol=1e-4, atol=1e-4
    )


def test_hbm_regime_cg_on_chip(smm, jnp):
    """Round 5: the host-driven HBM-regime CG path on hardware (forced
    via the byte threshold) matches the jitted grid core."""
    from sparse_matrix_math_tpu.formats.stencil import (
        try_grid_stencil_from_csr,
    )
    from sparse_matrix_math_tpu.solvers import _stencil
    from sparse_matrix_math_tpu.utils.generate import poisson_2d

    st = try_grid_stencil_from_csr(poisson_2d(160, dtype=np.float32))
    b = st @ jnp.ones((st.shape[0],), jnp.float32)
    ref = smm.cg(st, b, epsilon=1e-4)
    old = _stencil._HBM_REGIME_BYTES
    try:
        _stencil._HBM_REGIME_BYTES = 0
        hbm = smm.cg(st, b, epsilon=1e-4)
    finally:
        _stencil._HBM_REGIME_BYTES = old
    assert int(hbm.status) == int(ref.status) == 0
    np.testing.assert_allclose(
        np.asarray(hbm.x), np.asarray(ref.x), rtol=1e-4, atol=1e-4
    )


def test_sstep_gmres_on_chip(smm, jnp):
    """Round 5: the communication-avoiding GMRES path compiles and
    converges on hardware with a verified true residual."""
    from sparse_matrix_math_tpu.utils.generate import convection_diffusion_2d

    a = convection_diffusion_2d(96, dtype=np.float32)
    b = a @ jnp.ones((a.shape[0],), jnp.float32)
    res = smm.gmres(a, b, epsilon=1e-3, restart=32, s_step=4)
    assert int(res.status) == 0
    true = float(jnp.linalg.norm(b - a @ res.x))
    assert true <= 1e-3 * 1.01


def test_panel_solve_on_chip(smm, jnp):
    """Round 5: leading-batch panel cg_multi on hardware."""
    from sparse_matrix_math_tpu.formats.stencil import (
        try_grid_stencil_from_csr,
    )
    from sparse_matrix_math_tpu.solvers.block import cg_multi
    from sparse_matrix_math_tpu.utils.generate import poisson_2d

    st = try_grid_stencil_from_csr(poisson_2d(96, dtype=np.float32))
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((st.shape[0], 4)), jnp.float32)
    B = st @ X
    eps = 1e-3 * float(jnp.linalg.norm(B, axis=0).min())
    res = cg_multi(st, B, epsilon=eps, max_iterations=2000)
    assert all(int(v) == 0 for v in np.asarray(res.status))
