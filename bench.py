"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: SpMV throughput (GNNZ/s) on the ~10M-nnz 2-D Poisson
5-point system (BASELINE.json config 4) on the available accelerator.
``vs_baseline`` is the ratio to the measured reference baseline
(BASELINE.md: single-core C++ rMult = 0.47 GNNZ/s, same matrix).

Timing methodology: each SpMV path runs K iterations inside one jitted
``lax.scan`` (a single host dispatch), so per-call host/tunnel latency is
excluded — matching how the solvers actually run (whole Krylov loop in
one jit).  The fastest format for this matrix wins the headline; all
paths are reported in the payload, plus CG time-to-tolerance.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SPMV_GNNZ = 0.47  # BASELINE.md: reference rMult, 1 core Xeon 2.1 GHz


def _time_spmv_loop(matvec, x, iters: int) -> float:
    """Seconds per SpMV: K back-to-back SpMVs inside one jitted scan."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(v):
        def body(y, _):
            return matvec(y) * jnp.asarray(0.25, y.dtype), None

        y, _ = jax.lax.scan(body, v, None, length=iters)
        return y

    y = loop(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = loop(x)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sparse_matrix_math_tpu import cg
    from sparse_matrix_math_tpu.formats.dia import try_dia_from_csr
    from sparse_matrix_math_tpu.formats.ell import ell_from_csr
    from sparse_matrix_math_tpu.ops.spmv import rmult
    from sparse_matrix_math_tpu.utils.generate import poisson_2d

    dev = jax.devices()[0]
    nx = 1414  # n = 1,999,396 rows, nnz = 9,991,444 (~10M, config 4)
    a = poisson_2d(nx, dtype=np.float32)
    nnz = a.nnz
    x = jnp.ones((a.shape[0],), jnp.float32)

    candidates = {}
    dia = try_dia_from_csr(a)
    if dia is not None:
        candidates["dia"] = (lambda v, m=dia: rmult(m, v), 50)
    candidates["ell"] = (lambda v, m=ell_from_csr(a): rmult(m, v), 10)
    candidates["csr"] = (lambda v, m=a: rmult(m, v), 3)

    results = {}
    for name, (mv, iters) in candidates.items():
        try:
            results[name] = _time_spmv_loop(mv, x, iters)
        except Exception:
            results[name] = float("inf")
    best = min(results, key=results.get)
    gnnz = nnz / results[best] / 1e9

    # CG time-to-tolerance (f32, all-ones oracle) through the best format
    op = dia if (best == "dia" and dia is not None) else a
    b = rmult(op, x)
    res = cg(op, b, max_iterations=6000, epsilon=1e-4)
    res.x.block_until_ready()
    t0 = time.perf_counter()
    res = cg(op, b, max_iterations=6000, epsilon=1e-4)
    res.x.block_until_ready()
    cg_time_hot = time.perf_counter() - t0

    payload = {
        "metric": "spmv_throughput_poisson2d_10Mnnz_f32",
        "value": round(gnnz, 3),
        "unit": "GNNZ/s",
        "vs_baseline": round(gnnz / BASELINE_SPMV_GNNZ, 2),
        "device": str(dev),
        "spmv_kernel": best,
        "spmv_all_paths_ms": {
            k: (round(v * 1e3, 4) if np.isfinite(v) else None)
            for k, v in results.items()
        },
        "cg_iterations": int(res.iterations),
        "cg_residual": float(res.residual_norm),
        "cg_time_hot_s": round(cg_time_hot, 4),
        "n": a.shape[0],
        "nnz": nnz,
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
