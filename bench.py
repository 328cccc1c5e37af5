"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: SpMV throughput (GNNZ/s) on the ~10M-nnz 2-D Poisson
5-point system (BASELINE.json config 4), on whatever accelerator JAX
exposes.  ``vs_baseline`` is the ratio to the measured reference baseline
(BASELINE.md: single-core C++ rMult = 0.47 GNNZ/s on the same matrix).

Also measured and reported in the JSON payload (as extra fields):
CG time-to-tolerance on the same system, and iteration counts for parity.
"""

from __future__ import annotations

import json
import time

import numpy as np


BASELINE_SPMV_GNNZ = 0.47  # BASELINE.md: reference rMult, 1 core Xeon 2.1 GHz


def _best_spmv(a_csr, a_ell, x):
    """Pick the fastest available SpMV path for the benchmark matrix."""
    import jax

    from sparse_matrix_math_tpu.ops.spmv import rmult

    candidates = {"csr": (a_csr, x), "ell": (a_ell, x)}
    results = {}
    for name, (mat, xv) in candidates.items():
        f = jax.jit(lambda v, m=mat: rmult(m, v))
        y = f(xv)
        y.block_until_ready()
        n_iter = 50
        t0 = time.perf_counter()
        for _ in range(n_iter):
            y = f(y / (1.0 + jax.numpy.abs(y).max()))  # keep values bounded
        y.block_until_ready()
        results[name] = (time.perf_counter() - t0) / n_iter
    best = min(results, key=results.get)
    return best, results[best], results


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sparse_matrix_math_tpu import cg
    from sparse_matrix_math_tpu.formats.ell import ell_from_csr
    from sparse_matrix_math_tpu.utils.generate import poisson_2d

    dev = jax.devices()[0]
    nx = 1414  # n = 1,999,396 rows, nnz = 9,991,444 (~10M, config 4)
    a = poisson_2d(nx, dtype=np.float32)
    nnz = a.nnz
    ell = ell_from_csr(a)

    x = jnp.ones((a.shape[0],), jnp.float32)
    kernel, sec_per_op, all_results = _best_spmv(a, ell, x)
    gnnz = nnz / sec_per_op / 1e9

    # CG time-to-tolerance (f32, all-ones oracle)
    b = a.rmult(x)
    t0 = time.perf_counter()
    res = cg(a, b, max_iterations=2000, epsilon=1e-4)
    res.x.block_until_ready()
    cg_time = time.perf_counter() - t0
    # second call = compiled steady state
    t0 = time.perf_counter()
    res = cg(a, b, max_iterations=2000, epsilon=1e-4)
    res.x.block_until_ready()
    cg_time_hot = time.perf_counter() - t0

    payload = {
        "metric": "spmv_throughput_poisson2d_10Mnnz_f32",
        "value": round(gnnz, 3),
        "unit": "GNNZ/s",
        "vs_baseline": round(gnnz / BASELINE_SPMV_GNNZ, 2),
        "device": str(dev),
        "spmv_kernel": kernel,
        "spmv_all_paths_s": {k: round(v, 6) for k, v in all_results.items()},
        "cg_iterations": int(res.iterations),
        "cg_residual": float(res.residual_norm),
        "cg_time_hot_s": round(cg_time_hot, 4),
        "cg_time_cold_s": round(cg_time, 4),
        "n": a.shape[0],
        "nnz": nnz,
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
