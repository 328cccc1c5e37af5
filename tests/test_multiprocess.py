"""Multi-host (multi-process) distribution — SURVEY §2.3's DCN row.

Real multi-host jobs initialise via ``parallel.init_distributed`` and
then use the SAME distribute/solve API as single-process code: meshes
span the global device list, placement goes through
``make_array_from_callback``, gathering through ``process_allgather``.

Here that path is exercised without a pod: 2 OS processes x 4 virtual
CPU devices each, joined by jax.distributed with gloo cross-process
collectives (``init_distributed(simulate_cpu_devices=4)``).  Each
worker runs a full distributed CG solve over the 8-device global mesh
and checks the all-ones oracle; rank 0 additionally checks iteration
parity with a single-process solve of the same system.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from sparse_matrix_math_tpu.parallel import init_distributed

init_distributed(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc,
    process_id=pid,
    simulate_cpu_devices=4,
)

import jax
import jax.numpy as jnp
import numpy as np

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

from sparse_matrix_math_tpu.parallel import (
    collect,
    dist_solve,
    distribute_csr,
    distribute_preconditioner,
    make_mesh,
)
from sparse_matrix_math_tpu.precond.preconditioners import get_preconditioner
from sparse_matrix_math_tpu.utils.generate import poisson_2d

mesh = make_mesh()
assert len(mesh.devices.ravel()) == 4 * nproc

a = poisson_2d(48, dtype=np.float32)
b = np.asarray(a.to_dense(), np.float32).sum(axis=1)

da = distribute_csr(a, mesh)
res = dist_solve(da, b, solver="cg", epsilon=1e-4, mesh=mesh)
x = collect(res.x, da)
err = float(np.abs(x - 1.0).max())
assert int(res.status) == 0, res
assert err < 1e-3, err
print(f"[p{pid}] cg ok: iters={int(res.iterations)} err={err:.2e}", flush=True)

# preconditioned path: Jacobi shards trivially, exercises the
# DistPreconditioner placement through put_sharded
pre = distribute_preconditioner(get_preconditioner(a, "jacobi"), da, mesh)
res2 = dist_solve(
    da, b, solver="bicgstab", preconditioner=pre, epsilon=1e-4, mesh=mesh
)
x2 = collect(res2.x, da)
err2 = float(np.abs(x2 - 1.0).max())
print(f"[p{pid}] bicgstab+jacobi: {res2} err={err2:.3e}", flush=True)
assert int(res2.status) == 0, res2
# convergence is on the PRECONDITIONED residual (reference h:2277
# semantics), so the solution-error bound is looser than plain CG's
assert err2 < 5e-3, err2

if pid == 0:
    print(f"MP_RESULT iters={int(res.iterations)}", flush=True)
jax.distributed.shutdown()
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dist_solve(tmp_path):
    """2 processes x 4 devices: end-to-end dist_solve over a
    process-spanning mesh matches the single-process solve."""
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = dict(os.environ)
    # workers configure the backend themselves (init_distributed); drop
    # the suite's single-process pins so they don't fight it
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-4000:]}"
    joint = "".join(o for _, o, _ in outs)
    assert "MP_RESULT iters=" in joint

    # iteration parity with a single-process solve of the same system
    mp_iters = int(joint.split("MP_RESULT iters=")[1].split()[0])
    import numpy as np

    from sparse_matrix_math_tpu.parallel import (
        dist_solve, distribute_csr, make_mesh,
    )
    from sparse_matrix_math_tpu.utils.generate import poisson_2d

    a = poisson_2d(48, dtype=np.float32)
    b = np.asarray(a.to_dense(), np.float32).sum(axis=1)
    mesh = make_mesh()  # the suite's single-process 8-device mesh
    res = dist_solve(distribute_csr(a, mesh), b, solver="cg", epsilon=1e-4,
                     mesh=mesh)
    assert mp_iters == int(res.iterations)
