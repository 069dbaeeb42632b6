"""Two-process jax.distributed demonstration of the multi-host path.

VERDICT r4 item 5: the multi-host scaffolding (sys/mesh.py
init_distributed + make_multihost_row_mesh) existed but no test actually
ran >= 2 processes.  Real TPU pods are not available here, but
jax.distributed works with multiple CPU processes on one machine — this
spawns 2 processes x 4 virtual CPU devices = one 8-device "rows" mesh
spanning a process (DCN-analog) boundary and checks a GSPMD reduction
and a ring ppermute across it.

Reference role: the MPI world communicator (SlepcInitialize,
src/sys/slepcinit.c:255) / SURVEY §2.13 communication backend.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, port, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    sys.path.insert(0, repo)
    from slepc_tpu.sys.mesh import (init_distributed,
                                    make_multihost_row_mesh, ROWS)
    ok = init_distributed(f"localhost:{port}", 2, pid)
    assert ok, "distributed runtime did not come up"
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, len(jax.devices())
    mesh = make_multihost_row_mesh()
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = 1024
    x_host = np.arange(n, dtype=np.float64)
    sh = NamedSharding(mesh, P(ROWS))
    x = jax.make_array_from_callback((n,), sh, lambda idx: x_host[idx])

    # GSPMD cross-process reduction (the fused-psum role)
    f = jax.jit(lambda x: jnp.sum(x * x),
                out_shardings=NamedSharding(mesh, P()))
    val = float(f(x))
    expect = float(np.sum(x_host * x_host))
    assert abs(val - expect) <= 1e-6 * expect, (val, expect)

    # ring ppermute across the process boundary (the DIA halo role)
    def ring(xs):
        return jax.lax.ppermute(xs, ROWS,
                                [(i, (i + 1) % 8) for i in range(8)])
    g = jax.jit(jax.shard_map(ring, mesh=mesh, in_specs=P(ROWS),
                              out_specs=P(ROWS)))
    y = g(x)
    s2 = float(f(y))
    assert abs(s2 - expect) <= 1e-6 * expect, (s2, expect)
    print(f"proc{pid} OK {val}", flush=True)
""")


@pytest.mark.slow
def test_two_process_row_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), str(port), repo],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("2-process mesh test timed out")
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{out}\n{err[-3000:]}"
    assert "proc0 OK" in outs[0][1]
    assert "proc1 OK" in outs[1][1]
