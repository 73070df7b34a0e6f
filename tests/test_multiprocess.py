"""Real multi-process coordination test for parallel/distributed.py.

Spawns TWO python processes that initialize jax.distributed over a local
coordinator (CPU backend), build a 2-device global mesh (one CPU device per
process), assemble a global array from per-process shards, and run a jitted
cross-process reduction. This is the smallest faithful model of a multi-host
TPU pod the CI host can run — it exercises exactly the call pattern
trainer._device_batch + initialize_multihost use.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

CHILD = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    proc_id = int(sys.argv[1]); port = sys.argv[2]
    import jax
    jax.config.update("jax_platforms", "cpu")
    from vlsfr_tpu.parallel.distributed import (
        initialize_multihost, is_lead_host, local_batch_slice)
    ok = initialize_multihost(f"127.0.0.1:{port}", 2, proc_id)
    assert ok, "initialize_multihost returned False in a 2-process run"
    assert jax.process_count() == 2
    sl = local_batch_slice(8)
    assert (sl.start, sl.stop) == (proc_id * 4, proc_id * 4 + 4), sl

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices())
    assert devs.size == 2, devs
    mesh = Mesh(devs, ("data",))
    sh = NamedSharding(mesh, P("data"))
    local = np.full((4,), float(proc_id + 1), np.float32)
    ga = jax.make_array_from_process_local_data(sh, local)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(ga)
    # rows 0-3 hold 1.0 (proc 0), rows 4-7 hold 2.0 (proc 1)
    assert float(total) == 12.0, float(total)
    print("MULTIPROC_OK", proc_id, "lead" if is_lead_host() else "follower",
          flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_init(tmp_path):
    port = _free_port()
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo_root)
    env.pop("XLA_FLAGS", None)  # no virtual-device fan-out in the children
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
            cwd=repo_root,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=180)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("2-process distributed test timed out")
    for rc, out, err in outs:
        assert rc == 0, f"child failed rc={rc}\nstdout:\n{out}\nstderr:\n{err[-3000:]}"
        assert "MULTIPROC_OK" in out
    assert any("lead" in out for _, out, _ in outs)
    assert any("follower" in out for _, out, _ in outs)
