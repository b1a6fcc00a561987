"""Two-process multi-host rendezvous smoke: actually exercises
`jax.distributed.initialize` through the CLI's `initialize()` path
(parallel/multihost.py) with two local CPU processes, then runs a global
collective across them.

tests/test_multihost.py covers config mapping and host-shard math in one
process; this test proves the real rendezvous + cross-process psum work
end-to-end — the JAX equivalent of the reference's DDP/NCCL bring-up
(SURVEY C27, config/codec/dMel_used.yaml:18 `strategy: ddp`).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import sys
    import jax

    jax.config.update("jax_platforms", "cpu")

    from dmel_codec_tpu.parallel.multihost import (
        DistributedConfig, host_shard, initialize,
    )

    port, pid = sys.argv[1], int(sys.argv[2])
    cfg = DistributedConfig(
        enabled=True,
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert initialize(cfg) is True
    assert jax.process_count() == 2, jax.process_count()
    shard, n = host_shard()
    assert (shard, n) == (pid, 2)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = jax.device_count()
    mesh = jax.make_mesh((n_dev,), ("data",))
    local = np.full((n_dev // 2,), float(pid + 1), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local
    )
    total = jax.jit(
        jnp.sum, out_shardings=NamedSharding(mesh, P())
    )(arr)
    # each process contributed (pid+1) per local device
    want = float(n_dev // 2) * (1.0 + 2.0)
    assert float(total) == want, (float(total), want)
    print(f"proc {pid}: psum ok ({float(total)})", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_rendezvous_and_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 CPU device per process (2 global)
    env["PYTHONPATH"] = os.pathsep.join(
        filter(None, [env.get("PYTHONPATH"), os.path.dirname(os.path.dirname(__file__))])
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "psum ok" in out, out
