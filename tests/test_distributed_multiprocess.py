"""Two-PROCESS jax.distributed run on CPU: the multi-host init path
(parallel/distributed.py, the torchrun/NCCL-rendezvous analog,
train_sdxl_zh.sh:6-7,108-114) exercised with real cross-process collectives —
not just a single-process virtual mesh.

Each subprocess owns 2 host-platform devices; the pair forms a 4-device
global mesh. Verified: process discovery, a global pmap psum (crosses the
process boundary), and a jitted reduction over a `data`-sharded global array
built with make_array_from_process_local_data (the production input path).
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.environ["REPO_ROOT"])
    from pea_diffusion_tpu.parallel.distributed import initialize
    from pea_diffusion_tpu.parallel import mesh as pmesh

    coord, pid = sys.argv[1], int(sys.argv[2])
    initialize(coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    # 1. global collective across the process boundary (pmap psum)
    x = jnp.ones((jax.local_device_count(),))
    y = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)
    assert float(np.asarray(y.addressable_data(0))) == 4.0

    # 2. data-sharded global batch -> jitted cross-process reduction
    mesh = pmesh.make_mesh((4, 1))
    sh = pmesh.batch_sharding(mesh)
    local = np.full((2, 3), 1.0 + pid, np.float32)  # process-local rows
    g = jax.make_array_from_process_local_data(sh, local, (4, 3))
    total = jax.jit(lambda a: a.sum(),
                    out_shardings=pmesh.replicated(mesh))(g)
    # rows: 2x(1.0) from p0 + 2x(2.0) from p1, 3 cols -> 18
    assert float(np.asarray(total.addressable_data(0))) == 18.0, total
    print(f"proc {pid} ok")
""")


@pytest.mark.slow
def test_two_process_distributed_psum(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ,
               REPO_ROOT=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    procs = [subprocess.Popen([sys.executable, str(script), coord, str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} ok" in out
