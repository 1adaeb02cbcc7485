"""FAST multi-process smoke (in the default suite): two OS processes
rendezvous through jax.distributed over localhost, build the GLOBAL
2-device mesh with parallel.mesh helpers, and run a jitted
data-parallel gradient step on a micro conv model — so every default
test run exercises a real multi-process collective path (the
jax.distributed analog of the reference's DDP init, train.py:649-658).
The full flagship 2x4-device training-step version stays in `-m slow`
(test_multihost.py)."""

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np

WORKER = textwrap.dedent("""
    import json, sys
    sys.path.insert(0, "__REPO__")
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=nproc, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    import flax.linen as nn
    from face_detection_multi_scale_tpu.parallel.mesh import (
        batch_sharding, make_data_mesh, replicated)

    assert jax.process_count() == nproc
    devices = jax.devices()
    assert len(devices) == nproc  # one per process
    mesh = make_data_mesh(devices)

    class Micro(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), name="c1")(x)
            x = nn.relu(x)
            return nn.Conv(1, (1, 1), name="c2")(x).mean()

    model = Micro()
    x_local = np.full((1, 16, 16, 3), pid + 1, np.float32)
    params = model.init(jax.random.PRNGKey(0), x_local)

    def loss_fn(p, x):
        return model.apply(p, x)

    step = jax.jit(jax.value_and_grad(loss_fn))
    with mesh:
        sh, rep = batch_sharding(mesh), replicated(mesh)
        params = jax.device_put(params, rep)
        # each process contributes its local shard of the global batch;
        # the mean over the sharded batch is a cross-process collective
        gx = jax.make_array_from_process_local_data(sh, x_local)
        loss, grads = step(params, gx)
        gnorm = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.abs(g).sum(), grads, 0.0)
        print(json.dumps({"pid": pid, "loss": float(loss),
                          "gnorm": float(gnorm)}), flush=True)
""")


def test_two_process_psum_smoke(tmp_path):
    repo = str(Path(__file__).resolve().parent.parent)
    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("__REPO__", repo))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-3000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    # the loss spans both processes' shards (values 1 and 2), so it can
    # only be right if the cross-process collective actually ran
    assert outs[0]["loss"] == outs[1]["loss"]
    assert outs[0]["gnorm"] == outs[1]["gnorm"]
    assert np.isfinite(outs[0]["loss"])
