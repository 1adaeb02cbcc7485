"""Real multi-process (multi-host simulation) training: two OS processes
join through jax.distributed.initialize over localhost, each owning 4
virtual CPU devices, and run one data-parallel train step over the
8-device GLOBAL mesh — the jax.distributed equivalent of the reference's
two-node DDP launch (train.py:649-658). Verifies the multi-host code
path actually executes: global mesh construction from local devices,
per-host disjoint data sharding via DataLoader(num_hosts=...), and a
loss identical across processes (the psum covers the global batch)."""

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

WORKER = textwrap.dedent("""
    import json, os, sys
    sys.path.insert(0, "__REPO__")
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=nproc, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.parallel.mesh import (
        batch_sharding, make_data_mesh, replicated)
    from face_detection_multi_scale_tpu.train.hyp import HYP_SCRATCH_P6
    from face_detection_multi_scale_tpu.train.targets import (
        build_targets_batched)
    from face_detection_multi_scale_tpu.train.trainer import (
        TrainConfig, create_train_state, make_train_step)

    assert jax.process_count() == nproc, jax.process_count()
    devices = jax.devices()          # GLOBAL device list (8)
    assert len(devices) == 8, len(devices)
    mesh = make_data_mesh(devices)

    spec = zoo.get_spec("yolov7-lite-t")
    S, B = 64, 8                     # one image per global device
    model, variables = init_model(spec, img_size=S)
    state = create_train_state(variables)
    step = make_train_step(model, TrainConfig(
        epochs=2, steps_per_epoch=2, batch_size=B), HYP_SCRATCH_P6, S)

    rng = np.random.default_rng(0)   # same seed -> same global batch
    images = rng.random((B, S, S, 3)).astype(np.float32)
    labels = np.concatenate([np.concatenate([
        np.full((2, 1), b), np.zeros((2, 1)),
        rng.uniform(0.3, 0.7, (2, 2)), rng.uniform(0.1, 0.3, (2, 2)),
        rng.uniform(0.2, 0.8, (2, 10))], axis=1)
        for b in range(B)]).astype(np.float32)
    grids = [(S // s, S // s) for s in spec.strides]
    targets = build_targets_batched(labels, B, spec, grids,
                                    cap_per_image=16)

    with mesh:
        sh, rep = batch_sharding(mesh), replicated(mesh)
        # multi-host feeding: each process contributes only its local
        # shard of the global array (make_array_from_process_local_data)
        state = jax.device_put(state, rep)
        gi = jax.make_array_from_process_local_data(sh, images)
        gt = jax.tree.map(lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), targets)
        state, loss, comps = step(state, gi, gt)
        loss = float(loss)

    # per-host loader disjointness across the two processes
    from face_detection_multi_scale_tpu.data.dataset import DataLoader
    class FakeDS:
        def __len__(self): return 12
        def get(self, i):
            return (np.zeros((8, 8, 3), np.uint8),
                    np.zeros((0, 16), np.float32), str(i), None)
    dl = DataLoader(FakeDS(), 2, shuffle=True, seed=5,
                    num_hosts=nproc, host_id=pid, workers=1)
    mine = sorted(p for _, _, ps, _ in dl for p in ps)
    print(json.dumps({"pid": pid, "loss": loss, "paths": mine}),
          flush=True)
""")


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    repo = str(Path(__file__).resolve().parent.parent)
    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("__REPO__", repo))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, err[-3000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # the psum'd loss is identical on both hosts
    assert outs[0]["loss"] == outs[1]["loss"]
    assert np.isfinite(outs[0]["loss"])
    # DistributedSampler equivalence: disjoint, complete index split
    a, b = set(outs[0]["paths"]), set(outs[1]["paths"])
    assert not (a & b)
    assert len(a | b) == 12
