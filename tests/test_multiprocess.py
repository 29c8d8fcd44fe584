"""True multi-process distributed tests (2 CPU processes via jax.distributed).

Validates the multi-host code paths the reference never tests
(SURVEY.md §4: "Distributed testing: none"): per-host shard splitting,
metric state all-gather on compute, and a cross-process data-parallel
train step.
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(f"localhost:{port}", num_processes=n,
                               process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    sys.path.insert(0, %r)

    # 1) per-host shard split is disjoint and complete
    from zigma_tpu.data import split_by_host
    urls = [f"shard-{i}" for i in range(10)]
    mine = split_by_host(urls)
    all_mine = multihost_utils.process_allgather(
        jnp.asarray([urls.index(u) for u in mine]))
    assert sorted(np.asarray(all_mine).ravel().tolist()) == list(range(10))

    # 2) distributed metric compute: each process sees different fakes;
    #    sync=True must give every process the same (global) FID
    from zigma_tpu.metrics import MyMetric, patch_statistics_extractor
    rng = np.random.default_rng(0)          # same real data on both
    real = rng.random((32, 3, 8, 8))
    fake = np.roll(real, 1, axis=0) + 0.01 * (pid + 1)  # differs per process
    m = MyMetric(choices=["fid"], extractor=patch_statistics_extractor(4))
    m.update_real(real)
    m.update_fake(fake)
    fid = m.compute(sync=True)["fid"]
    fids = multihost_utils.process_allgather(
        jnp.asarray([fid]))
    got = np.asarray(fids).ravel()
    assert np.allclose(got[0], got[1]), got

    # 3) cross-process DP train step: global mean loss identical everywhere
    from zigma_tpu.models import ZigMa
    from zigma_tpu.train import (TrainState, create_optimizer,
                                 create_train_step, make_diffusion_loss_fn)
    from zigma_tpu.transport import create_transport
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    model = ZigMa(in_channels=4, embed_dim=32, depth=2, img_dim=8,
                  patch_size=2, scan_type="zigzagN2", use_pe=2)
    x = jnp.zeros((2, 4, 8, 8)); t = jnp.zeros((2,))
    params = model.init(jax.random.PRNGKey(0), x, t)
    opt = create_optimizer()
    state = TrainState.create(params, opt)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    rep = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda a: multihost_utils.host_local_array_to_global_array(
            np.asarray(a), mesh, P()), state)
    loss_fn = make_diffusion_loss_fn(model, transport := create_transport(
        "Linear", "velocity"))
    step = create_train_step(loss_fn, opt)
    local = np.random.default_rng(pid).normal(size=(1, 4, 8, 8)).astype(
        np.float32)
    batch = {"x": multihost_utils.host_local_array_to_global_array(
        local, mesh, P("data"))}
    state, metrics = step(state, jax.random.PRNGKey(1), batch)
    loss = float(multihost_utils.process_allgather(
        metrics["loss"], tiled=True).ravel()[0])
    losses = np.asarray(multihost_utils.process_allgather(
        jnp.asarray([loss]))).ravel()
    assert np.allclose(losses[0], losses[1]), losses
    print(f"WORKER_OK {pid}", flush=True)
""" % REPO)


@pytest.mark.skipif(os.environ.get("ZIGMA_SKIP_MP") == "1",
                    reason="multi-process test disabled")
def test_two_process_distributed(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = "29451"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # one device per process
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {i}" in out
