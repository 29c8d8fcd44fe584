"""Regression tests for the driver entry points (__graft_entry__).

Round-1 VERDICT: the driver-recorded multichip dryrun failed because
``dryrun_multichip`` relied on the ambient platform and the session
sitecustomize forces ``jax_platforms="axon,cpu"`` — touching the TPU
client.  These tests pin the fix: the dryrun must force an n-device
virtual CPU mesh itself, and must recover via a clean subprocess when a
backend is already initialized on the wrong platform / device count.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env_overrides: dict) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.update(env_overrides)
    return subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=600)


def test_dryrun_multichip_fresh_process():
    """Driver scenario: fresh process, no platform forcing from outside."""
    proc = _run(
        "import sys; sys.path.insert(0, %r)\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n" % REPO,
        # driver does not pass the XLA flag reliably; dryrun must self-force
        {"XLA_FLAGS": "", "JAX_PLATFORMS": ""},
    )
    assert proc.returncode == 0, proc.stderr
    assert "dryrun_multichip(8)" in proc.stdout
    assert "dryrun_seq_parallel(8)" in proc.stdout


def test_dryrun_multichip_backend_already_initialized():
    """Backend pre-initialized with 1 device -> falls back to subprocess."""
    proc = _run(
        "import sys; sys.path.insert(0, %r)\n"
        "import jax\n"
        # force CPU in-config too: sitecustomize overrides the env var with
        # jax_platforms='axon,cpu', and when the axon tunnel is down a bare
        # jax.devices() hangs on TPU client init — this test is about the
        # wrong DEVICE COUNT, not about which platform answers
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1  # backend now up, wrong count\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n" % REPO,
        {"XLA_FLAGS": "", "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr
    assert "dryrun_multichip(8)" in proc.stdout
    assert "dryrun_seq_parallel(8)" in proc.stdout
