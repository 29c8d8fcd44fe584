"""Test config: run everything on a virtual 8-device CPU mesh.

The session image boots an `axon` TPU plugin from sitecustomize and forces
``jax.config.jax_platforms = "axon,cpu"`` — which overrides the
JAX_PLATFORMS env var.  So we both set the env (for subprocesses) and update
the jax config directly (for this process), before any backend initializes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (sitecustomize may have imported it already)

jax.config.update("jax_platforms", "cpu")

# repo root on sys.path so `import zigma_tpu` works without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled-executable references after every test module.

    With 500+ tests in one process the XLA:CPU client accumulates every
    jitted program's LLVM JIT code; past a session-cumulative threshold a
    later (arbitrary, innocuous) compile segfaults inside
    ``backend_compile_and_load`` — observed twice, deterministically, at
    the same mid-suite test, while every file-level subset runs green.
    Dropping the cache between modules lets the backend release JIT
    memory; cross-module cache hits are rare (different shapes), so the
    recompile cost is noise.
    """
    yield
    jax.clear_caches()
