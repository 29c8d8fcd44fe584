"""Orbax checkpointing with the reference's logical checkpoint layout.

The reference saves a single torch dict
``{model, ema, opt, args, train_steps, best_fid}`` every ``ckpt_every``
steps, rank-0 only, named ``{step:07d}.pt``, and resumes from the latest by
mtime (reference: train_acc.py:492-505, utils/train_utils.py:136-149).

Here: orbax ``StandardCheckpointer`` with the same logical content, saved as
``{ckpt_dir}/{step:07d}``; ``latest_checkpoint`` picks the largest step
number (deterministic, unlike mtime).  Multi-host safe: orbax coordinates
across ``jax.process_index()`` internally.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint"]

_STEP_RE = re.compile(r"^(\d{7,})$")


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, state, extra: Optional[dict] = None):
    """Save {state, extra} at ``ckpt_dir/{step:07d}``."""
    step = int(jax.device_get(state.step))  # replicated scalar: host-safe
    path = os.path.join(os.path.abspath(ckpt_dir), f"{step:07d}")
    ckptr = _checkpointer()
    # device arrays pass through as-is: orbax writes each process's
    # addressable shards, which is the ONLY correct path for FSDP/PP
    # states sharded across processes (a jax.device_get here would raise
    # on non-addressable shards in multi-host runs)
    payload = {"state": state}
    if extra:
        payload["extra"] = extra
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Largest-step checkpoint path, or None
    (vs. the reference's mtime-based get_latest_checkpoint,
    utils/train_utils.py:136-149)."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [d for d in os.listdir(ckpt_dir) if _STEP_RE.match(d)]
    if not steps:
        return None
    return os.path.join(os.path.abspath(ckpt_dir), max(steps, key=int))


def restore_checkpoint(path: str, target_state, extra_target: Optional[dict] = None):
    """Restore into the given abstract/concrete state pytree.

    ``jax.Array`` leaves in the target become abstract
    shape/dtype/sharding specs, so the restored state comes back with
    the same placement — including FSDP/PP layouts sharded across
    processes, where round-tripping through a host template would raise
    on non-addressable shards.  numpy/host leaves restore host-side
    unchanged (the sample/convert CLIs' path).
    """
    def _absify(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        return x

    ckptr = _checkpointer()
    payload = {"state": jax.tree.map(_absify, target_state)}
    if extra_target is not None:
        payload["extra"] = extra_target
    restored = ckptr.restore(path, payload)
    if extra_target is not None:
        return restored["state"], restored["extra"]
    return restored["state"]
