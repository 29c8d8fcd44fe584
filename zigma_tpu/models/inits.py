"""Shared weight initializers (one definition; diffusion and LM stacks must
never drift apart on init semantics).

- ``torch_linear_init``: torch ``nn.Linear`` default —
  kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)) for an (in, out) kernel.
- ``rescaled_linear_init``: the GPT-2 residual-projection rescale the
  reference applies to out_proj weights — torch-default uniform divided by
  sqrt(n_layer) (model_zigma.py:512-541).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def torch_linear_init():
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]  # (in, out) layout
        bound = fan_in**-0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def rescaled_linear_init(n_layer: int):
    def init(key, shape, dtype=jnp.float32):
        bound = shape[0] ** -0.5
        x = jax.random.uniform(key, shape, dtype, -bound, bound)
        return x / math.sqrt(n_layer)

    return init
