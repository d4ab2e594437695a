"""Shared neural-net building blocks.

TPU-first conventions used across the model zoo:
  * params live in float32, activations compute in (configurable) bfloat16 —
    matmuls hit the MXU in bf16 with f32 accumulation
    (``preferred_element_type``);
  * LayerNorm always computes in float32 then casts back (the reference keeps
    a dedicated ``Fp32LayerNorm`` for the same mixed-precision safety,
    reference src/models/components/normalizations.py:8-20).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


class Fp32LayerNorm(nn.Module):
    """LayerNorm computed in float32 regardless of input dtype."""

    epsilon: float = 1e-5
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        y = nn.LayerNorm(
            epsilon=self.epsilon,
            use_bias=self.use_bias,
            use_scale=self.use_scale,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """erf-based GELU (HF 'gelu'; the tanh approximation diverges ~1e-3)."""
    return nn.gelu(x, approximate=False)


class Mlp(nn.Module):
    """Transformer FFN: Linear → activation → Linear."""

    hidden_dim: int
    out_dim: Optional[int] = None
    activation: Callable = gelu_exact
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        x = self.activation(x)
        x = nn.Dense(out_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(x)
        return x


class MLPStack(nn.Module):
    """Configurable linear stack (reference src/models/components/mlp.py
    analogue): hidden layers with activation, optional LayerNorm + dropout."""

    hidden_dims: Sequence[int]
    activation: Callable = nn.relu
    normalize: bool = False
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i, dim in enumerate(self.hidden_dims):
            x = nn.Dense(dim, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"layer_{i}")(x)
            if i < len(self.hidden_dims) - 1:
                if self.normalize:
                    x = Fp32LayerNorm(name=f"norm_{i}")(x)
                x = self.activation(x)
                if self.dropout_rate > 0:
                    x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """x / ||x||_2 along ``axis`` (torch.norm-division analogue), via
    ``safe_norm`` — the eps-inside-the-sqrt form whose gradient is finite
    at x = 0 (see its docstring; one shared definition of the idiom)."""
    from medmoe_tpu.ops.losses import safe_norm

    xf = x.astype(jnp.float32)
    return (xf / safe_norm(xf, axis=axis, eps=eps)).astype(x.dtype)
