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

import functools
import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


# ---------------------------------------------------------------------------
# LayerNorm with f32 statistics and COMPACT residuals.
#
# The default autodiff of `cast-to-f32 → LayerNorm` stores f32-sized
# intermediates for the backward; profiled at ~6.2 ms of the 63.3 ms B=32
# step (docs/PERFORMANCE.md round-4 profile — cross-lane stat reductions +
# their HBM traffic). This custom_vjp keeps the residuals at the input's
# own dtype (bf16 activations → half the bytes) plus two per-row f32 stats,
# and recomputes x̂ in-register in the backward. Statistics, the normalize,
# and every backward contraction still run in f32 — same math as the
# reference's Fp32LayerNorm (src/models/components/normalizations.py:8-20),
# grads within one bf16 rounding of the autodiff path (unit-tested).
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln_compact(x, gamma, beta, eps):
    return _ln_compact_fwd(x, gamma, beta, eps)[0]


def _ln_stats(xf, eps):
    # flax nn.LayerNorm fast-variance form: var = E[x²] − E[x]²
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    return mean, rstd


def _ln_compact_fwd(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mean, rstd = _ln_stats(xf, eps)
    y = ((xf - mean) * rstd) * gamma + beta
    return y.astype(x.dtype), (x, gamma, mean, rstd)


def _ln_compact_bwd(eps, res, dy):
    x, gamma, mean, rstd = res
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    xhat = (xf - mean) * rstd
    dgamma = jnp.sum(dyf * xhat, axis=tuple(range(dy.ndim - 1)))
    dbeta = jnp.sum(dyf, axis=tuple(range(dy.ndim - 1)))
    dxhat = dyf * gamma
    dx = rstd * (dxhat
                 - jnp.mean(dxhat, axis=-1, keepdims=True)
                 - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    return dx.astype(x.dtype), dgamma, dbeta


_ln_compact.defvjp(_ln_compact_fwd, _ln_compact_bwd)


def _ln_impl() -> str:
    """'xla' (default: autodiff of flax nn.LayerNorm in f32) or 'compact'
    (the custom_vjp above). Measured end to end on v5e
    (scripts/bench_step_variants.py, docs/PERFORMANCE.md round-5): compact
    is speed-NEUTRAL in both the B=32 step (63.15 vs 62.81 ms) and the
    memory-bound monolithic B=256 kernel regime (201.5 vs 202.4 pairs/s) —
    the LN bucket is VPU statistic work, not residual traffic — so the
    fusion-friendly autodiff path stays the default and the compact
    implementation remains as the measured negative result."""
    return os.environ.get("MEDMOE_LN_IMPL", "xla")


class _LNParams(nn.Module):
    """Parameter holder matching nn.LayerNorm's tree exactly
    (…/LayerNorm_0/{scale,bias}) so checkpoints and the torch converters
    (models/convert.py) are layout-invariant across LN implementations."""

    dim: int

    @nn.compact
    def __call__(self):
        gamma = self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        return gamma, beta


class Fp32LayerNorm(nn.Module):
    """LayerNorm computed in float32 regardless of input dtype."""

    epsilon: float = 1e-5
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        if (_ln_impl() == "compact" and self.use_bias and self.use_scale
                and x.ndim >= 2):
            gamma, beta = _LNParams(x.shape[-1], name="LayerNorm_0")()
            return _ln_compact(x, gamma, beta, self.epsilon)
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
