"""Softmax with a bfloat16 backward residual.

On TPU the f32 softmax output XLA stores for the vjp is often the largest
activation a block keeps across the backward pass — the GLoRIA word-region
attention stores two [Bt,Bi,M,T] tensors (2 × 321 MB at the flagship
B=32/M=3136 shapes), Swin-T's window attention ~274 MB of [nW,H,49,49]
probabilities per step. The vjp y·(g − Σ y·g) only needs y, and y is a
probability in [0,1] where bf16's 8 mantissa bits cost ~0.4% relative —
the same rounding class both consumers already apply to y in the forward
before their bf16 einsums, and far below the 3.5% Pallas-backward delta
measured training-neutral (docs/PERFORMANCE.md round 4).

``softmax_bf16_residual`` keeps the forward value EXACT f32 and rounds only
the stored residual. MEDMOE_SOFTMAX_RES=f32 restores jax.nn.softmax
everywhere it is used (A/B kill switch).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def softmax_bf16_residual(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jax.nn.softmax(x, axis=axis)


def _fwd(x, axis):
    y = jax.nn.softmax(x, axis=axis)
    return y, y.astype(jnp.bfloat16)


def _bwd(axis, y16, g):
    y = y16.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    d = y * (gf - jnp.sum(y * gf, axis=axis, keepdims=True))
    # the cotangent must carry the PRIMAL dtype; softmax preserves dtype,
    # so g's dtype is the primal's (a bf16 caller would otherwise crash
    # with a custom_vjp dtype mismatch)
    return (d.astype(g.dtype),)


softmax_bf16_residual.defvjp(_fwd, _bwd)


def softmax(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """bf16-residual softmax, unless MEDMOE_SOFTMAX_RES=f32."""
    if os.environ.get("MEDMOE_SOFTMAX_RES") == "f32":
        return jax.nn.softmax(x, axis=axis)
    return softmax_bf16_residual(x, axis)
