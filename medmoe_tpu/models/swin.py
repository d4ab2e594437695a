"""Swin Transformer (Tiny) vision backbone, written TPU-first in JAX/Flax.

Re-implements the behavior the reference gets from HF
``SwinModel.from_pretrained('microsoft/swin-tiny-patch4-window7-224')``
(reference src/models/components/swin.py:119-149): a 4-stage hierarchical
transformer emitting the feature pyramid
``[B,3136,96], [B,784,192], [B,196,384], [B,49,768]`` plus the LayerNorm'd
final hidden state — the inputs to the MoE block.

TPU-native design choices (vs. a torch port):
  * NHWC token layout throughout; window partition/reverse are pure reshapes
    + transposes that XLA fuses away.
  * Static shapes everywhere: shift masks and relative-position-bias indices
    are precomputed with numpy at trace time.
  * bf16 activations, f32 params; attention logits accumulate in f32 on the
    MXU via ``preferred_element_type``.
  * No data-dependent control flow — the whole tower is one fused XLA program.

Why window attention stays in XLA (measured on v5e, B=32): the [49, 32]
per-window matmuls underutilize the MXU, but every alternative loses more —
XLA-level packing of G windows into one [G·49, G·49] masked attention makes
the matmuls efficient yet multiplies the materialized f32 logits (and the
softmax transcendental count) by G (+8 ms/step at G=4); a fused Pallas
kernel with VMEM-resident logits and strip-softmax still ran ~3× slower
than XLA's batched form (per-head small-dot granularity dominates Mosaic
codegen). XLA's batched small matmuls are the best known shape here.

Weight layout maps 1:1 onto the HF checkpoint via
medmoe_tpu/models/convert.py for MedCLIP/ImageNet initialization
(reference med_moe.py:40-62 checkpoint remap).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from medmoe_tpu.models.layers import Fp32LayerNorm, Mlp


@struct.dataclass
class SwinConfig:
    image_size: int = 224
    patch_size: int = 4
    in_channels: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def num_stages(self) -> int:
        return len(self.depths)

    @property
    def stage_dims(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * (2 ** i) for i in range(self.num_stages))


def _relative_position_index(window: int) -> np.ndarray:
    """Static [w², w²] index into the (2w-1)² relative-position-bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))          # [2, w, w]
    coords = coords.reshape(2, -1)                          # [2, w²]
    rel = coords[:, :, None] - coords[:, None, :]           # [2, w², w²]
    rel = rel.transpose(1, 2, 0).astype(np.int64)           # [w², w², 2]
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)                                      # [w², w²]


def _shift_attention_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Static [nW, w², w²] additive mask (-100 across shift boundaries)."""
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    img = img.reshape(h // window, window, w // window, window)
    img = img.transpose(0, 2, 1, 3).reshape(-1, window * window)  # [nW, w²]
    diff = img[:, None, :] - img[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[B, H, W, C] → [B·nW, w², C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_reverse(x: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    """[B·nW, w², C] → [B, H, W, C]."""
    b = x.shape[0] // ((h // window) * (w // window))
    x = x.reshape(b, h // window, w // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


class WindowAttention(nn.Module):
    """Multi-head self-attention within a window, with relative position bias."""

    dim: int
    num_heads: int
    window: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
        # x: [nB, w², C]; mask: [nW, w², w²] or None
        nb, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5

        # separate q/k/v projections (HF Swin's own structure): slicing a
        # fused [.., 3, nH, hd] qkv tensor cost ~3.5 ms/step of pure layout
        # copies in fwd+bwd at stage 0 (2048 windows); three dots fuse clean
        def proj_to_heads(name):
            y = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                         param_dtype=jnp.float32, name=name)(x)
            return y.reshape(nb, n, self.num_heads, head_dim)

        q = proj_to_heads("query")
        k = proj_to_heads("key")
        v = proj_to_heads("value")                           # [nB, n, nH, hd]

        attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                          preferred_element_type=jnp.float32)

        table_len = (2 * self.window - 1) ** 2
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            (table_len, self.num_heads), jnp.float32)
        # table lookup as a constant-selector matmul, not a gather: the
        # index is static, so the [n², table] one-hot folds to a constant
        # and the lookup (and its vjp — the bias-table gradient) runs on
        # the MXU instead of TPU-hostile gather/scatter ops.
        rel_index = _relative_position_index(self.window).reshape(-1)
        selector = np.zeros((n * n, table_len), np.float32)
        selector[np.arange(n * n), rel_index] = 1.0
        bias = jax.lax.dot_general(
            jnp.asarray(selector), bias_table,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        bias = bias.reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(nb // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(nb, self.num_heads, n, n)

        # NOTE: plain jax.nn.softmax on purpose. The bf16-backward-residual
        # softmax (ops/softmax.py) that wins in the GLoRIA local loss was
        # measured HERE at 64.72 ms/step vs 62.8 baseline (B=32, v5e,
        # round 4): the custom_vjp boundary breaks XLA's fusion of the
        # window-attention backward, costing more than the halved residual
        # bytes save. Do not retry without new information.
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.reshape(nb, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    input_resolution: Tuple[int, int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # x: [B, H·W, C]
        h, w = self.input_resolution
        b, n, c = x.shape
        shift = self.shift if min(h, w) > self.window else 0

        shortcut = x
        y = Fp32LayerNorm(epsilon=self.eps, name="norm1")(x)
        y = y.reshape(b, h, w, c)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attention_mask(h, w, self.window, shift))
        else:
            mask = None
        y = window_partition(y, self.window)
        y = WindowAttention(self.dim, self.num_heads, self.window,
                            self.qkv_bias, self.dtype, name="attn")(y, mask)
        y = window_reverse(y, self.window, h, w)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y.reshape(b, n, c)
        y = _drop_path(y, self.drop_path, deterministic, self)
        x = shortcut + y

        y = Fp32LayerNorm(epsilon=self.eps, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                name="mlp")(y)
        y = _drop_path(y, self.drop_path, deterministic, self)
        return x + y


def _drop_path(x: jnp.ndarray, rate: float, deterministic: bool,
               module: nn.Module) -> jnp.ndarray:
    """Stochastic depth on the residual branch (per sample)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    rng = module.make_rng("dropout")
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class PatchMerging(nn.Module):
    """2×2 patch concat → LayerNorm → Linear(4C→2C)."""

    dim: int
    input_resolution: Tuple[int, int]
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.input_resolution
        b, n, c = x.shape
        # 2×2 decimation via reshape + unit slices: `x[:, i::2, j::2]`
        # strided indexing lowers to HLO gather (+ scatter-add vjp), which
        # TPU executes off the vector units; reshape/slice/transpose are
        # layout ops XLA fuses away. x[:, :, i, :, j] ≡ x[:, i::2, j::2].
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        # concat order matches HF SwinPatchMerging for checkpoint parity
        x = jnp.concatenate(
            [x[:, :, 0, :, 0], x[:, :, 1, :, 0],
             x[:, :, 0, :, 1], x[:, :, 1, :, 1]],
            axis=-1)
        x = x.reshape(b, (h // 2) * (w // 2), 4 * c)
        x = Fp32LayerNorm(epsilon=self.eps, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="reduction")(x)


class PatchEmbed(nn.Module):
    """Conv patchify (4×4 stride 4) + LayerNorm."""

    embed_dim: int
    patch_size: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, H, W, 3] NHWC
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="proj")(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        return Fp32LayerNorm(epsilon=self.eps, name="norm")(x)


class SwinBackbone(nn.Module):
    """The full 4-stage tower.

    Returns ``(pyramid, final_hidden)`` where ``pyramid`` matches the
    reference's ``hidden_states[0..3]`` (embedding output + each stage output
    after downsampling) and ``final_hidden`` is the LayerNorm'd last hidden
    state (reference swin.py:134-139).
    """

    config: SwinConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, deterministic: bool = True):
        cfg = self.config
        res = cfg.image_size // cfg.patch_size
        x = PatchEmbed(cfg.embed_dim, cfg.patch_size, cfg.layer_norm_eps,
                       cfg.dtype, name="patch_embed")(pixels.astype(cfg.dtype))

        pyramid = [x]
        total_blocks = sum(cfg.depths)
        block_idx = 0
        for stage in range(cfg.num_stages):
            dim = cfg.stage_dims[stage]
            h = w = res // (2 ** stage)
            for d in range(cfg.depths[stage]):
                drop_path = cfg.drop_path_rate * block_idx / max(total_blocks - 1, 1)
                x = SwinBlock(
                    dim=dim,
                    num_heads=cfg.num_heads[stage],
                    window=cfg.window_size,
                    shift=0 if d % 2 == 0 else cfg.window_size // 2,
                    input_resolution=(h, w),
                    mlp_ratio=cfg.mlp_ratio,
                    qkv_bias=cfg.qkv_bias,
                    drop_path=drop_path,
                    eps=cfg.layer_norm_eps,
                    dtype=cfg.dtype,
                    name=f"stage{stage}_block{d}",
                )(x, deterministic=deterministic)
                block_idx += 1
            if stage < cfg.num_stages - 1:
                x = PatchMerging(dim, (h, w), cfg.layer_norm_eps, cfg.dtype,
                                 name=f"stage{stage}_downsample")(x)
                pyramid.append(x)

        final = Fp32LayerNorm(epsilon=cfg.layer_norm_eps, name="norm")(x)
        return pyramid, final
