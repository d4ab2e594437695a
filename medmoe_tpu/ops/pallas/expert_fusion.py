"""Fused MedMoE expert branch — Pallas TPU kernels.

Computes the whole gather-mode expert branch (reference
src/models/components/swin.py:11-80 ``Expert.forward``: per-scale 1×1
projection + ReLU, linear interpolation of every scale to the largest patch
count, cross-scale attention MLP, softmax over scales, weighted sum) for the
per-sample routed expert in ONE kernel per direction:

  * forward  — grid (B,): per-sample expert parameters are selected by the
    BlockSpec index map from the scalar-prefetched ``expert_idx`` (the
    parameter gather costs a DMA, not FLOPs or HBM materialization), the
    per-scale activations h_s / upsampled maps u_s / attention tensors stay
    in VMEM, and only the fused [P, E] output is written to HBM. The XLA
    form of the same math round-trips ≈0.6 GB of [B, P, E]-sized
    intermediates through HBM per step at B=32.

  * backward — grid (B,): recomputes the (cheap, deterministic) forward
    chain in VMEM and emits d_pyramid plus per-sample parameter gradients;
    the tiny [B→K] one-hot contraction that scatters per-sample parameter
    grads into the stacked expert bank runs in XLA.

The patch-axis linear interpolation runs as a dense matmul against the
precomputed ``linear_interp_matrix`` (exact torch F.interpolate
align_corners=False semantics — medmoe_tpu/models/moe.py). For the pyramid's
power-of-two ratios every interpolation weight is dyadic, hence EXACT in
bf16, and the [P, P_s] matmul rides the MXU (≈2.5 GMAC/sample — noise next
to the attention MLP) while its transpose gives the exact backward. This
avoids every Mosaic-unfriendly op: no sublane gathers, no [P_s, r, E]
reshape collapses, no unaligned dynamic slices (all three fail to compile
on current Mosaic — probed).

The attention head bias ``attn_b2`` adds the same per-expert scalar to every
scale's logit, so it cancels in the softmax over scales: the kernels skip it
and its gradient is exactly zero (returned as zeros).

Numerics mirror the XLA path step for step (bf16 MXU inputs, f32
accumulation, f32 lerp of bf16 values, attention weights rounded through
bf16 before the combine), so outputs match the reference-parity-tested XLA
implementation to bf16 tolerance.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def _interp_mats(p_list: Sequence[int], p_max: int):
    """Per-scale [p_max, P_s] interpolation matrices (u = G @ h), bf16.

    ``linear_interp_matrix(src, dst)`` is [src, dst]; transpose to the
    left-multiply form. Identity scales return None (skipped in-kernel).
    """
    from medmoe_tpu.models.moe import linear_interp_matrix

    mats = []
    for p_s in p_list:
        if p_s == p_max:
            mats.append(None)
        else:
            g = linear_interp_matrix(p_s, p_max).T          # [p_max, P_s]
            mats.append(jnp.asarray(g, dtype=jnp.bfloat16))
    return mats


def _dot(a, b, dims, prefer=jnp.float32):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=prefer)


def expert_fusion_supported(p_list: Sequence[int], p_max: int) -> bool:
    """Fused path requires integer upsample ratios (the pyramid always
    satisfies this: each Swin stage halves the grid)."""
    return all(p_max % p_s == 0 for p_s in p_list)


def _resolve_impl() -> str:
    impl = os.environ.get("MEDMOE_EXPERT_IMPL", "auto")
    if impl == "auto":
        platform = jax.devices()[0].platform
        impl = "pallas" if platform in ("tpu", "axon") else "xla"
    return impl


def use_fused_expert(p_list: Sequence[int], p_max: int,
                     dtype=None) -> bool:
    impl = _resolve_impl()
    if impl == "xla":
        return False
    # The kernels are bf16 by design (weights/biases rounded on entry, f32
    # accumulation): a model configured with dtype=float32 — the numerics-
    # debug setting — must take the XLA einsum path, or the dtype knob
    # would silently compute the expert branch in bf16 anyway.
    if dtype is not None and jnp.dtype(dtype) != jnp.dtype(jnp.bfloat16):
        return False
    return expert_fusion_supported(p_list, p_max)


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _fwd_kernel(idx_ref, *refs, n_scales: int, p_max: int,
                identity_scale: Sequence[bool]):
    """One grid step = one sample. Ref order (after scalar prefetch):
    x_s ×S, W_s ×S, b_s ×S, [G_s for non-identity scales], w1, b1, w2,
    then outputs: out."""
    del idx_ref
    s_count = n_scales
    xs = refs[:s_count]
    ws = refs[s_count:2 * s_count]
    bs = refs[2 * s_count:3 * s_count]
    n_g = sum(0 if ident else 1 for ident in identity_scale)
    gs_iter = iter(refs[3 * s_count:3 * s_count + n_g])
    gs = [None if ident else next(gs_iter) for ident in identity_scale]
    w1_ref, b1_ref, w2_ref = refs[3 * s_count + n_g:3 * s_count + n_g + 3]
    out_ref = refs[3 * s_count + n_g + 3]

    w1 = w1_ref[0]                                   # [E, H] bf16
    b1 = b1_ref[0]                                   # [1, H] f32
    w2 = w2_ref[0]                                   # [1, H] bf16

    us = []
    logits = []
    for s in range(s_count):
        x = xs[s][0]                                 # [P_s, D_s] bf16
        w = ws[s][0]                                 # [D_s, E] bf16
        b = bs[s][0]                                 # [1, E] f32
        h = _dot(x, w, ((1,), (0,)))                 # [P_s, E] f32
        h = jax.nn.relu(h + b).astype(jnp.bfloat16)
        if gs[s] is None:
            u = h                                    # identity resize
        else:
            g = gs[s][...]                           # [P, P_s] bf16
            u = _dot(g, h, ((1,), (0,))).astype(jnp.bfloat16)
        us.append(u)                                 # [P, E] bf16
        a = _dot(u, w1, ((1,), (0,)))                # [P, H] f32
        a = jax.nn.relu(a + b1).astype(jnp.bfloat16)
        prod = a.astype(jnp.float32) * w2.astype(jnp.float32)
        logits.append(jnp.sum(prod, axis=1, keepdims=True))  # [P, 1] f32
        # attn_b2 is omitted: a per-expert constant on every scale's logit
        # cancels in the softmax over scales

    l_all = jnp.concatenate(logits, axis=1)          # [P, S] f32
    att = jax.nn.softmax(l_all, axis=1).astype(jnp.bfloat16)

    out = jnp.zeros((p_max, us[0].shape[1]), jnp.float32)
    for s in range(s_count):
        out = out + us[s].astype(jnp.float32) \
            * att[:, s:s + 1].astype(jnp.float32)
    out_ref[0] = out


def _fwd_pallas(xs, wp, bp, w1, b1, w2, expert_idx, interp_mats):
    b = xs[0].shape[0]
    e = wp[0].shape[2]
    h_dim = w1.shape[2]
    k = wp[0].shape[0]
    p_max = max(x.shape[1] for x in xs)
    s_count = len(xs)
    identity = [m is None for m in interp_mats]

    in_specs = []
    args = []
    for x in xs:                                     # pyramid
        in_specs.append(pl.BlockSpec((1,) + x.shape[1:],
                                     lambda bi, idx: (bi, 0, 0)))
        args.append(x)
    for w in wp:                                     # per-expert proj weights
        in_specs.append(pl.BlockSpec((1,) + w.shape[1:],
                                     lambda bi, idx: (idx[bi], 0, 0)))
        args.append(w.astype(jnp.bfloat16))
    for bias in bp:                                  # proj biases [K, E]
        in_specs.append(pl.BlockSpec((1, 1, e),
                                     lambda bi, idx: (idx[bi], 0, 0)))
        # round through bf16 first: the XLA path's per-sample parameter
        # pick casts biases to the compute dtype before the f32 upcast, and
        # the backward recompute does the same — all three chains must see
        # identical bias values or the recomputed ReLU masks and softmax
        # weights drift from the forward actually evaluated
        args.append(bias.reshape(k, 1, e).astype(jnp.bfloat16)
                    .astype(jnp.float32))
    for m in interp_mats:                            # interp matrices
        if m is not None:
            in_specs.append(pl.BlockSpec(m.shape, lambda bi, idx: (0, 0)))
            args.append(m)
    in_specs.append(pl.BlockSpec((1, e, h_dim),
                                 lambda bi, idx: (idx[bi], 0, 0)))
    args.append(w1.astype(jnp.bfloat16))
    in_specs.append(pl.BlockSpec((1, 1, h_dim),
                                 lambda bi, idx: (idx[bi], 0, 0)))
    args.append(b1.reshape(k, 1, h_dim).astype(jnp.bfloat16)
                .astype(jnp.float32))
    in_specs.append(pl.BlockSpec((1, 1, h_dim),
                                 lambda bi, idx: (idx[bi], 0, 0)))
    args.append(w2.reshape(k, h_dim, 1).transpose(0, 2, 1)
                .astype(jnp.bfloat16))

    kernel = functools.partial(_fwd_kernel, n_scales=s_count, p_max=p_max,
                               identity_scale=identity)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, p_max, e), lambda bi, idx: (bi, 0, 0)))
    flops_attn = 2 * b * p_max * s_count * e * h_dim
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, p_max, e), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * flops_attn,
            bytes_accessed=b * p_max * e * 4,
            transcendentals=b * p_max * s_count),
    )(expert_idx.astype(jnp.int32), *args)


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------

def _bwd_kernel(idx_ref, *refs, n_scales: int, p_max: int,
                identity_scale: Sequence[bool]):
    """Recompute-in-VMEM backward. Ref order: x_s ×S, W_s ×S, b_s ×S,
    [G_s], w1, b1, w2, d_out; outputs: d_x_s ×S, d_wp_s ×S, d_bp_s ×S,
    d_w1, d_b1, d_w2 (all per-sample)."""
    del idx_ref
    s_count = n_scales
    xs = refs[:s_count]
    ws = refs[s_count:2 * s_count]
    bs = refs[2 * s_count:3 * s_count]
    n_g = sum(0 if ident else 1 for ident in identity_scale)
    gs_iter = iter(refs[3 * s_count:3 * s_count + n_g])
    gs = [None if ident else next(gs_iter) for ident in identity_scale]
    base = 3 * s_count + n_g
    w1_ref, b1_ref, w2_ref, dout_ref = refs[base:base + 4]
    outs = refs[base + 4:]
    dx_refs = outs[:s_count]
    dwp_refs = outs[s_count:2 * s_count]
    dbp_refs = outs[2 * s_count:3 * s_count]
    dw1_ref, db1_ref, dw2_ref = outs[3 * s_count:3 * s_count + 3]

    w1 = w1_ref[0]                                   # [E, H] bf16
    b1 = b1_ref[0]                                   # [1, H] f32
    w2 = w2_ref[0]                                   # [1, H] bf16
    d_out = dout_ref[0]                              # [P, E] f32

    # ---- forward recompute (identical chain to _fwd_kernel) -------------
    def recompute_hu(s):
        x = xs[s][0]
        w = ws[s][0]
        b = bs[s][0]
        h = jax.nn.relu(_dot(x, w, ((1,), (0,))) + b).astype(jnp.bfloat16)
        if gs[s] is None:
            return h, h
        return h, _dot(gs[s][...], h, ((1,), (0,))).astype(jnp.bfloat16)

    # the bf16 projections ([P_s, E]), upsampled maps ([P, E]) and attention
    # activations ([P, H]) are kept across the two passes (~36 MB together
    # at flagship shapes, within the 114 MB scoped-vmem limit); h>0 ⟺
    # pre-activation>0 and a>0 ⟺ its pre-activation>0, so neither ReLU mask
    # needs an f32 copy or a recompute of the projection matmul (keeping h
    # removed the per-scale h_pre recompute: −0.87 GFLOP/sample, measured
    # round-5 A/B in docs/PERFORMANCE.md)
    logits, datts, acts, umaps, hmaps = [], [], [], [], []
    for s in range(s_count):
        h, u = recompute_hu(s)
        # identity scales: h IS u — storing it twice double-counts the
        # buffer in Mosaic's scoped-vmem accounting (+4.6 MiB at flagship)
        hmaps.append(None if gs[s] is None else h)
        umaps.append(u)
        a = _dot(u, w1, ((1,), (0,)))
        a = jax.nn.relu(a + b1).astype(jnp.bfloat16)
        acts.append(a)
        prod = a.astype(jnp.float32) * w2.astype(jnp.float32)
        logits.append(jnp.sum(prod, axis=1, keepdims=True))
        datts.append(jnp.sum(d_out * u.astype(jnp.float32), axis=1,
                             keepdims=True))         # [P, 1]

    l_all = jnp.concatenate(logits, axis=1)          # [P, S]
    att32 = jax.nn.softmax(l_all, axis=1)
    att = att32.astype(jnp.bfloat16)                 # rounding matches fwd

    # combine + softmax backward. The combine used bf16-rounded attention
    # weights, so d_att flows into the f32 softmax jacobian directly (the
    # bf16 rounding is a straight-through cast).
    datt = jnp.concatenate(datts, axis=1)            # [P, S]
    inner = jnp.sum(att32 * datt, axis=1, keepdims=True)
    d_l = att32 * (datt - inner)                     # [P, S] f32

    dw1_acc = jnp.zeros(w1.shape, jnp.float32)       # [E, H]
    db1_acc = jnp.zeros((1, w1.shape[1]), jnp.float32)
    dw2_acc = jnp.zeros((1, w1.shape[1]), jnp.float32)
    for s in range(s_count):
        u = umaps[s]                                 # [P, E] bf16 (pass 1)
        a = acts[s]                                  # [P, H] bf16 (pass 1)
        dl_s = d_l[:, s:s + 1]                       # [P, 1]
        dw2_acc = dw2_acc + jnp.sum(a.astype(jnp.float32) * dl_s, axis=0,
                                    keepdims=True)
        d_a = dl_s * w2.astype(jnp.float32)          # [P, H]
        # (f32 compare: Mosaic has no bf16 vector compare on this target)
        dz_a = jnp.where(a.astype(jnp.float32) > 0, d_a, 0.0)
        db1_acc = db1_acc + jnp.sum(dz_a, axis=0, keepdims=True)
        dz_bf = dz_a.astype(jnp.bfloat16)
        dw1_acc = dw1_acc + _dot(u, dz_bf, ((0,), (0,)))      # [E, H]
        # d_u: combine term + attention-MLP term
        d_u = att[:, s:s + 1].astype(jnp.float32) * d_out \
            + _dot(dz_bf, w1, ((1,), (1,)))                   # [P, E] f32
        du_bf = d_u.astype(jnp.bfloat16)
        if gs[s] is None:
            d_h = d_u
        else:
            d_h = _dot(gs[s][...], du_bf, ((0,), (0,)))       # [P_s, E]
        # proj backward: relu mask from the kept bf16 h (h = relu(h_pre)
        # rounds every positive f32 normal to a positive bf16 — same
        # exponent range — so h>0 reproduces the h_pre>0 mask without the
        # projection recompute)
        x = xs[s][0]
        w = ws[s][0]
        if os.environ.get("MEDMOE_EXPERT_BWD_HKEEP", "0") == "1":
            # round-5 A/B arm: mask from the kept bf16 h (exact — bf16
            # shares f32's exponent range, every positive normal stays
            # positive) instead of recomputing h_pre. Measured NEUTRAL
            # (63.15 vs 62.9 ms full step: the recompute matmul is not on
            # the kernel's critical path) while pushing scoped VMEM from
            # 114 to 121.3 MiB — the recompute stays the default for the
            # headroom; docs/PERFORMANCE.md round-5.
            h_s = umaps[s] if hmaps[s] is None else hmaps[s]
            dz_h = jnp.where(h_s.astype(jnp.float32) > 0, d_h, 0.0)
        else:
            b = bs[s][0]
            h_pre = _dot(x, w, ((1,), (0,))) + b
            dz_h = jnp.where(h_pre > 0, d_h, 0.0)
        dz_h_bf = dz_h.astype(jnp.bfloat16)
        dx_refs[s][0] = _dot(dz_h_bf, w, ((1,), (1,))) \
            .astype(dx_refs[s].dtype)                         # [P_s, D_s]
        dwp_refs[s][0] = _dot(x, dz_h_bf, ((0,), (0,)))       # [D_s, E]
        dbp_refs[s][0] = jnp.sum(dz_h, axis=0, keepdims=True)

    dw1_ref[0] = dw1_acc
    db1_ref[0] = db1_acc
    dw2_ref[0] = dw2_acc


def _bwd_pallas(xs, wp, bp, w1, b1, w2, expert_idx, interp_mats, d_out):
    b = xs[0].shape[0]
    e = wp[0].shape[2]
    h_dim = w1.shape[2]
    k = wp[0].shape[0]
    p_max = max(x.shape[1] for x in xs)
    s_count = len(xs)
    identity = [m is None for m in interp_mats]

    in_specs = []
    args = []
    for x in xs:
        in_specs.append(pl.BlockSpec((1,) + x.shape[1:],
                                     lambda bi, idx: (bi, 0, 0)))
        args.append(x)
    for w in wp:
        in_specs.append(pl.BlockSpec((1,) + w.shape[1:],
                                     lambda bi, idx: (idx[bi], 0, 0)))
        args.append(w.astype(jnp.bfloat16))
    for bias in bp:
        in_specs.append(pl.BlockSpec((1, 1, e),
                                     lambda bi, idx: (idx[bi], 0, 0)))
        # round through bf16 first: the XLA path's per-sample parameter
        # pick casts biases to the compute dtype before the f32 upcast
        args.append(bias.reshape(k, 1, e).astype(jnp.bfloat16)
                    .astype(jnp.float32))
    for m in interp_mats:
        if m is not None:
            in_specs.append(pl.BlockSpec(m.shape, lambda bi, idx: (0, 0)))
            args.append(m)
    in_specs.append(pl.BlockSpec((1, e, h_dim),
                                 lambda bi, idx: (idx[bi], 0, 0)))
    args.append(w1.astype(jnp.bfloat16))
    in_specs.append(pl.BlockSpec((1, 1, h_dim),
                                 lambda bi, idx: (idx[bi], 0, 0)))
    args.append(b1.reshape(k, 1, h_dim).astype(jnp.bfloat16)
                .astype(jnp.float32))
    in_specs.append(pl.BlockSpec((1, 1, h_dim),
                                 lambda bi, idx: (idx[bi], 0, 0)))
    args.append(w2.reshape(k, h_dim, 1).transpose(0, 2, 1)
                .astype(jnp.bfloat16))
    in_specs.append(pl.BlockSpec((1, p_max, e), lambda bi, idx: (bi, 0, 0)))
    args.append(d_out)

    out_shapes = []
    out_specs = []
    for x in xs:                                     # d_x  (pyramid dtype)
        out_shapes.append(jax.ShapeDtypeStruct(x.shape, x.dtype))
        out_specs.append(pl.BlockSpec((1,) + x.shape[1:],
                                      lambda bi, idx: (bi, 0, 0)))
    for w in wp:                                     # per-sample d_W
        out_shapes.append(
            jax.ShapeDtypeStruct((b,) + w.shape[1:], jnp.float32))
        out_specs.append(pl.BlockSpec((1,) + w.shape[1:],
                                      lambda bi, idx: (bi, 0, 0)))
    for _ in bp:                                     # per-sample d_b
        out_shapes.append(jax.ShapeDtypeStruct((b, 1, e), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, e), lambda bi, idx: (bi, 0, 0)))
    out_shapes.append(jax.ShapeDtypeStruct((b, e, h_dim), jnp.float32))
    out_specs.append(pl.BlockSpec((1, e, h_dim), lambda bi, idx: (bi, 0, 0)))
    out_shapes.append(jax.ShapeDtypeStruct((b, 1, h_dim), jnp.float32))
    out_specs.append(pl.BlockSpec((1, 1, h_dim), lambda bi, idx: (bi, 0, 0)))
    out_shapes.append(jax.ShapeDtypeStruct((b, 1, h_dim), jnp.float32))
    out_specs.append(pl.BlockSpec((1, 1, h_dim), lambda bi, idx: (bi, 0, 0)))

    kernel = functools.partial(_bwd_kernel, n_scales=s_count, p_max=p_max,
                               identity_scale=identity)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(b,),
        in_specs=in_specs, out_specs=out_specs)
    flops_attn = 2 * b * p_max * s_count * e * h_dim
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            # 124 MiB: the kept non-identity h maps + their extended lifetimes
            # push past the former 114 MiB; v5e VMEM is 128 MiB
            vmem_limit_bytes=124 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=6 * flops_attn,
            bytes_accessed=2 * b * p_max * e * 4,
            transcendentals=b * p_max * s_count),
    )(expert_idx.astype(jnp.int32), *args)


# --------------------------------------------------------------------------
# custom-vjp wrapper
# --------------------------------------------------------------------------

@jax.custom_vjp
def _fused_expert_core(xs: Tuple[jnp.ndarray, ...],
                       wp: Tuple[jnp.ndarray, ...],
                       bp: Tuple[jnp.ndarray, ...],
                       w1: jnp.ndarray, b1: jnp.ndarray, w2: jnp.ndarray,
                       b2: jnp.ndarray,
                       expert_idx: jnp.ndarray) -> jnp.ndarray:
    return _fe_fwd(xs, wp, bp, w1, b1, w2, b2, expert_idx)[0]


def fused_expert_gather(xs: Tuple[jnp.ndarray, ...],
                        wp: Tuple[jnp.ndarray, ...],
                        bp: Tuple[jnp.ndarray, ...],
                        w1: jnp.ndarray, b1: jnp.ndarray, w2: jnp.ndarray,
                        b2: jnp.ndarray,
                        expert_idx: jnp.ndarray) -> jnp.ndarray:
    """Fused gather-mode expert branch: pyramid (tuple of [B, P_s, D_s]
    bf16) + stacked expert params + per-sample expert ids → fused
    [B, P, E] f32 map. Matches ExpertBank._gather_one numerics.

    Under an ambient SPMD mesh (parallel/spmd.py) the kernel runs
    per-shard over the data axis via shard_map — the expert branch is a
    pure per-sample map, so batch sharding is exact; replicated-parameter
    cotangents are psum'd by shard_map's transpose. Without this, GSPMD
    would all-gather the pyramid and replicate the kernel on every chip.
    """
    from jax.sharding import PartitionSpec as P

    from medmoe_tpu.parallel.spmd import current_spmd

    ctx = current_spmd()
    if ctx is None:
        return _fused_expert_core(xs, wp, bp, w1, b1, w2, b2, expert_idx)
    batch = P(ctx.data_axis)
    rep = P()
    return jax.shard_map(
        _fused_expert_core, mesh=ctx.mesh,
        in_specs=(batch, rep, rep, rep, rep, rep, rep, batch),
        out_specs=batch, check_vma=False,
    )(xs, wp, bp, w1, b1, w2, b2, expert_idx)


def _fe_fwd(xs, wp, bp, w1, b1, w2, b2, expert_idx):
    p_max = max(x.shape[1] for x in xs)
    mats = _interp_mats([x.shape[1] for x in xs], p_max)
    out = _fwd_pallas(xs, wp, bp, w1, b1, w2, expert_idx, mats)
    return out, (xs, wp, bp, w1, b1, w2, b2, expert_idx)


def _fe_bwd(residuals, g):
    xs, wp, bp, w1, b1, w2, b2, expert_idx = residuals
    p_max = max(x.shape[1] for x in xs)
    mats = _interp_mats([x.shape[1] for x in xs], p_max)
    outs = _bwd_pallas(xs, wp, bp, w1, b1, w2, expert_idx, mats,
                       g.astype(jnp.float32))
    s = len(xs)
    d_xs = tuple(outs[:s])
    d_wp_samp = outs[s:2 * s]
    d_bp_samp = outs[2 * s:3 * s]
    d_w1_samp, d_b1_samp, d_w2_samp = outs[3 * s:3 * s + 3]

    k = wp[0].shape[0]
    onehot = jax.nn.one_hot(expert_idx, k, dtype=jnp.float32)   # [B, K]

    def scatter(per_sample, target):
        flat = per_sample.reshape(per_sample.shape[0], -1)
        acc = jnp.einsum("bf,bk->kf", flat, onehot,
                         preferred_element_type=jnp.float32)
        return acc.reshape((k,) + per_sample.shape[1:]) \
            .reshape(target.shape).astype(target.dtype)

    d_wp = tuple(scatter(d, w) for d, w in zip(d_wp_samp, wp))
    d_bp = tuple(scatter(d, bias) for d, bias in zip(d_bp_samp, bp))
    d_w1 = scatter(d_w1_samp, w1)
    d_b1 = scatter(d_b1_samp, b1)
    d_w2 = scatter(d_w2_samp, w2)
    # attn_b2 adds the same constant to every scale's logit — exactly zero
    # gradient through the softmax over scales
    d_b2 = jnp.zeros_like(b2)
    return d_xs, d_wp, d_bp, d_w1, d_b1, d_w2, d_b2, None


_fused_expert_core.defvjp(_fe_fwd, _fe_bwd)
