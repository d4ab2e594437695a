"""Fused GLoRIA word-region similarity — Pallas TPU kernel.

Computes the [B_img, B_text] similarity matrix of the GLoRIA local loss
(medmoe_tpu/ops/losses.py gloria_local_loss; reference losses.py:961-1015):

    scores[m,t] = ⟨ctx[b,:,m], words[i,:,t]⟩          (MXU)
    a1 = softmax_t(scores  | t < cap_len_i)           (VPU)
    a2 = softmax_m(a1 · temp1)                        (VPU)
    wei[d,t] = Σ_m ctx[b,d,m] · a2[m,t]               (MXU)
    cos[t] = ⟨w_t, wei_t⟩ / (‖w_t‖·‖wei_t‖)
    sim[b,i] = temp3 · log Σ_{t<cap_len} exp(temp2 · cos[t])

Kernel layout: grid = (B_img, B_text / TXT_BLOCK). The [D, M] context block
is fetched once per image (its index map is constant over the minor text
axis) and stays resident in VMEM while caption blocks stream through, so
the big [M, T]-per-pair attention tensors never touch HBM (the XLA path
materializes or re-materializes them). Context HBM traffic is B·D·M instead
of B²·D·M.

The per-text work inside a cell is a fixed TXT_BLOCK-way unroll over 2D
lane-slices (Mosaic cannot shape-cast across the sublane/lane boundary), so
Mosaic compile time is CONSTANT in the batch size — round 1 unrolled all
B texts in one cell, which blew up compilation beyond B≈16.

Backward runs through jax.custom_vjp with a pair of recompute-in-VMEM
Pallas kernels (flash-attention's dq/dkv split): ``_dctx_kernel`` keeps the
grid (image, text-block) and accumulates d_ctx across the text sweep;
``_dwords_kernel`` transposes the grid to (text-block, image) so d_words
accumulates across the image sweep. Each cell re-derives the forward chain
from the VMEM-resident inputs (the [M, L] attention tensors never touch
HBM, exactly like the forward) and then runs the cotangent matmuls. XLA's
rematerialized vjp (the text-chunked checkpoint path of gloria_local_loss)
is kept behind MEDMOE_GLORIA_BWD=xla. MXU inputs are bf16 with f32
accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# texts per grid cell: the unroll factor. 8 keeps the body small for Mosaic
# while amortizing the resident context block across lane-contiguous words.
TXT_BLOCK = 8


def _segment_max(x: jnp.ndarray, seg: int) -> jnp.ndarray:
    """Per-lane max over the lane's aligned ``seg``-lane segment (axis 1).

    log2(seg) rounds of a roll-butterfly: each round doubles the window a
    lane has reduced over, with boundary masks confining windows to their
    own segment. Pure VPU — no cross-lane shape casts.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % seg
    length = x.shape[1]
    k = 1
    while k < seg:
        fwd = pltpu.roll(x, shift=k, axis=1)      # lane l ← value of l-k
        x = jnp.maximum(x, jnp.where(lane >= k, fwd, NEG_INF))
        # negative shifts are unsupported: roll by length-k ≡ roll by -k
        bwd = pltpu.roll(x, shift=length - k, axis=1)   # lane l ← l+k
        x = jnp.maximum(x, jnp.where(lane < seg - k, bwd, NEG_INF))
        k *= 2
    return x


def _sim_kernel(cap_ref, ctx_ref, words_ref, out_ref, *, temp1: float,
                temp2: float, temp3: float, txt_block: int, t_pad: int,
                b: int):
    """Lane-packed cell: ALL txt_block texts' words ride one [D, L] block
    (L = txt_block·t_pad lanes), so every matmul and VPU op runs at full
    lane width. The per-text softmax over words becomes a SEGMENTED
    softmax over t_pad-lane groups: max via the roll-butterfly, sums via
    one matmul with a block-diagonal ones matrix (exact, MXU).

    The forward chain is ``_cell_recompute`` — the SAME function the
    backward kernels re-derive, so the custom-vjp differentiates exactly
    what the forward evaluated (one body, not two copies to keep in
    sync); only the log/pick/accumulate tail is forward-specific."""
    tj = pl.program_id(1)
    l_total = txt_block * t_pad
    cell = _cell_recompute(ctx_ref, words_ref, cap_ref, tj, temp1=temp1,
                           temp2=temp2, txt_block=txt_block, t_pad=t_pad)
    sims = jnp.log(cell["rowsum"]) * temp3                # [1, L]

    # gather lane j·t_pad of each segment into out lane tj·txt_block+j
    # with one [L, B] indicator matmul (no scalar extraction)
    l_i = jax.lax.broadcasted_iota(jnp.int32, (l_total, b), 0)
    o_i = jax.lax.broadcasted_iota(jnp.int32, (l_total, b), 1)
    pick = ((l_i % t_pad == 0)
            & (o_i == tj * txt_block + l_i // t_pad)).astype(jnp.float32)
    row_full = jax.lax.dot_general(                       # [1, B]
        sims, pick, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # the out block spans ALL texts and is revisited across the tj sweep
    @pl.when(tj == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] = out_ref[0] + row_full


def _pick_txt_block(b: int) -> int:
    for blk in (TXT_BLOCK, 4, 2, 1):
        if b % blk == 0:
            return blk
    return 1


def _pack_geometry(b_txt: int, t: int):
    """(txt_block, n_blocks, t_pad): lane packing shared by fwd and bwd.

    Each text is padded to t_pad lanes so a txt_block-text block spans a
    128-divisible lane count (Mosaic block constraint)."""
    import math as _math

    txt_block = _pick_txt_block(b_txt)
    q = 128 // _math.gcd(txt_block, 128)
    t_pad = t if (txt_block * t) % 128 == 0 else -(-t // q) * q
    return txt_block, b_txt // txt_block, t_pad


def _cell_recompute(ctx_ref, words_ref, cap_ref, tj, *, temp1: float,
                    temp2: float, txt_block: int, t_pad: int):
    """Re-derive the forward chain for one (image, text-block) cell from the
    VMEM-resident inputs — bit-identical to ``_sim_kernel`` (same op order
    and dtypes), so the cotangents below differentiate the function the
    forward actually evaluated."""
    ctx = ctx_ref[0]                          # [D, M] bf16
    w_blk = words_ref[0]                      # [D, L] bf16
    l_total = txt_block * t_pad

    scores = jax.lax.dot_general(
        ctx, w_blk, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)   # [M, L]

    lane = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    lane_in_seg = lane % t_pad
    caps = jnp.zeros_like(lane)
    for j in range(txt_block):
        caps = jnp.where(lane // t_pad == j,
                         cap_ref[tj * txt_block + j], caps)
    valid = lane_in_seg < caps
    scores = jnp.where(valid, scores, NEG_INF)

    e = jnp.exp(scores - _segment_max(scores, t_pad))
    seg_r = jax.lax.broadcasted_iota(jnp.int32, (l_total, l_total), 0) \
        // t_pad
    seg_c = jax.lax.broadcasted_iota(jnp.int32, (l_total, l_total), 1) \
        // t_pad
    seg_ones = (seg_r == seg_c).astype(jnp.float32)
    segsum = jax.lax.dot_general(
        e, seg_ones, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    a1 = e / segsum
    a2 = jax.nn.softmax(a1 * temp1, axis=0)

    ctx32 = ctx.astype(jnp.float32)
    wei = jax.lax.dot_general(
        ctx32, a2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)   # [D, L]

    w32 = w_blk.astype(jnp.float32)
    num = jnp.sum(w32 * wei, axis=0, keepdims=True)          # [1, L]
    nw = jnp.sqrt(jnp.sum(w32 * w32, axis=0, keepdims=True))
    nwei = jnp.sqrt(jnp.sum(wei * wei, axis=0, keepdims=True))
    den_raw = nw * nwei
    den = jnp.maximum(den_raw, 1e-8)
    cos = num / den

    valid1 = lane_in_seg[:1] < caps[:1]
    row = jnp.where(valid1, jnp.exp(cos * temp2), 0.0)
    rowsum = jax.lax.dot_general(
        row, seg_ones, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)   # per-lane segment sums
    return dict(ctx=ctx, w_blk=w_blk, ctx32=ctx32, w32=w32, a1=a1, a2=a2,
                wei=wei, num=num, nw=nw, nwei=nwei, den_raw=den_raw,
                den=den, row=row, rowsum=rowsum, seg_ones=seg_ones,
                lane=lane)


def _cell_cotangents(cell, g_ref, tj, *, temp1: float, temp2: float,
                     temp3: float, txt_block: int, t_pad: int):
    """Common cotangent chain down to (d_wei, d_scores).

    Cotangent matmuls run with bf16 inputs / f32 accumulation (gradients,
    not values — the train step's activations are bf16 anyway); the
    forward-chain recompute above stays in the forward's exact dtypes.
    """
    l_total = txt_block * t_pad
    # g_ref holds the image's FULL [1, B_txt] cotangent row (Mosaic wants
    # the block's last dim to be 128-divisible or the whole array dim; a
    # bare txt_block-lane block is neither). Expand the tj-th txt_block
    # texts onto their lane segments with one indicator matmul — no scalar
    # loads from VMEM, and tj enters only through an iota comparison.
    g_row = g_ref[0]                                         # [1, B_txt]
    b_txt = g_row.shape[1]
    e_r = jax.lax.broadcasted_iota(jnp.int32, (b_txt, l_total), 0)
    e_c = jax.lax.broadcasted_iota(jnp.int32, (b_txt, l_total), 1)
    expand = (e_r == tj * txt_block + e_c // t_pad).astype(jnp.float32)
    g_lanes = jax.lax.dot_general(
        g_row, expand, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [1, L]

    # sim = temp3·log(Σ_seg row); row = valid·exp(temp2·cos)
    dcos = g_lanes * (temp2 * temp3) * cell["row"] / cell["rowsum"]
    den_mask = (cell["den_raw"] > 1e-8).astype(jnp.float32)
    dnum = dcos / cell["den"]
    dden = -dcos * cell["num"] / (cell["den"] * cell["den"]) * den_mask
    dnwei = dden * cell["nw"]
    dnw = dden * cell["nwei"]

    d_wei = dnum * cell["w32"] \
        + (dnwei / jnp.maximum(cell["nwei"], 1e-20)) * cell["wei"]  # [D, L]

    # wei = ctx32 @ a2 → d_a2 = ctx32ᵀ·d_wei (bf16 MXU inputs)
    d_a2 = jax.lax.dot_general(
        cell["ctx"], d_wei.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [M, L]

    a2 = cell["a2"]
    d_z = a2 * (d_a2 - jnp.sum(a2 * d_a2, axis=0, keepdims=True))
    d_a1 = temp1 * d_z

    a1 = cell["a1"]
    t_sum = jax.lax.dot_general(                             # Σ_seg a1·d_a1
        a1 * d_a1, cell["seg_ones"],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    d_scores = a1 * (d_a1 - t_sum)            # invalid lanes: a1 = 0
    return d_wei, d_scores, dnum, dnw


def _dctx_kernel(cap_ref, ctx_ref, words_ref, g_ref, out_ref, *,
                 temp1: float, temp2: float, temp3: float, txt_block: int,
                 t_pad: int):
    """d_ctx for one image, accumulated across the text-block sweep.

    Grid (b_img, n_blocks): the out block (index constant over the minor tj
    axis) stays VMEM-resident while caption blocks stream through."""
    tj = pl.program_id(1)
    cell = _cell_recompute(ctx_ref, words_ref, cap_ref, tj, temp1=temp1,
                           temp2=temp2, txt_block=txt_block, t_pad=t_pad)
    d_wei, d_scores, _, _ = _cell_cotangents(
        cell, g_ref, tj, temp1=temp1, temp2=temp2, temp3=temp3,
        txt_block=txt_block, t_pad=t_pad)

    # wei = ctx32 @ a2 → d_ctx += d_wei @ a2ᵀ
    d_ctx = jax.lax.dot_general(
        d_wei.astype(jnp.bfloat16), cell["a2"].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [D, M]
    # scores = ctxᵀ w → d_ctx += w @ d_scoresᵀ
    d_ctx = d_ctx + jax.lax.dot_general(
        cell["w_blk"], d_scores.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(tj == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] = out_ref[0] + d_ctx


def _dwords_kernel(cap_ref, ctx_ref, words_ref, g_ref, out_ref, *,
                   temp1: float, temp2: float, temp3: float, txt_block: int,
                   t_pad: int):
    """d_words for one text block, accumulated across the image sweep.

    Grid (n_blocks, b_img) — transposed relative to the forward so the out
    block (per text block, constant over the minor bi axis) accumulates
    consecutively."""
    tj = pl.program_id(0)
    cell = _cell_recompute(ctx_ref, words_ref, cap_ref, tj, temp1=temp1,
                           temp2=temp2, txt_block=txt_block, t_pad=t_pad)
    d_wei, d_scores, dnum, dnw = _cell_cotangents(
        cell, g_ref, tj, temp1=temp1, temp2=temp2, temp3=temp3,
        txt_block=txt_block, t_pad=t_pad)

    # num = Σ_d w·wei and nw = ‖w‖ paths
    d_w = dnum * cell["wei"] \
        + (dnw / jnp.maximum(cell["nw"], 1e-20)) * cell["w32"]   # [D, L]
    # scores = ctxᵀ w → d_w += ctx @ d_scores
    d_w = d_w + jax.lax.dot_general(
        cell["ctx"], d_scores.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] = out_ref[0] + d_w


def _sim_forward(img_features: jnp.ndarray, words_emb: jnp.ndarray,
                 cap_lens: jnp.ndarray, temp1: float, temp2: float,
                 temp3: float) -> jnp.ndarray:
    b_img, d, h, w = img_features.shape
    m = h * w
    b_txt = words_emb.shape[0]          # may differ from b_img under
    t = words_emb.shape[-1]             # shard_map row sharding
    # per-text lane stride: Mosaic wants the words block's lane count
    # (txt_block·t_pad) divisible by 128 → pad each text to q-lane multiples
    txt_block, n_blocks, t_pad = _pack_geometry(b_txt, t)
    ctx = img_features.reshape(b_img, d, m).astype(jnp.bfloat16)
    # flatten texts along lanes: [1, D, B*T_pad], text i at lane i·T_pad
    words = words_emb.astype(jnp.bfloat16)
    if t_pad != t:
        words = jnp.pad(words, ((0, 0), (0, 0), (0, t_pad - t)))
    words = words.transpose(1, 0, 2).reshape(1, d, b_txt * t_pad)

    kernel = functools.partial(_sim_kernel, temp1=temp1, temp2=temp2,
                               temp3=temp3, txt_block=txt_block,
                               t_pad=t_pad, b=b_txt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_img, n_blocks),               # (image, text-block)
        in_specs=[
            # constant over the minor text axis → fetched once per image
            pl.BlockSpec((1, d, m), lambda bi, tj, cap: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, txt_block * t_pad),
                         lambda bi, tj, cap: (0, 0, tj),
                         memory_space=pltpu.VMEM),
        ],
        # full row per image, lanes merged across the tj sweep
        out_specs=pl.BlockSpec((1, 1, b_txt), lambda bi, tj, cap: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_img, 1, b_txt), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b_img * b_txt * m * t * d,
            bytes_accessed=b_img * d * m * 2 + b_img * b_txt * d * t * 2
            + b_img * b_txt * 4,
            transcendentals=b_img * b_txt * m * t),
    )(cap_lens.astype(jnp.int32), ctx, words)
    return out[:, 0, :]


def _sim_xla(img_features, words_emb, cap_lens, temp1, temp2, temp3,
             text_chunk=None):
    """Identical math in plain XLA (used for the custom-vjp backward).
    ``text_chunk`` remats caption blocks (bounds the [c,B,M,T] peak)."""
    from medmoe_tpu.ops.losses import attention_fn, cosine_similarity

    b, d, h, w = img_features.shape
    b_txt = words_emb.shape[0]          # rectangular under shard_map
    t = words_emb.shape[-1]
    context = img_features.reshape(b, d, h * w)
    word_mask = jnp.arange(t)[None, :] < cap_lens[:, None]

    def block(words_c, mask_c):
        wei, _ = attention_fn(words_c, context, temp1, mask_c)
        row = cosine_similarity(words_c[:, None], wei, axis=2) * temp2
        row = jnp.where(mask_c[:, None, :], jnp.exp(row), 0.0)
        return jnp.log(jnp.sum(row, axis=-1))             # [c, B]

    if text_chunk and b_txt > text_chunk and b_txt % text_chunk == 0:
        nc = b_txt // text_chunk
        wc = words_emb.reshape(nc, text_chunk, d, t)
        mc = word_mask.reshape(nc, text_chunk, t)
        sim = jax.lax.map(jax.checkpoint(lambda args: block(*args)),
                          (wc, mc)).reshape(b_txt, b)
    else:
        sim = block(words_emb, word_mask)
    return sim.T * temp3                                  # [img, text]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gloria_similarity_core(img_features, words_emb, cap_lens,
                            temp1=4.0, temp2=5.0, temp3=10.0):
    return _sim_forward(img_features, words_emb, cap_lens, temp1, temp2,
                        temp3)


def gloria_similarity_pallas(img_features, words_emb, cap_lens,
                             temp1=4.0, temp2=5.0, temp3=10.0):
    """[B_img, B_text] GLoRIA similarity matrix, Pallas forward + XLA-remat
    backward.

    Under an ambient SPMD mesh (parallel/spmd.py) the image axis is
    sharded over the data axis via shard_map while texts ride replicated:
    each chip computes its [B/n, B] row block (the image-resident grid
    already iterates images in the major axis, so the kernel is unchanged).
    Text cotangents from each shard are psum'd by shard_map's transpose.
    Without this, GSPMD would replicate the whole kernel on every chip.
    """
    from jax.sharding import PartitionSpec as P

    from medmoe_tpu.parallel.spmd import current_spmd

    ctx = current_spmd()
    if ctx is None:
        return _gloria_similarity_core(img_features, words_emb, cap_lens,
                                       temp1, temp2, temp3)
    row = P(ctx.data_axis)
    rep = P()
    return jax.shard_map(
        functools.partial(_gloria_similarity_core, temp1=temp1,
                          temp2=temp2, temp3=temp3),
        mesh=ctx.mesh, in_specs=(row, rep, rep), out_specs=row,
        check_vma=False,
    )(img_features, words_emb, cap_lens)


def _fwd(img_features, words_emb, cap_lens, temp1, temp2, temp3):
    out = _sim_forward(img_features, words_emb, cap_lens, temp1, temp2,
                       temp3)
    return out, (img_features, words_emb, cap_lens)


def _bwd_pallas(img_features, words_emb, cap_lens, g, temp1, temp2, temp3):
    """Two recompute-in-VMEM kernels: d_ctx over grid (image, text-block)
    and d_words over the transposed grid (text-block, image)."""
    b_img, d, h, w = img_features.shape
    m = h * w
    b_txt = words_emb.shape[0]
    t = words_emb.shape[-1]
    txt_block, n_blocks, t_pad = _pack_geometry(b_txt, t)
    l_blk = txt_block * t_pad

    ctx = img_features.reshape(b_img, d, m).astype(jnp.bfloat16)
    words = words_emb.astype(jnp.bfloat16)
    if t_pad != t:
        words = jnp.pad(words, ((0, 0), (0, 0), (0, t_pad - t)))
    words = words.transpose(1, 0, 2).reshape(1, d, b_txt * t_pad)
    # each cell reads its image's full cotangent row [1, 1, B_txt] (lane
    # count = whole array dim, which Mosaic always accepts) and slices the
    # tj-block inside the kernel
    g = g.astype(jnp.float32).reshape(b_img, 1, b_txt)
    caps = cap_lens.astype(jnp.int32)
    kw = dict(temp1=temp1, temp2=temp2, temp3=temp3, txt_block=txt_block,
              t_pad=t_pad)
    cost = pl.CostEstimate(
        flops=5 * 2 * b_img * b_txt * m * t * d,
        bytes_accessed=b_img * d * m * 2 + b_img * b_txt * d * t * 2
        + b_img * b_txt * 4,
        transcendentals=2 * b_img * b_txt * m * t)

    d_ctx = pl.pallas_call(
        functools.partial(_dctx_kernel, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b_img, n_blocks),
            in_specs=[
                pl.BlockSpec((1, d, m), lambda bi, tj, cap: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, l_blk), lambda bi, tj, cap: (0, 0, tj),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, b_txt), lambda bi, tj, cap: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, d, m), lambda bi, tj, cap: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b_img, d, m), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=cost,
    )(caps, ctx, words, g)

    d_words_packed = pl.pallas_call(
        functools.partial(_dwords_kernel, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks, b_img),
            in_specs=[
                pl.BlockSpec((1, d, m), lambda tj, bi, cap: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, l_blk), lambda tj, bi, cap: (0, 0, tj),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, b_txt), lambda tj, bi, cap: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, d, l_blk),
                                   lambda tj, bi, cap: (0, 0, tj),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, d, b_txt * t_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=cost,
    )(caps, ctx, words, g)

    d_img = d_ctx.reshape(b_img, d, h, w).astype(img_features.dtype)
    d_w = d_words_packed.reshape(d, b_txt, t_pad).transpose(1, 0, 2)[..., :t]
    return d_img, d_w.astype(words_emb.dtype)


def _bwd(temp1, temp2, temp3, residuals, g):
    import os

    img_features, words_emb, cap_lens = residuals
    if os.environ.get("MEDMOE_GLORIA_BWD", "pallas") == "pallas":
        d_img, d_words = _bwd_pallas(img_features, words_emb, cap_lens, g,
                                     temp1, temp2, temp3)
        return d_img, d_words, None

    from medmoe_tpu.ops.losses import auto_text_chunk

    b, _, h, w = img_features.shape
    b_txt = words_emb.shape[0]
    # memory-adaptive remat: no chunk loop at all when the whole batch's
    # backward fits (B≤64 on v5e) — the lax.map loop serializes on device.
    # Peak memory scales with the IMAGE count (the [c, B_img, M, T] block);
    # the chunk sizes/divides the TEXT count (rectangular under shard_map:
    # per-shard images × replicated global texts — n_texts keeps the
    # whole-batch early exit honest there).
    chunk = auto_text_chunk(b, h * w, words_emb.shape[-1], n_texts=b_txt)
    _, vjp = jax.vjp(
        lambda im, wo: _sim_xla(im, wo, cap_lens, temp1, temp2, temp3,
                                text_chunk=chunk),
        img_features, words_emb)
    d_img, d_words = vjp(g)
    return d_img, d_words, None


_gloria_similarity_core.defvjp(_fwd, _bwd)
