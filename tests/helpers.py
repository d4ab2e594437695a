"""Shared tiny-model fixtures for fast CPU tests."""

import numpy as np

from medmoe_tpu.config import DotDict

TINY_VISION = dict(
    model_name="swin", use_moe=True, embed_dim=16, num_experts=3,
    moe_mode="gather", image_size=56, swin_embed_dim=8, swin_depths=[1, 1],
    swin_num_heads=[1, 2], swin_window_size=7, drop_path_rate=0.0,
    dtype="float32", freeze_cnn=False, pretrained=False,
)
TINY_TEXT = dict(
    freeze_bert=True, last_n_layers=2, aggregate_method="sum", norm=False,
    agg_tokens=True, max_length=10, embed_dim=16, hidden_size=16,
    num_layers=2, num_heads=2, intermediate_size=32, vocab_size=200,
    dtype="float32", projection=False,
    # dropout off: train-mode tiny tests (accum≡monolithic, accum≡big-batch,
    # overfit) assert deterministic-math equalities; BERT dropout itself is
    # covered by test_models.py::TestBertDropout with the real 0.1 rates
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
)
TINY_LOSS = dict(
    soft_label=False, temp1=4.0, temp2=5.0, temp3=10.0, agg="sum",
    global_loss_weight=0.5, local_loss_weight=0.5, classifier_loss_weight=2.0,
)

CORPUS = [
    "chest xray shows pneumonia in the left lung",
    "mri of the brain with contrast",
    "ct scan of the abdomen appears normal",
    "ultrasound of the thyroid gland",
    "histopathology slide of tissue sample",
]


def tiny_vision(**kw):
    d = dict(TINY_VISION)
    d.update(kw)
    return DotDict(d)


def tiny_text(**kw):
    d = dict(TINY_TEXT)
    d.update(kw)
    return DotDict(d)


def tiny_loss(**kw):
    d = dict(TINY_LOSS)
    d.update(kw)
    return DotDict(d)


def tiny_batch(batch_size=4, image_size=56, max_length=10, seed=0):
    from medmoe_tpu.data.tokenizer import load_or_build_tokenizer

    rng = np.random.RandomState(seed)
    tok = load_or_build_tokenizer(corpus=CORPUS)
    captions = [CORPUS[i % len(CORPUS)] for i in range(batch_size)]
    enc = tok.encode_batch(captions, max_length=max_length)
    return {
        "image": rng.randn(batch_size, image_size, image_size, 3)
                    .astype(np.float32),
        "input_ids": enc["input_ids"],
        "attention_mask": enc["attention_mask"],
        "token_type_ids": enc["token_type_ids"],
        "segment_ids": enc["segment_ids"],
        "cap_lens": enc["cap_lens"],
        "label": (np.arange(batch_size) % 3).astype(np.int32),
    }, enc


def tiny_module(**loss_kw):
    from medmoe_tpu.train.module import MedMoEPretrainingModule

    return MedMoEPretrainingModule(
        model=DotDict(dict(vision=tiny_vision(), text=tiny_text())),
        loss=tiny_loss(**loss_kw))


def moe_params_from_ref(ref_moe, num_stages):
    """Reference torch MoE weights (src/models/components/swin.py:82-117)
    → medmoe_tpu MoE param tree (router MLP + stacked ExpertBank)."""
    params = {
        "router_fc1": {
            "kernel": ref_moe.router[0].weight.detach().numpy().T,
            "bias": ref_moe.router[0].bias.detach().numpy()},
        "router_fc2": {
            "kernel": ref_moe.router[2].weight.detach().numpy().T,
            "bias": ref_moe.router[2].bias.detach().numpy()},
        "experts": {},
    }
    bank = params["experts"]
    for s in range(num_stages):
        bank[f"proj_w{s}"] = np.stack([
            e.proj_convs[s][0].weight.detach().numpy()[:, :, 0].T
            for e in ref_moe.experts])
        bank[f"proj_b{s}"] = np.stack([
            e.proj_convs[s][0].bias.detach().numpy()
            for e in ref_moe.experts])
    bank["attn_w1"] = np.stack([
        e.attn_proj[0].weight.detach().numpy().T for e in ref_moe.experts])
    bank["attn_b1"] = np.stack([
        e.attn_proj[0].bias.detach().numpy() for e in ref_moe.experts])
    bank["attn_w2"] = np.stack([
        e.attn_proj[2].weight.detach().numpy().T for e in ref_moe.experts])
    bank["attn_b2"] = np.stack([
        e.attn_proj[2].bias.detach().numpy() for e in ref_moe.experts])
    return params
