"""Pretraining task module: loss orchestration around the MedMoE model.

Functional re-design of the reference MedMoEPretrainingLightningModule
(reference src/models/medmoe_module.py:172-339): instead of a stateful
LightningModule, this wires a pure ``loss_fn(params, batch) -> (loss,
metrics)`` suitable for jit/grad under a mesh.

Loss composition (reference medmoe_module.py:284-316):
    loss = local_w · (local.loss0 + local.loss1)
         + global_w · global_loss
         + classifier_w · CE(router_probs, modality_label)

Parameter freezing (reference text_encoder.py:27-30 freeze_bert /
vision_encoder.py:51-54 freeze_cnn) is implemented with stop_gradient on the
frozen subtree — unlike requires_grad=False this also skips the frozen
tower's backward pass entirely (XLA dead-code-eliminates it) — plus
optax.masked on the optimizer (trainable_mask), so frozen params carry no
Adam moments and are never touched by the update/decay passes, matching
torch Adam's skip of grad-less params.

``block_size`` computes the contrastive losses on per-device-sized blocks of
the global batch — the exact math of the reference's per-rank DDP losses
(each rank sees only its local B×B similarity matrix) — while ``None`` uses
the full global batch (stronger negatives; TPU-native default is per-rank
parity for comparability).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from medmoe_tpu.config import DotDict
from medmoe_tpu.models.medmoe import MedMoE
from medmoe_tpu.ops import losses as L
from medmoe_tpu.utils.instantiate import instantiate


class MedMoEPretrainingModule:
    def __init__(self, model: Any, loss: Any, optimizer: Any = None,
                 scheduler: Any = None, compile: bool = True,
                 num_classes: int = 6):
        # `model` arrives either as an already-instantiated MedMoE flax
        # module (the _target_ config surface instantiates nested nodes
        # first, like hydra) or as a config node with vision/text groups;
        # `optimizer`/`scheduler` arrive as partials.
        self.loss_cfg = loss if isinstance(loss, DotDict) else DotDict(loss)
        self.optimizer_factory = optimizer
        self.scheduler_factory = scheduler
        self.compile = compile
        self.num_classes = num_classes

        if isinstance(model, MedMoE):
            self.model = model
            vision, text = model.vision, model.text
        else:
            cfg = model if isinstance(model, DotDict) else DotDict(model)
            vision = cfg.vision if "vision" in cfg else cfg
            text = cfg.text
            self.model = MedMoE(vision=vision, text=text)
        self.vision_cfg = vision
        self.text_cfg = text

        self.global_loss = instantiate(self.loss_cfg.get("global_loss")) \
            or L.GLORIAGlobalContrastiveLoss()
        self.local_loss = instantiate(self.loss_cfg.get("local_loss")) \
            or L.GLORIALocalContrastiveLoss()
        self.local_w = float(self.loss_cfg.get("local_loss_weight", 0.4))
        self.global_w = float(self.loss_cfg.get("global_loss_weight", 0.4))
        self.classifier_w = float(self.loss_cfg.get("classifier_loss_weight", 0.2))
        self.temp1 = float(self.loss_cfg.get("temp1", 4.0))
        self.temp2 = float(self.loss_cfg.get("temp2", 5.0))
        self.temp3 = float(self.loss_cfg.get("temp3", 10.0))
        self.agg = self.loss_cfg.get("agg", "sum")
        self.soft_label = bool(self.loss_cfg.get("soft_label", False))
        self.block_size = self.loss_cfg.get("block_size", None)
        # global_negatives=true → contrastive losses over the FULL global
        # batch. Under SPMD the jitted loss already sees the whole sharded
        # batch, so "gather negatives across ranks" (reference
        # distributed.py:47-48 backprop-all_gather) is simply block_size=None
        # — XLA inserts the all-gathers. false → per-rank blocks
        # (block_size), the reference's NONE/LOCAL semantics.
        if bool(self.loss_cfg.get("global_negatives", False)):
            self.block_size = None
        # soft-label targets come from a FROZEN tool BERT (reference
        # medmoe_module.py:207-210): snapshot of the initial text-encoder
        # weights, captured by the Trainer at init via capture_tool_params.
        # Only needed when BERT itself trains — with freeze_bert the live
        # weights are the initial weights and no snapshot is kept.
        self.uses_tool_bert = self.soft_label and not bool(
            self.text_cfg.get("freeze_bert", False))
        self.tool_bert_params = None
        # compute dtype for the local-loss inputs: follows the towers'
        # activation dtype unless loss.loss_dtype overrides (null → f32)
        ldt = self.loss_cfg.get("loss_dtype",
                                self.vision_cfg.get("dtype", "bfloat16"))
        if not isinstance(ldt, str):
            ldt = jnp.dtype(ldt).name if ldt is not None else "none"
        self.loss_dtype = {"bfloat16": jnp.bfloat16,
                           "float16": jnp.float16}.get(ldt)

    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array, batch: Dict[str, jnp.ndarray]):
        variables = self.model.init(
            {"params": rng, "dropout": rng}, batch, deterministic=True)
        return variables["params"]

    def _freeze(self, params: Any) -> Any:
        out = params
        if self.text_cfg.get("freeze_bert", False) and "text_encoder" in params:
            te = dict(params["text_encoder"])
            if "bert" in te:
                te["bert"] = jax.lax.stop_gradient(te["bert"])
                out = {**params, "text_encoder": te}
        if self.vision_cfg.get("freeze_cnn", False) and "image_encoder" in out:
            out = {**out, "image_encoder":
                   jax.lax.stop_gradient(out["image_encoder"])}
        return out

    # ------------------------------------------------------------------
    def capture_tool_params(self, params) -> None:
        """Snapshot the initial BERT weights as the frozen soft-label tool
        (called by the Trainer right after parameter init, before any
        training step or checkpoint restore mutates them)."""
        if self.uses_tool_bert and self.tool_bert_params is None:
            try:
                # real copies: the live tree is donated into the train step,
                # so aliased buffers would be deleted after the first update
                self.tool_bert_params = jax.tree_util.tree_map(
                    jnp.copy, params["text_encoder"]["bert"])
            except (KeyError, TypeError):
                self.tool_bert_params = None

    def _soft_targets(self, params, batch, tool_params=None):
        """Tool-BERT text-similarity soft targets (reference
        medmoe_module.py:258-282): CLS-pool, L2-norm, pairwise scores.
        Scored by the frozen tool weights when available so the targets do
        not drift as the in-training BERT updates."""
        from medmoe_tpu.models.bert import BertModel, BertConfig

        bert_params = (tool_params if tool_params is not None
                       else params["text_encoder"]["bert"])
        # Same shapes as the live tower (notably max_position_embeddings)
        # or the frozen-snapshot apply fails with a param-shape mismatch.
        bert_cfg = BertConfig.from_cfg(self.text_cfg)
        last, _, _ = BertModel(bert_cfg).apply(
            {"params": jax.lax.stop_gradient(bert_params)},
            batch["input_ids"], batch["attention_mask"],
            batch["token_type_ids"])
        from medmoe_tpu.ops.losses import safe_norm

        f = last[:, 0].astype(jnp.float32)
        f = f / safe_norm(f)
        scores = f @ f.T
        thr = (float(self.loss_cfg.get("threshold0", 0.98)),
               float(self.loss_cfg.get("threshold1", 0.97)))
        return scores, thr

    def _blocked(self, fn, *arrays):
        """Apply a loss over per-block slices and average (per-rank DDP
        loss semantics). vmap over blocks: a rematerialized lax.map was
        probed and is slower in the full step (docs/PERFORMANCE.md,
        "DDP-parity regime") — the loss residuals are not what makes the
        B=256 step memory-bound."""
        bs = self.block_size
        b = arrays[0].shape[0]
        if not bs or bs >= b:
            return fn(*arrays)
        nb = b // bs
        blocked = [a.reshape((nb, bs) + a.shape[1:]) for a in arrays]
        return jnp.mean(jax.vmap(fn)(*blocked))

    # ------------------------------------------------------------------
    def loss_fn(self, params, batch: Dict[str, jnp.ndarray],
                deterministic: bool = True,
                rngs: Optional[Dict[str, jax.Array]] = None,
                tool_params: Optional[Any] = None
                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        params = self._freeze(params)
        outs = self.model.apply(
            {"params": params}, batch, deterministic=deterministic,
            rngs=rngs or {})
        img_g, img_l, txt_g, txt_l, router_probs = outs
        cap_lens = batch["cap_lens"]

        scores = thresholds = None
        if self.soft_label:
            scores, thresholds = self._soft_targets(params, batch, tool_params)

        def local_fn(il, tl, cl):
            out = self.local_loss(il, tl, cl, temp1=self.temp1,
                                  temp2=self.temp2, temp3=self.temp3,
                                  agg=self.agg, scores=scores,
                                  thresholds=thresholds)
            return out.loss0 + out.loss1

        def global_fn(ig, tg):
            return self.global_loss(ig, tg, temp3=self.temp3, scores=scores,
                                    thresholds=thresholds)

        # local-loss inputs ride in the training compute dtype: the word-
        # region einsums are the loss's FLOPs, and bf16 MXU inputs (f32
        # accumulation inside the loss) run ~3x the f32 rate — consistent
        # with the bf16 activation policy of every tower. The loss
        # functions themselves stay dtype-honest (the torch-parity tests
        # drive them in f32).
        ldt = self.loss_dtype
        if ldt is not None:
            img_l = img_l.astype(ldt)
            txt_l = txt_l.astype(ldt)
        l_loss = self._blocked(local_fn, img_l, txt_l, cap_lens)
        g_loss = self._blocked(global_fn, img_g, txt_g)

        if router_probs is not None and "label" in batch:
            c_loss = L.router_classification_loss(router_probs, batch["label"])
            c_acc = L.router_accuracy(router_probs, batch["label"])
        else:
            c_loss = jnp.asarray(0.0)
            c_acc = jnp.asarray(0.0)

        loss = (self.local_w * l_loss + self.global_w * g_loss
                + self.classifier_w * c_loss)
        metrics = {
            "loss": loss,
            "l_loss": l_loss,
            "g_loss": g_loss,
            "c_loss": c_loss,
            "c_acc": c_acc,
        }
        return loss, metrics

    # ------------------------------------------------------------------
    def trainable_mask(self, params: Any) -> Any:
        """Bool pytree: False on frozen subtrees (freeze_bert / freeze_cnn).

        Frozen subtrees get stop_gradient in loss_fn (their grads are exact
        zeros); this mask additionally drops them from the optimizer, so
        they carry no Adam moments (≈880 MB HBM for BERT-base) and skip the
        per-step moment-decay / apply_updates elementwise passes — matching
        torch Adam, which never visits requires_grad=False params."""
        mask = jax.tree_util.tree_map(lambda _: True, params)
        if self.text_cfg.get("freeze_bert", False) and \
                "text_encoder" in params and "bert" in params["text_encoder"]:
            te = dict(mask["text_encoder"])
            te["bert"] = jax.tree_util.tree_map(
                lambda _: False, params["text_encoder"]["bert"])
            mask = {**mask, "text_encoder": te}
        if self.vision_cfg.get("freeze_cnn", False) and \
                "image_encoder" in params:
            mask = {**mask, "image_encoder": jax.tree_util.tree_map(
                lambda _: False, params["image_encoder"])}
        return mask

    def _has_frozen(self) -> bool:
        return bool(self.text_cfg.get("freeze_bert", False)
                    or self.vision_cfg.get("freeze_cnn", False))

    def make_optimizer(self, gradient_clip_val: Optional[float] = None):
        if self.optimizer_factory is None:
            from medmoe_tpu.train.optim import adam

            tx = adam(gradient_clip_val=gradient_clip_val)
        else:
            tx = self.optimizer_factory(gradient_clip_val=gradient_clip_val)
        if self._has_frozen():
            from medmoe_tpu.train.optim import freeze_mask

            tx = freeze_mask(tx, self.trainable_mask)
        return tx

    def make_scheduler(self):
        return self.scheduler_factory() if self.scheduler_factory else None
