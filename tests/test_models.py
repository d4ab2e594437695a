"""Model tower tests: shapes, pyramid structure, end-to-end module step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import tiny_batch, tiny_module


@pytest.fixture(scope="module")
def module_and_params():
    mod = tiny_module()
    batch, _ = tiny_batch()
    params = jax.jit(mod.init_params)(jax.random.PRNGKey(0), batch)
    return mod, params, batch


class TestSwin:
    def test_pyramid_shapes(self):
        from medmoe_tpu.models.swin import SwinBackbone, SwinConfig

        cfg = SwinConfig(image_size=56, embed_dim=8, depths=(1, 1),
                         num_heads=(1, 2), window_size=7, drop_path_rate=0.0,
                         dtype=jnp.float32)
        m = SwinBackbone(cfg)
        x = np.zeros((2, 56, 56, 3), np.float32)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        pyramid, final = jax.jit(m.apply)(v, x)
        assert [p.shape for p in pyramid] == [(2, 196, 8), (2, 49, 16)]
        assert final.shape == (2, 49, 16)

    def test_shifted_window_mixes_across_windows(self):
        """With a shifted second block, a token near the window boundary must
        receive information from the neighboring window; without the shifted
        block it must not. Also: the wrapped corner (token (0,0)) must stay
        isolated — the shift mask blocks wrap-around attention."""
        from medmoe_tpu.models.swin import SwinBackbone, SwinConfig

        rng = np.random.RandomState(0)
        x = rng.randn(1, 56, 56, 3).astype(np.float32)
        x2 = x.copy()
        x2[:, 28:, 28:] += 1.0   # affects patch tokens (7.., 7..) of 14×14

        def run(depths):
            cfg = SwinConfig(image_size=56, embed_dim=8, depths=depths,
                             num_heads=(1,), window_size=7,
                             drop_path_rate=0.0, dtype=jnp.float32)
            m = SwinBackbone(cfg)
            v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
            _, f1 = jax.jit(m.apply)(v, x)
            _, f2 = jax.jit(m.apply)(v, x2)
            return np.asarray(f1)[0], np.asarray(f2)[0]

        # token (5,5): W-MSA window is rows/cols 0-6 (unaffected); the
        # shifted window spans originals 3..9 → sees the change.
        boundary = 5 * 14 + 5
        f1, f2 = run((2,))
        assert np.abs(f1[boundary] - f2[boundary]).max() > 0
        # corner token (0,0): shift mask forbids wrap-around mixing
        assert np.abs(f1[0] - f2[0]).max() == 0
        # single W-MSA block only: boundary token must NOT change
        g1, g2 = run((1,))
        assert np.abs(g1[boundary] - g2[boundary]).max() == 0


class TestBertDropout:
    """HF bert-base trains with hidden/attention dropout 0.1; the reference
    runs it even on the frozen tower (Lightning train() mode + freeze_bert
    stopping only gradients). Train mode must be stochastic per rng; eval
    mode (deterministic=True, every parity/eval path) must be unaffected."""

    def _bert(self):
        from medmoe_tpu.models.bert import BertConfig, BertModel

        cfg = BertConfig(vocab_size=64, hidden_size=16, num_layers=2,
                         num_heads=2, intermediate_size=32,
                         max_position_embeddings=16, dtype=jnp.float32)
        ids = np.ones((2, 8), np.int32)
        mask = np.ones((2, 8), np.int32)
        typ = np.zeros((2, 8), np.int32)
        m = BertModel(cfg)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), ids, mask, typ)
        return m, v, (ids, mask, typ)

    def test_train_mode_stochastic_eval_deterministic(self):
        m, v, args = self._bert()
        ev1, _, _ = m.apply(v, *args)                    # deterministic=True
        ev2, _, _ = m.apply(v, *args)
        np.testing.assert_array_equal(np.asarray(ev1), np.asarray(ev2))

        tr1, _, _ = m.apply(v, *args, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(1)})
        tr2, _, _ = m.apply(v, *args, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(2)})
        assert np.abs(np.asarray(tr1) - np.asarray(tr2)).max() > 0
        assert np.abs(np.asarray(tr1) - np.asarray(ev1)).max() > 0

    def test_zero_rates_make_train_equal_eval(self):
        from medmoe_tpu.models.bert import BertConfig, BertModel

        cfg = BertConfig(vocab_size=64, hidden_size=16, num_layers=2,
                         num_heads=2, intermediate_size=32,
                         max_position_embeddings=16,
                         hidden_dropout_prob=0.0,
                         attention_probs_dropout_prob=0.0,
                         dtype=jnp.float32)
        ids = np.ones((2, 8), np.int32)
        mask = np.ones((2, 8), np.int32)
        typ = np.zeros((2, 8), np.int32)
        m = BertModel(cfg)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), ids, mask, typ)
        ev, _, _ = m.apply(v, ids, mask, typ)
        tr, _, _ = m.apply(v, ids, mask, typ, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(1)})
        np.testing.assert_array_equal(np.asarray(ev), np.asarray(tr))


class TestMedMoEForward:
    def test_output_shapes(self, module_and_params):
        mod, params, batch = module_and_params
        outs = jax.jit(lambda p, b: mod.model.apply({"params": p}, b))(
            params, batch)
        img_g, img_l, txt_g, txt_l, router = outs
        b = batch["image"].shape[0]
        assert img_g.shape == (b, 16)
        assert img_l.shape == (b, 16, 14, 14)       # sqrt(196)
        assert txt_g.shape == (b, 16)
        assert txt_l.shape == (b, 16, 10)
        assert router.shape == (b, 3)

    def test_loss_finite_and_weighted(self, module_and_params):
        mod, params, batch = module_and_params
        loss, metrics = jax.jit(mod.loss_fn)(params, batch)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        expected = (0.5 * metrics["l_loss"] + 0.5 * metrics["g_loss"]
                    + 2.0 * metrics["c_loss"])
        np.testing.assert_allclose(float(loss), float(expected), rtol=1e-5)

    def test_frozen_bert_gets_no_grad(self, module_and_params):
        mod, params, batch = module_and_params
        grads = jax.jit(jax.grad(
            lambda p: mod.loss_fn(p, batch)[0]))(params)
        bert_grads = jax.tree_util.tree_leaves(
            grads["text_encoder"]["bert"])
        assert all(float(jnp.abs(g).max()) == 0.0 for g in bert_grads)
        vision_grads = jax.tree_util.tree_leaves(grads["image_encoder"])
        assert any(float(jnp.abs(g).max()) > 0.0 for g in vision_grads)


@pytest.mark.slow
class TestTrainStep:
    def test_loss_decreases(self, module_and_params):
        from medmoe_tpu.train.state import TrainState
        from medmoe_tpu.train.step import build_train_step

        mod, params, batch = module_and_params
        tx = mod.make_optimizer(gradient_clip_val=0.25)
        state = TrainState.create(params, tx)
        step = build_train_step(mod, accum_steps=1, donate=False)
        losses = []
        for i in range(4):
            state, m = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 4

    def test_grad_accumulation_matches_big_batch(self, module_and_params):
        """accum over two half-batches ≡ mean of per-half grads."""
        from medmoe_tpu.train.state import TrainState
        from medmoe_tpu.train.step import build_train_step

        mod, params, batch = module_and_params
        tx = mod.make_optimizer()
        rng = jax.random.PRNGKey(7)

        # accum=2: stack two identical micro-batches → grads = grad(batch)
        stacked = jax.tree_util.tree_map(
            lambda x: np.stack([x, x]), batch)
        state_a = TrainState.create(params, tx)
        step_a = build_train_step(mod, accum_steps=2, donate=False)
        state_a, ma = step_a(state_a, stacked, rng)

        state_b = TrainState.create(params, tx)
        step_b = build_train_step(mod, accum_steps=1, donate=False)
        state_b, mb = step_b(state_b, batch, rng)

        np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                                   rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                        jax.tree_util.tree_leaves(state_b.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_gradient_clipping_applied(self, module_and_params):
        from medmoe_tpu.train.optim import adam

        mod, params, batch = module_and_params
        grads = jax.jit(jax.grad(lambda p: mod.loss_fn(p, batch)[0]))(params)
        gnorm = float(jnp.sqrt(sum(jnp.sum(g ** 2)
                                   for g in jax.tree_util.tree_leaves(grads))))
        assert gnorm > 1e-3  # meaningful clip test
        tx = adam(lr=1.0, gradient_clip_val=1e-3)
        opt_state = tx.init(params)
        updates, _ = tx.update(grads, opt_state, params)
        # adam normalizes magnitudes; just ensure finite + nonzero
        unorm = float(jnp.sqrt(sum(jnp.sum(u ** 2)
                                   for u in jax.tree_util.tree_leaves(updates))))
        assert np.isfinite(unorm) and unorm > 0


class TestScheduler:
    def test_reduce_on_plateau(self):
        from medmoe_tpu.train.optim import reduce_lr_on_plateau

        sched = reduce_lr_on_plateau(factor=0.1, patience=2)
        lr = 1.0
        lr = sched.step(1.0, lr)   # best=1.0
        assert lr == 1.0
        lr = sched.step(1.0, lr)   # bad 1
        lr = sched.step(1.0, lr)   # bad 2
        assert lr == 1.0
        lr = sched.step(1.0, lr)   # bad 3 > patience → reduce
        assert abs(lr - 0.1) < 1e-9
        lr = sched.step(0.5, lr)   # improvement resets
        assert abs(lr - 0.1) < 1e-9


class TestLossDtype:
    """loss.loss_dtype: the local-loss inputs ride the towers' compute
    dtype on the train path (train/module.py) — value drift vs f32 must be
    bf16-rounding-sized, and null must keep f32 exactly."""

    def test_bf16_close_to_f32_and_null_exact(self):
        import jax

        from tests.helpers import tiny_batch, tiny_module

        batch, _ = tiny_batch()
        mod_f32 = tiny_module()
        params = jax.jit(mod_f32.init_params)(jax.random.PRNGKey(0), batch)
        assert mod_f32.loss_dtype is None          # tiny vision dtype=f32

        mod_bf16 = tiny_module(loss_dtype="bfloat16")
        assert mod_bf16.loss_dtype == jnp.bfloat16
        l32, m32 = jax.jit(mod_f32.loss_fn)(params, batch)
        l16, m16 = jax.jit(mod_bf16.loss_fn)(params, batch)
        np.testing.assert_allclose(float(l16), float(l32), rtol=2e-2)
        # only the local term may drift; global/classifier identical
        np.testing.assert_allclose(float(m16["g_loss"]),
                                   float(m32["g_loss"]), rtol=1e-6)
        np.testing.assert_allclose(float(m16["c_loss"]),
                                   float(m32["c_loss"]), rtol=1e-6)


class TestEmbedGather:
    """GatherEmbed: plain-gather forward, one-hot-matmul backward
    (models/bert.py _gather_rows)."""

    def _table(self, n=50, d=16):
        rng = np.random.RandomState(0)
        return jnp.asarray(rng.randn(n, d).astype(np.float32))

    def test_forward_matches_take_in_range(self):
        from medmoe_tpu.models.bert import _gather_rows

        table = self._table()
        ids = jnp.asarray([0, 3, 49, 3])
        np.testing.assert_array_equal(np.asarray(_gather_rows(table, ids)),
                                      np.asarray(table)[[0, 3, 49, 3]])

    def test_out_of_range_ids_are_zero_not_nan(self):
        """jnp.take's default OOB mode is 'fill' with NaN, which silently
        poisons the whole loss (hit by tokenizer/vocab mismatches). The
        embed gather must return ZERO rows instead — the exact semantics
        of OneHotEmbed's all-zero one-hot row and of this custom vjp's
        backward (whose one-hot drops OOB ids)."""
        from medmoe_tpu.models.bert import _gather_rows

        table = self._table(n=8)
        ids = jnp.asarray([2, 8, 100, 7])        # 8 and 100 out of range
        out = np.asarray(_gather_rows(table, ids))
        assert np.all(np.isfinite(out))
        np.testing.assert_array_equal(out[1], np.zeros(16, np.float32))
        np.testing.assert_array_equal(out[2], np.zeros(16, np.float32))
        np.testing.assert_array_equal(out[0], np.asarray(table)[2])

    def test_table_grad_matches_take_vjp(self):
        from medmoe_tpu.models.bert import _gather_rows

        table = self._table()
        ids = jnp.asarray([[1, 2, 2], [4, 1, 0]])

        def loss_custom(t):
            return jnp.sum(jnp.sin(_gather_rows(t, ids)) ** 2)

        def loss_take(t):
            return jnp.sum(jnp.sin(jnp.take(t, ids, axis=0)) ** 2)

        g1 = jax.grad(loss_custom)(table)
        g2 = jax.grad(loss_take)(table)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-6, atol=1e-6)

    def test_oob_ids_contribute_no_grad(self):
        from medmoe_tpu.models.bert import _gather_rows

        table = self._table(n=4)
        ids = jnp.asarray([1, 9])                # 9 out of range
        g = jax.grad(lambda t: jnp.sum(_gather_rows(t, ids)))(table)
        g = np.asarray(g)
        assert np.all(np.isfinite(g))
        np.testing.assert_array_equal(g[1], np.ones(16, np.float32))
        assert np.all(g[[0, 2, 3]] == 0)


class TestCompactLayerNorm:
    """The compact-residual custom_vjp LN (MEDMOE_LN_IMPL=compact, the
    default) must match the autodiff'd f32 flax LayerNorm — forward and
    grads — within one rounding of the input dtype."""

    def _apply(self, impl, x, monkeypatch):
        import jax

        from medmoe_tpu.models.layers import Fp32LayerNorm

        monkeypatch.setenv("MEDMOE_LN_IMPL", impl)
        mdl = Fp32LayerNorm(epsilon=1e-5)
        params = mdl.init(jax.random.PRNGKey(0), x)["params"]
        # non-trivial affine params so dgamma/dbeta/dx all exercise them
        params = jax.tree_util.tree_map(
            lambda p: p + 0.3 * np.arange(p.size, dtype=np.float32)
            / p.size, params)

        def f(params, x):
            y = mdl.apply({"params": params}, x)
            return jnp.sum(y.astype(jnp.float32) ** 2), y

        (loss, y), grads = jax.value_and_grad(f, argnums=(0, 1),
                                              has_aux=True)(params, x)
        return y, grads

    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_matches_flax_f32_layernorm(self, dtype, monkeypatch):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(6, 49, 96) * 2 + 0.5, jnp.dtype(dtype))

        y_c, (gp_c, gx_c) = self._apply("compact", x, monkeypatch)
        y_x, (gp_x, gx_x) = self._apply("xla", x, monkeypatch)

        assert y_c.dtype == y_x.dtype == x.dtype
        tol = 1e-6 if dtype == "float32" else 1e-2
        np.testing.assert_allclose(np.asarray(y_c, np.float32),
                                   np.asarray(y_x, np.float32),
                                   rtol=tol, atol=tol)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(gp_c),
                jax.tree_util.tree_leaves_with_path(gp_x)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4, err_msg=str(ka))
        np.testing.assert_allclose(np.asarray(gx_c, np.float32),
                                   np.asarray(gx_x, np.float32),
                                   rtol=tol, atol=2 * tol)

    def test_param_tree_layout_unchanged(self, monkeypatch):
        """Both impls must expose …/LayerNorm_0/{scale,bias} (the torch
        converter layout, models/convert.py:106)."""
        import jax

        from medmoe_tpu.models.layers import Fp32LayerNorm

        x = jnp.ones((2, 8), jnp.float32)
        trees = {}
        for impl in ("compact", "xla"):
            monkeypatch.setenv("MEDMOE_LN_IMPL", impl)
            trees[impl] = jax.tree_util.tree_structure(
                Fp32LayerNorm().init(jax.random.PRNGKey(0), x)["params"])
        assert trees["compact"] == trees["xla"]
