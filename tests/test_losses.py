"""Loss numerics: the batched/masked TPU implementations must match naive
per-sample implementations of the reference formulas
(reference src/losses.py GLoRIA global :766-794 / local :961-1026)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medmoe_tpu.ops import losses as L


def _softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _ce_diag(scores):
    # mean CE with labels arange(B)
    logprobs = scores - np.log(np.exp(scores - scores.max(-1, keepdims=True))
                               .sum(-1, keepdims=True)) - scores.max(-1, keepdims=True)
    return -np.mean(np.diagonal(logprobs))


def naive_gloria_local(img, words, cap_lens, temp1, temp2, temp3, agg="sum"):
    """Direct per-caption loop translation of the reference math
    (losses.py:979-1015): slice valid words, double-softmax attention,
    per-word cosine, exp/sum/log aggregation, symmetric CE."""
    b, d, h, w = img.shape
    m = h * w
    context = img.reshape(b, d, m)
    sims = np.zeros((b, b))  # [image, text]
    for i in range(b):
        n = int(cap_lens[i])
        word = words[i][:, :n]                          # [D, n]
        # attn: scores[b, m, t]
        scores = np.einsum("bdm,dt->bmt", context, word)
        a1 = _softmax(scores, axis=-1)                  # over words
        a2 = _softmax(a1 * temp1, axis=-2)              # over regions
        wei = np.einsum("bdm,bmt->bdt", context, a2)    # [b, D, n]
        num = np.sum(word[None] * wei, axis=1)          # [b, n]
        den = (np.linalg.norm(word, axis=0)[None]
               * np.linalg.norm(wei, axis=1))
        cos = num / np.maximum(den, 1e-8)
        row = np.exp(cos * temp2)
        if agg == "sum":
            row = row.sum(axis=1)
        else:
            row = row.mean(axis=1)
        sims[:, i] = np.log(row)
    sims = sims * temp3
    return _ce_diag(sims) + _ce_diag(sims.T)


class TestSoftmaxBf16Residual:
    """ops/softmax.py softmax_bf16_residual: exact f32 forward, bf16-rounded
    residual in the vjp only (the attention HBM-traffic optimization used by
    the GLoRIA local loss and Swin window attention)."""

    def test_forward_bit_identical(self):
        from medmoe_tpu.ops.softmax import softmax_bf16_residual

        x = jnp.asarray(np.random.RandomState(0)
                        .randn(4, 7, 9).astype(np.float32)) * 3.0
        for axis in (-1, -2):
            got = softmax_bf16_residual(x, axis)
            exact = jax.nn.softmax(x, axis=axis)
            assert np.array_equal(np.asarray(got), np.asarray(exact))

    def test_gradient_close_to_exact(self):
        from medmoe_tpu.ops.softmax import softmax_bf16_residual

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(6, 11).astype(np.float32))
        w = jnp.asarray(rng.randn(6, 11).astype(np.float32))

        def f(soft):
            return lambda v: jnp.sum(soft(v) * w)

        g16 = jax.grad(f(lambda v: softmax_bf16_residual(v, -1)))(x)
        g32 = jax.grad(f(lambda v: jax.nn.softmax(v, axis=-1)))(x)
        np.testing.assert_allclose(np.asarray(g16), np.asarray(g32),
                                   rtol=0, atol=2e-2)
        # bf16 residual rounding must actually differ somewhere (guards
        # against the custom vjp silently not being used)
        assert not np.array_equal(np.asarray(g16), np.asarray(g32))

    def test_bf16_primal_gradable(self):
        """A bfloat16 caller must get a bfloat16 cotangent back (the
        custom_vjp contract requires the primal dtype)."""
        from medmoe_tpu.ops.softmax import softmax_bf16_residual

        x = jnp.asarray(np.random.RandomState(4).randn(4, 9),
                        jnp.bfloat16)
        g = jax.grad(lambda v: jnp.sum(
            softmax_bf16_residual(v, -1).astype(jnp.float32) ** 2))(x)
        assert g.dtype == jnp.bfloat16
        assert np.all(np.isfinite(np.asarray(g, np.float32)))

    def test_env_kill_switch(self, monkeypatch):
        from medmoe_tpu.ops import softmax as S

        x = jnp.asarray(np.random.RandomState(3)
                        .randn(5, 9).astype(np.float32))
        monkeypatch.setenv("MEDMOE_SOFTMAX_RES", "f32")
        g_off = jax.grad(lambda v: jnp.sum(S.softmax(v, -1) ** 2))(x)
        g_exact = jax.grad(
            lambda v: jnp.sum(jax.nn.softmax(v, axis=-1) ** 2))(x)
        assert np.array_equal(np.asarray(g_off), np.asarray(g_exact))

    def test_masked_positions_zero_grad(self):
        # NEG_INF-masked entries produce exact-zero attention and must keep
        # exact-zero gradients through the bf16 residual
        from medmoe_tpu.ops.softmax import softmax_bf16_residual

        x = jnp.asarray(np.random.RandomState(2)
                        .randn(3, 5).astype(np.float32))
        mask = jnp.asarray([[True, True, False, False, False]] * 3)
        xm = jnp.where(mask, x, L.NEG_INF)

        def f(v):
            return jnp.sum(softmax_bf16_residual(v, -1) ** 2)

        g = np.asarray(jax.grad(f)(xm))
        assert np.allclose(g[:, 2:], 0.0)
        assert np.all(np.isfinite(g))


class TestGloriaLocal:
    def test_matches_naive_loop(self):
        rng = np.random.RandomState(0)
        b, d, h, w, t = 5, 8, 4, 4, 7
        img = rng.randn(b, d, h, w).astype(np.float32)
        words = rng.randn(b, d, t).astype(np.float32)
        cap_lens = np.array([3, 7, 5, 2, 6], dtype=np.int32)

        expected = naive_gloria_local(img, words, cap_lens, 4.0, 5.0, 10.0)
        out = L.gloria_local_loss(jnp.asarray(img), jnp.asarray(words),
                                  jnp.asarray(cap_lens), 4.0, 5.0, 10.0)
        got = float(out.loss0 + out.loss1)
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_agg_mean(self):
        rng = np.random.RandomState(1)
        b, d, h, w, t = 3, 4, 2, 2, 5
        img = rng.randn(b, d, h, w).astype(np.float32)
        words = rng.randn(b, d, t).astype(np.float32)
        cap_lens = np.array([2, 5, 4], dtype=np.int32)
        expected = naive_gloria_local(img, words, cap_lens, 4.0, 5.0, 10.0,
                                      agg="mean")
        out = L.gloria_local_loss(jnp.asarray(img), jnp.asarray(words),
                                  jnp.asarray(cap_lens), 4.0, 5.0, 10.0,
                                  agg="mean")
        np.testing.assert_allclose(float(out.loss0 + out.loss1), expected,
                                   rtol=1e-4)

    def test_text_chunking_identical(self):
        """Chunked (lax.map + remat) path must match the fused path exactly,
        for values AND gradients."""
        rng = np.random.RandomState(5)
        b, d, h, w, t = 8, 6, 3, 3, 7
        img = jnp.asarray(rng.randn(b, d, h, w).astype(np.float32))
        words = jnp.asarray(rng.randn(b, d, t).astype(np.float32))
        cl = jnp.asarray(rng.randint(1, t + 1, size=b))

        def total(i, wd, chunk):
            o = L.gloria_local_loss(i, wd, cl, text_chunk=chunk)
            return o.loss0 + o.loss1

        full = total(img, words, None)
        chunked = total(img, words, 2)
        np.testing.assert_allclose(float(full), float(chunked), rtol=1e-5)
        g_full = jax.grad(total)(img, words, None)
        g_chunk = jax.grad(total)(img, words, 2)
        np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_chunk),
                                   rtol=1e-4, atol=1e-6)

    def test_att_maps_shape(self):
        rng = np.random.RandomState(2)
        img = rng.randn(3, 4, 2, 2).astype(np.float32)
        words = rng.randn(3, 4, 5).astype(np.float32)
        out = L.gloria_local_loss(jnp.asarray(img), jnp.asarray(words),
                                  jnp.asarray([2, 3, 5]), return_att_maps=True)
        assert out.att_maps.shape == (3, 5, 2, 2)

    def test_gradable(self):
        rng = np.random.RandomState(3)
        img = jnp.asarray(rng.randn(3, 4, 2, 2).astype(np.float32))
        words = jnp.asarray(rng.randn(3, 4, 5).astype(np.float32))
        cl = jnp.asarray([2, 3, 5])

        def f(i, w):
            o = L.gloria_local_loss(i, w, cl)
            return o.loss0 + o.loss1

        gi, gw = jax.grad(f, argnums=(0, 1))(img, words)
        assert np.all(np.isfinite(gi)) and np.all(np.isfinite(gw))
        # masked word positions must get zero gradient
        gw = np.asarray(gw)
        assert np.allclose(gw[0, :, 2:], 0.0)  # cap_len=2 → t≥2 masked


class TestGloriaGlobal:
    def test_matches_naive(self):
        rng = np.random.RandomState(0)
        img = rng.randn(6, 8).astype(np.float32)
        txt = rng.randn(6, 8).astype(np.float32)
        scores = (img @ txt.T) / np.maximum(
            np.linalg.norm(img, axis=1, keepdims=True)
            * np.linalg.norm(txt, axis=1)[None], 1e-8) * 10.0
        expected = _ce_diag(scores) + _ce_diag(scores.T)
        got = float(L.gloria_global_loss(jnp.asarray(img), jnp.asarray(txt),
                                         temp3=10.0))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_zero_stubs(self):
        z = L.ZEROGlobalContrastiveLoss()(jnp.ones((2, 4)), jnp.ones((2, 4)))
        assert float(z) == 0.0
        out = L.ZEROLocalContrastiveLoss()(jnp.ones((2, 4, 2, 2)),
                                           jnp.ones((2, 4, 5)),
                                           jnp.asarray([3, 3]))
        assert float(out.loss0 + out.loss1) == 0.0


class TestClipContrastive:
    def test_single_device(self):
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.randn(8, 16).astype(np.float32))
        txt = jnp.asarray(rng.randn(8, 16).astype(np.float32))
        loss = L.clip_contrastive_loss(img, txt, jnp.asarray(0.0))
        assert np.isfinite(float(loss))
        # perfectly aligned pairs → loss below random baseline
        aligned = L.clip_contrastive_loss(img, img, jnp.asarray(4.0))
        assert float(aligned) < float(loss)

    def test_global_negatives_match_local_when_one_shard(self):
        rng = np.random.RandomState(1)
        img = jnp.asarray(rng.randn(8, 16).astype(np.float32))
        txt = jnp.asarray(rng.randn(8, 16).astype(np.float32))

        def with_axis(i, t):
            loss = L.clip_contrastive_loss(i, t, jnp.asarray(0.0),
                                           axis_name="data")
            return jax.lax.pmean(loss, "data")

        gathered = jax.shard_map(
            with_axis,
            mesh=jax.make_mesh((1,), ("data",), devices=jax.devices()[:1]),
            in_specs=jax.sharding.PartitionSpec("data"),
            out_specs=jax.sharding.PartitionSpec(),
        )(img, txt)
        plain = L.clip_contrastive_loss(img, txt, jnp.asarray(0.0))
        np.testing.assert_allclose(float(gathered), float(plain), rtol=1e-5)


class TestHardNegative:
    def test_matches_naive(self):
        rng = np.random.RandomState(0)
        imgs = rng.randn(6, 8).astype(np.float32)
        caps = rng.randn(6, 8).astype(np.float32)
        i = imgs / np.linalg.norm(imgs, axis=1, keepdims=True)
        c = caps / np.linalg.norm(caps, axis=1, keepdims=True)
        s = i @ c.T
        diag = np.diagonal(s).copy()
        s2 = s - 2 * np.diag(diag)
        max_c = np.sort(s2, axis=0)[::-1][:1]
        max_i = np.sort(s2, axis=1)[:, ::-1][:, :1]
        expected = (np.maximum(max_c + (0.2 - diag)[None, :], 0).sum()
                    + np.maximum(max_i + (0.2 - diag)[:, None], 0).sum())
        got = float(L.hard_negative_loss(jnp.asarray(imgs), jnp.asarray(caps)))
        np.testing.assert_allclose(got, expected, rtol=1e-5)


class TestZeroEmbeddingGradients:
    """Capacity-dropped samples in the MoE dispatched modes carry
    exactly-zero embeddings. Every loss must emit FINITE gradients for
    them: sqrt'(0) = inf, so a norm whose eps floor sits outside the sqrt
    (the reference's torch form — safe there, since torch never produces
    zero rows) turns a single dropped sample into NaN grads that Adam then
    propagates into every parameter. Regression for the full-size
    moe_mode=topk step going non-finite after one optimizer update."""

    def _grads_finite(self, fn, *args):
        grads = jax.grad(fn, argnums=tuple(range(len(args))))(*args)
        return all(bool(np.isfinite(np.asarray(g)).all()) for g in grads)

    def test_gloria_local_zero_image(self):
        rng = np.random.RandomState(0)
        img = rng.randn(4, 8, 2, 2).astype(np.float32)
        img[1] = 0.0
        words = rng.randn(4, 8, 5).astype(np.float32)
        cap = jnp.asarray(np.full((4,), 4, np.int32))
        assert self._grads_finite(
            lambda i, w: (lambda o: o.loss0 + o.loss1)(
                L.gloria_local_loss(i, w, cap)),
            jnp.asarray(img), jnp.asarray(words))

    def test_gloria_local_zero_words(self):
        rng = np.random.RandomState(1)
        img = rng.randn(4, 8, 2, 2).astype(np.float32)
        words = rng.randn(4, 8, 5).astype(np.float32)
        words[2] = 0.0
        cap = jnp.asarray(np.full((4,), 4, np.int32))
        assert self._grads_finite(
            lambda i, w: (lambda o: o.loss0 + o.loss1)(
                L.gloria_local_loss(i, w, cap)),
            jnp.asarray(img), jnp.asarray(words))

    def test_gloria_global_zero_row(self):
        rng = np.random.RandomState(2)
        img = rng.randn(6, 8).astype(np.float32)
        img[3] = 0.0
        txt = rng.randn(6, 8).astype(np.float32)
        assert self._grads_finite(
            lambda i, t: L.gloria_global_loss(i, t),
            jnp.asarray(img), jnp.asarray(txt))

    def test_clip_contrastive_zero_row(self):
        rng = np.random.RandomState(3)
        img = rng.randn(6, 8).astype(np.float32)
        img[0] = 0.0
        txt = rng.randn(6, 8).astype(np.float32)
        assert self._grads_finite(
            lambda i, t: L.clip_contrastive_loss(i, t, jnp.asarray(0.0)),
            jnp.asarray(img), jnp.asarray(txt))

    def test_hard_negative_zero_row(self):
        rng = np.random.RandomState(4)
        img = rng.randn(6, 8).astype(np.float32)
        img[5] = 0.0
        txt = rng.randn(6, 8).astype(np.float32)
        assert self._grads_finite(
            lambda i, t: L.hard_negative_loss(i, t),
            jnp.asarray(img), jnp.asarray(txt))

    def test_l2_normalize_zero_row(self):
        from medmoe_tpu.models.layers import l2_normalize

        x = np.ones((3, 8), np.float32)
        x[1] = 0.0
        assert self._grads_finite(
            lambda a: jnp.sum(l2_normalize(a) ** 2), jnp.asarray(x))

    def test_safe_norm_matches_clamped_norm(self):
        """Same math as max(||x||, eps) for nonzero rows (up to summation
        order) and exactly eps for zero rows."""
        rng = np.random.RandomState(5)
        x = rng.randn(4, 8).astype(np.float32)
        x[2] = 0.0
        got = np.asarray(L.safe_norm(jnp.asarray(x)))
        want = np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        assert got[2, 0] == 1e-12


class TestRouterLoss:
    def test_double_softmax_quirk(self):
        """CE must be applied on top of softmaxed probs (reference quirk)."""
        probs = jnp.asarray([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]])
        labels = jnp.asarray([0, 1])
        got = float(L.router_classification_loss(probs, labels))
        lp = np.log(_softmax(np.asarray(probs), axis=-1))
        expected = -np.mean([lp[0, 0], lp[1, 1]])
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_accuracy(self):
        probs = jnp.asarray([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]])
        labels = jnp.asarray([0, 1, 1])
        assert abs(float(L.router_accuracy(probs, labels)) - 2 / 3) < 1e-6


class TestAutoTextChunk:
    def test_square_whole_batch_fits(self):
        # B=32 square: unchunked backward peak ~0.3 GB — no chunk loop
        assert L.auto_text_chunk(32, 361, 97) is None

    def test_rectangular_does_not_skip_chunking(self):
        """Regression: under shard_map the per-shard backward sees 32
        images x 256 replicated texts; the whole-batch early exit used to
        compare the budgeted chunk (~159) against the IMAGE count (32) and
        return None — an unchunked [256, 32, M, T] residual ~n_devices x
        the budget."""
        chunk = L.auto_text_chunk(32, 361, 97, n_texts=256)
        assert chunk is not None and chunk < 256 and 256 % chunk == 0
        # peak residual for the chosen chunk stays within the 2 GiB budget
        assert chunk * 32 * 361 * 97 * 12 <= (2 << 30)

    def test_rectangular_small_text_batch_still_skips(self):
        assert L.auto_text_chunk(32, 361, 97, n_texts=8) is None
