"""Pallas kernel tests (interpret mode — runs on the CPU test mesh; on real
TPU hardware the same kernels compile through Mosaic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu


@pytest.fixture()
def data():
    rng = np.random.RandomState(0)
    b, d, h, w, t = 4, 128, 8, 8, 25
    return (jnp.asarray(rng.randn(b, d, h, w).astype(np.float32)),
            jnp.asarray(rng.randn(b, d, t).astype(np.float32)),
            jnp.asarray(rng.randint(3, t + 1, size=b).astype(np.int32)))


class TestGloriaSimilarityKernel:
    def test_matches_xla(self, data):
        from medmoe_tpu.ops.pallas.gloria_attention import (
            _sim_xla, gloria_similarity_pallas)

        img, words, cap = data
        with pltpu.force_tpu_interpret_mode():
            out = gloria_similarity_pallas(img, words, cap, 4.0, 5.0, 10.0)
        ref = _sim_xla(img, words, cap, 4.0, 5.0, 10.0)
        rel = np.abs(np.asarray(out) - np.asarray(ref)) \
            / np.maximum(np.abs(np.asarray(ref)), 1.0)
        assert rel.max() < 2e-3        # bf16 MXU inputs, f32 accumulation

    @pytest.mark.slow
    def test_gradients_via_custom_vjp(self, data):
        from medmoe_tpu.ops.pallas.gloria_attention import (
            _sim_xla, gloria_similarity_pallas)

        img, words, cap = data

        def loss_p(i, w):
            return jnp.sum(gloria_similarity_pallas(i, w, cap) ** 2)

        def loss_x(i, w):
            return jnp.sum(_sim_xla(i, w, cap, 4.0, 5.0, 10.0) ** 2)

        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(loss_p, argnums=(0, 1))(img, words)
        gx = jax.grad(loss_x, argnums=(0, 1))(img, words)
        for a, b in zip(gp, gx):
            rel = np.abs(np.asarray(a) - np.asarray(b)).max() \
                / max(np.abs(np.asarray(b)).max(), 1e-9)
            assert rel < 2e-3

    def test_loss_class_pallas_impl(self, data):
        from medmoe_tpu.ops.losses import GLORIALocalContrastiveLoss

        img, words, cap = data
        with pltpu.force_tpu_interpret_mode():
            out_p = GLORIALocalContrastiveLoss(impl="pallas")(
                img, words, cap)
        out_x = GLORIALocalContrastiveLoss()(img, words, cap)
        np.testing.assert_allclose(
            float(out_p.loss0 + out_p.loss1),
            float(out_x.loss0 + out_x.loss1), rtol=5e-3)
