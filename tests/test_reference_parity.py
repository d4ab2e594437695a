"""DIRECT parity against the reference implementation: the reference's own
torch loss code (/root/reference/src/losses.py, loaded read-only via
tests/reference_compat.py) is evaluated on identical inputs as medmoe_tpu's
jax implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.reference_compat import load_reference_losses

ref = load_reference_losses()
pytestmark = pytest.mark.skipif(ref is None,
                                reason="reference tree not available")

import torch  # noqa: E402

from medmoe_tpu.ops import losses as L  # noqa: E402


def _rand(shape, seed):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


class TestGloriaLocalParity:
    @pytest.mark.parametrize("seed,b,d,hw,t", [(0, 5, 8, 4, 7),
                                               (1, 8, 16, 7, 25),
                                               (2, 3, 8, 3, 5)])
    def test_matches_reference_torch(self, seed, b, d, hw, t):
        img = _rand((b, d, hw, hw), seed)
        words = _rand((b, d, t), seed + 100)
        cap = np.random.RandomState(seed).randint(2, t + 1, size=b)

        ref_out = ref.GLORIALocalContrastiveLoss()(
            torch.tensor(img), torch.tensor(words), cap.tolist(),
            temp1=4.0, temp2=5.0, temp3=10.0)
        expected = float(ref_out.loss0 + ref_out.loss1)

        ours = L.gloria_local_loss(jnp.asarray(img), jnp.asarray(words),
                                   jnp.asarray(cap), 4.0, 5.0, 10.0)
        got = float(ours.loss0 + ours.loss1)
        np.testing.assert_allclose(got, expected, rtol=2e-4)

        # chunked path too
        if b % 2 == 0:
            chunked = L.gloria_local_loss(jnp.asarray(img),
                                          jnp.asarray(words),
                                          jnp.asarray(cap), 4.0, 5.0, 10.0,
                                          text_chunk=2)
            np.testing.assert_allclose(float(chunked.loss0 + chunked.loss1),
                                       expected, rtol=2e-4)

    def test_pallas_kernel_matches_reference(self):
        from jax.experimental.pallas import tpu as pltpu

        from medmoe_tpu.ops.pallas.gloria_attention import \
            gloria_similarity_pallas

        b, d, hw, t = 4, 16, 4, 9
        img = _rand((b, d, hw, hw), 3)
        words = _rand((b, d, t), 4)
        cap = np.random.RandomState(3).randint(2, t + 1, size=b)

        ref_out = ref.GLORIALocalContrastiveLoss()(
            torch.tensor(img), torch.tensor(words), cap.tolist(),
            temp1=4.0, temp2=5.0, temp3=10.0)
        expected = float(ref_out.loss0 + ref_out.loss1)

        with pltpu.force_tpu_interpret_mode():
            sims = gloria_similarity_pallas(jnp.asarray(img),
                                            jnp.asarray(words),
                                            jnp.asarray(cap), 4.0, 5.0, 10.0)
        lp = jax.nn.log_softmax(sims, axis=-1)
        lp_t = jax.nn.log_softmax(sims.T, axis=-1)
        got = float(-jnp.mean(jnp.diagonal(lp)) - jnp.mean(jnp.diagonal(lp_t)))
        np.testing.assert_allclose(got, expected, rtol=5e-3)  # bf16 matmuls


class TestGloriaGlobalParity:
    @pytest.mark.parametrize("seed,b,d", [(0, 6, 8), (1, 12, 32)])
    def test_matches_reference_torch(self, seed, b, d):
        cnn = _rand((b, d), seed)
        rnn = _rand((b, d), seed + 50)
        expected = float(ref.GLORIAGlobalContrastiveLoss()(
            torch.tensor(cnn), torch.tensor(rnn), temp3=10.0))
        got = float(L.gloria_global_loss(jnp.asarray(cnn), jnp.asarray(rnn),
                                         temp3=10.0))
        np.testing.assert_allclose(got, expected, rtol=2e-5)


class TestHardNegativeParity:
    def test_matches_reference_torch(self):
        imgs = _rand((7, 12), 0)
        caps = _rand((7, 12), 1)
        expected = float(ref.HardNegativeContrastiveLoss()(
            torch.tensor(imgs), torch.tensor(caps)))
        got = float(L.hard_negative_loss(jnp.asarray(imgs),
                                         jnp.asarray(caps)))
        np.testing.assert_allclose(got, expected, rtol=2e-5)


class TestSoftXEntParity:
    def test_matches_reference_torch(self):
        target = np.zeros((5, 4), np.float32)
        target[np.arange(5), [0, 1, 2, 3, 0]] = 1.0
        logits = _rand((5, 4), 2)
        expected = float(ref.softXEnt(torch.tensor(target),
                                      torch.tensor(logits)))
        got = float(L.soft_xent(jnp.asarray(target), jnp.asarray(logits)))
        np.testing.assert_allclose(got, expected, rtol=1e-5)


class TestZeroStubsParity:
    def test_zero_losses(self):
        z = ref.ZEROGlobalContrastiveLoss()(torch.zeros(2, 4),
                                            torch.zeros(2, 4))
        assert float(z) == float(L.ZEROGlobalContrastiveLoss()(
            jnp.zeros((2, 4)), jnp.zeros((2, 4)))) == 0.0
