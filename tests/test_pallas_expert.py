"""Fused expert-branch kernel tests (interpret mode on CPU; Mosaic compiles
the same kernels on real TPU). Oracle: the XLA gather path of
ExpertBank._gather_one, itself reference-parity-tested in test_moe.py."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from medmoe_tpu.models.moe import ExpertBank, MoE, MoEConfig

CFG = MoEConfig(num_experts=3, hidden_dims=(8, 16), output_dim=32,
                router_input_dim=32, router_hidden_dim=8)


@pytest.fixture()
def data():
    rng = np.random.RandomState(0)
    b = 4
    pyramid = [
        jnp.asarray(rng.randn(b, 16, 8).astype(np.float32)),
        jnp.asarray(rng.randn(b, 4, 16).astype(np.float32)),
    ]
    idx = jnp.asarray(rng.randint(0, CFG.num_experts, size=b)
                      .astype(np.int32))
    bank = ExpertBank(CFG)
    params = bank.init(jax.random.PRNGKey(0), pyramid, idx,
                       method=ExpertBank.apply_gathered)
    return bank, params, pyramid, idx


def _run(bank, params, pyramid, idx, impl):
    os.environ["MEDMOE_EXPERT_IMPL"] = impl
    try:
        if impl == "pallas":
            with pltpu.force_tpu_interpret_mode():
                return bank.apply(params, pyramid, idx,
                                  method=ExpertBank.apply_gathered)
        return bank.apply(params, pyramid, idx,
                          method=ExpertBank.apply_gathered)
    finally:
        os.environ.pop("MEDMOE_EXPERT_IMPL", None)


class TestFusedExpert:
    def test_forward_matches_xla(self, data):
        bank, params, pyramid, idx = data
        out_p = _run(bank, params, pyramid, idx, "pallas")
        out_x = _run(bank, params, pyramid, idx, "xla")
        assert out_p.shape == out_x.shape == (4, 16, 32)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   rtol=2e-2, atol=2e-3)

    def test_gradients_match_xla(self, data):
        bank, params, pyramid, idx = data

        def loss(impl, params, pyramid):
            out = _run(bank, params, pyramid, idx, impl)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(lambda p, py: loss("pallas", p, py),
                          argnums=(0, 1))(params, pyramid)
        gx = jax.grad(lambda p, py: loss("xla", p, py),
                      argnums=(0, 1))(params, pyramid)
        flat_p, _ = jax.tree_util.tree_flatten(gp)
        flat_x, tree_x = jax.tree_util.tree_flatten(gx)
        names = [str(k) for k in
                 jax.tree_util.tree_leaves_with_path(gx)]
        for a, b, name in zip(flat_p, flat_x, names):
            a = np.asarray(a, dtype=np.float32)
            b = np.asarray(b, dtype=np.float32)
            scale = max(np.abs(b).max(), 1e-6)
            err = np.abs(a - b).max() / scale
            assert err < 5e-2, f"{name[:120]}: rel err {err}"

    def test_topk2_combine_path(self, data):
        """apply_gathered's k-slot loop rides the fused kernel per slot."""
        bank, params, pyramid, idx = data
        b = idx.shape[0]
        rng = np.random.RandomState(1)
        idx2 = jnp.asarray(rng.randint(0, CFG.num_experts, size=(b, 2))
                           .astype(np.int32))
        w2 = jnp.asarray(rng.rand(b, 2).astype(np.float32))
        w2 = w2 / w2.sum(axis=1, keepdims=True)

        os.environ["MEDMOE_EXPERT_IMPL"] = "pallas"
        try:
            with pltpu.force_tpu_interpret_mode():
                out_p = bank.apply(params, pyramid, idx2, w2,
                                   method=ExpertBank.apply_gathered)
        finally:
            os.environ.pop("MEDMOE_EXPERT_IMPL", None)
        os.environ["MEDMOE_EXPERT_IMPL"] = "xla"
        try:
            out_x = bank.apply(params, pyramid, idx2, w2,
                               method=ExpertBank.apply_gathered)
        finally:
            os.environ.pop("MEDMOE_EXPERT_IMPL", None)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   rtol=2e-2, atol=2e-3)

    def test_gate_rejects_non_integer_ratios(self):
        from medmoe_tpu.ops.pallas.expert_fusion import \
            expert_fusion_supported

        assert expert_fusion_supported([16, 4], 16)
        assert not expert_fusion_supported([16, 3], 16)


class TestShardMapPath:
    """The kernels run per-shard over the data axis under an ambient mesh
    (parallel/spmd.py) instead of being GSPMD-replicated black boxes."""

    def test_expert_kernel_sharded_matches_unsharded(self, data, mesh8):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from medmoe_tpu.parallel.spmd import spmd_context

        bank, params, pyramid, idx = data
        # B=4 over 4-way data axis
        out_ref = _run(bank, params, pyramid, idx, "xla")

        os.environ["MEDMOE_EXPERT_IMPL"] = "pallas"
        try:
            with pltpu.force_tpu_interpret_mode():
                def fn(params, pyramid, idx):
                    with spmd_context(mesh8):
                        return bank.apply(params, pyramid, idx,
                                          method=ExpertBank.apply_gathered)

                shard = NamedSharding(mesh8, P("data"))
                jitted = jax.jit(fn, in_shardings=(
                    None,
                    [shard for _ in pyramid],
                    shard))
                out = jitted(params, pyramid, idx)
        finally:
            os.environ.pop("MEDMOE_EXPERT_IMPL", None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                                   rtol=2e-2, atol=2e-3)

    def test_expert_kernel_sharded_grads(self, data, mesh8):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from medmoe_tpu.parallel.spmd import spmd_context

        bank, params, pyramid, idx = data

        def loss(params, pyramid):
            with spmd_context(mesh8):
                out = bank.apply(params, pyramid, idx,
                                 method=ExpertBank.apply_gathered)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        gx = jax.grad(lambda p: loss(p, pyramid))(params)

        os.environ["MEDMOE_EXPERT_IMPL"] = "pallas"
        try:
            with pltpu.force_tpu_interpret_mode():
                shard = NamedSharding(mesh8, P("data"))
                jitted = jax.jit(jax.grad(lambda p, py: loss(p, py)),
                                 in_shardings=(None,
                                               [shard for _ in pyramid]))
                gp = jitted(params, pyramid)
        finally:
            os.environ.pop("MEDMOE_EXPERT_IMPL", None)
        for a, b in zip(jax.tree_util.tree_leaves(gp),
                        jax.tree_util.tree_leaves(gx)):
            a = np.asarray(a, dtype=np.float32)
            b = np.asarray(b, dtype=np.float32)
            err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
            assert err < 5e-2

    def test_gloria_kernel_sharded_matches_unsharded(self, mesh8):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from medmoe_tpu.ops.pallas.gloria_attention import (
            _sim_xla, gloria_similarity_pallas)
        from medmoe_tpu.parallel.spmd import spmd_context

        rng = np.random.RandomState(0)
        b, d, h, w, t = 8, 32, 4, 4, 9
        img = jnp.asarray(rng.randn(b, d, h, w).astype(np.float32))
        words = jnp.asarray(rng.randn(b, d, t).astype(np.float32))
        cap = jnp.asarray(rng.randint(2, t + 1, size=b).astype(np.int32))
        ref = _sim_xla(img, words, cap, 4.0, 5.0, 10.0)

        with pltpu.force_tpu_interpret_mode():
            def fn(img, words, cap):
                with spmd_context(mesh8):
                    return gloria_similarity_pallas(img, words, cap)

            shard = NamedSharding(mesh8, P("data"))
            jitted = jax.jit(fn, in_shardings=(shard, shard, shard))
            out = jitted(img, words, cap)
        rel = np.abs(np.asarray(out) - np.asarray(ref)) \
            / np.maximum(np.abs(np.asarray(ref)), 1.0)
        assert rel.max() < 0.08


class TestDtypeGate:
    def test_fused_path_requires_bf16(self, monkeypatch):
        """The fused kernels compute in bf16 by design; a float32 model
        dtype (the numerics-debug setting) must fall back to the XLA
        einsum path even on TPU."""
        import jax.numpy as jnp

        from medmoe_tpu.ops.pallas import expert_fusion as ef

        monkeypatch.setattr(ef, "_resolve_impl", lambda: "pallas")
        assert ef.use_fused_expert([64, 16], 64, dtype=jnp.bfloat16)
        assert not ef.use_fused_expert([64, 16], 64, dtype=jnp.float32)
        # unspecified dtype keeps the old behavior (platform decides)
        assert ef.use_fused_expert([64, 16], 64)
