"""MoE block: mode equivalence (gather ≡ dense), interpolation parity with
torch, routing/selection semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from medmoe_tpu.models.moe import (MoE, MoEConfig, ExpertBank,
                                   linear_interp_matrix)


def _pyramid(rng, b=3, dims=(4, 8), lens=(16, 4)):
    return [jnp.asarray(rng.randn(b, p, d).astype(np.float32))
            for p, d in zip(lens, dims)]


class TestInterpolation:
    def test_matches_torch_linear(self):
        import torch
        import torch.nn.functional as F

        for src, dst in [(49, 3136), (196, 3136), (784, 3136), (4, 16),
                         (16, 16)]:
            x = np.random.RandomState(0).randn(2, 8, src).astype(np.float32)
            expected = F.interpolate(torch.from_numpy(x), size=dst,
                                     mode="linear",
                                     align_corners=False).numpy()
            mat = linear_interp_matrix(src, dst)
            got = np.einsum("bdp,pq->bdq", x, mat)
            np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


class TestModeEquivalence:
    def test_gather_equals_dense(self):
        rng = np.random.RandomState(0)
        cfg_g = MoEConfig(num_experts=3, hidden_dims=(4, 8), output_dim=8,
                          router_input_dim=8, mode="gather",
                          dtype=jnp.float32)
        cfg_d = cfg_g.replace(mode="dense")
        pyr = _pyramid(rng)
        router_feat = jnp.asarray(rng.randn(3, 8).astype(np.float32))

        moe_g = MoE(cfg_g)
        variables = moe_g.init(jax.random.PRNGKey(0), pyr, router_feat)
        out_g = moe_g.apply(variables, pyr, router_feat)
        out_d = MoE(cfg_d).apply(variables, pyr, router_feat)

        for a, b in zip(out_g, out_d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_gradients_match(self):
        rng = np.random.RandomState(1)
        pyr = _pyramid(rng)
        router_feat = jnp.asarray(rng.randn(3, 8).astype(np.float32))
        cfg_g = MoEConfig(num_experts=3, hidden_dims=(4, 8), output_dim=8,
                          router_input_dim=8, mode="gather",
                          dtype=jnp.float32)
        variables = MoE(cfg_g).init(jax.random.PRNGKey(0), pyr, router_feat)

        def loss(v, mode):
            g, l, r = MoE(cfg_g.replace(mode=mode)).apply(v, pyr, router_feat)
            return jnp.sum(g ** 2) + jnp.sum(l ** 2)

        g_gather = jax.grad(loss)(variables, "gather")
        g_dense = jax.grad(loss)(variables, "dense")
        flat_g = jax.tree_util.tree_leaves(g_gather)
        flat_d = jax.tree_util.tree_leaves(g_dense)
        for a, b in zip(flat_g, flat_d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_unselected_experts_zero_grad(self):
        rng = np.random.RandomState(2)
        pyr = _pyramid(rng, b=2)
        cfg = MoEConfig(num_experts=4, hidden_dims=(4, 8), output_dim=8,
                        router_input_dim=8, mode="gather", dtype=jnp.float32)
        router_feat = jnp.asarray(rng.randn(2, 8).astype(np.float32))
        moe = MoE(cfg)
        variables = moe.init(jax.random.PRNGKey(0), pyr, router_feat)
        _, _, probs = moe.apply(variables, pyr, router_feat)
        selected = set(np.argmax(np.asarray(probs), -1).tolist())

        def loss(v):
            g, l, r = moe.apply(v, pyr, router_feat)
            return jnp.sum(g ** 2)

        grads = jax.grad(loss)(variables)
        proj_w0 = np.asarray(grads["params"]["experts"]["proj_w0"])
        for k in range(4):
            if k not in selected:
                assert np.allclose(proj_w0[k], 0.0), f"expert {k} got grad"
            else:
                assert np.abs(proj_w0[k]).max() > 0, f"expert {k} no grad"


class TestDispatch:
    def test_make_dispatch_plan(self):
        from medmoe_tpu.models.moe import make_dispatch

        idx = jnp.asarray([0, 1, 0, 0, 2, 1])
        dispatch, valid, kept = make_dispatch(idx, num_experts=3, capacity=2)
        d = np.asarray(dispatch)
        v = np.asarray(valid)
        # expert 0 got samples 0, 2 (sample 3 dropped: capacity 2)
        assert d[0].tolist() == [0, 2] and v[0].all()
        assert d[1].tolist()[:2] == [1, 5] and v[1].all()
        assert v[2].tolist() == [True, False]
        assert np.asarray(kept).tolist() == [True, True, True, False, True,
                                             True]

    def test_topk_matches_gather_when_no_drop(self):
        """With capacity ≥ B the dispatch path is exact parity."""
        rng = np.random.RandomState(3)
        pyr = _pyramid(rng, b=4)
        router_feat = jnp.asarray(rng.randn(4, 8).astype(np.float32))
        cfg = MoEConfig(num_experts=3, hidden_dims=(4, 8), output_dim=8,
                        router_input_dim=8, mode="gather",
                        capacity_factor=3.0, dtype=jnp.float32)
        moe = MoE(cfg)
        variables = moe.init(jax.random.PRNGKey(0), pyr, router_feat)
        out_g = moe.apply(variables, pyr, router_feat)
        out_t = MoE(cfg.replace(mode="topk")).apply(variables, pyr,
                                                    router_feat)
        for a, b in zip(out_g, out_t):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_topk_drops_overflow(self):
        """With capacity 1 per expert, overflow samples produce zero
        output."""
        from medmoe_tpu.models.moe import ExpertBank, make_dispatch

        rng = np.random.RandomState(4)
        cfg = MoEConfig(num_experts=2, hidden_dims=(4, 8), output_dim=8,
                        router_input_dim=8, mode="topk", dtype=jnp.float32)
        pyr = _pyramid(rng, b=4)
        bank = ExpertBank(cfg)
        idx = jnp.asarray([0, 0, 0, 1])      # 3 samples → expert 0
        variables = bank.init(jax.random.PRNGKey(0), pyr, idx,
                              method=ExpertBank.apply_dispatched,
                              capacity_factor=0.5)   # capacity 1
        out = bank.apply(variables, pyr, idx, capacity_factor=0.5,
                         method=ExpertBank.apply_dispatched)
        out = np.asarray(out)
        assert np.abs(out[0]).max() > 0        # first to expert 0: kept
        assert np.allclose(out[1], 0.0)        # overflow: dropped
        assert np.allclose(out[2], 0.0)
        assert np.abs(out[3]).max() > 0        # expert 1: kept


class TestShapes:
    def test_output_shapes(self):
        rng = np.random.RandomState(0)
        cfg = MoEConfig(num_experts=2, hidden_dims=(4, 8), output_dim=8,
                        router_input_dim=8, mode="gather", dtype=jnp.float32)
        pyr = _pyramid(rng)
        router_feat = jnp.asarray(rng.randn(3, 8).astype(np.float32))
        moe = MoE(cfg)
        variables = moe.init(jax.random.PRNGKey(0), pyr, router_feat)
        g, l, r = moe.apply(variables, pyr, router_feat)
        assert g.shape == (3, 8)
        assert l.shape == (3, 8, 4, 4)       # sqrt(16) = 4
        assert r.shape == (3, 2)
        np.testing.assert_allclose(np.asarray(r).sum(-1), 1.0, rtol=1e-5)
