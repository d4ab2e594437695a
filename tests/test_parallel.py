"""Multi-device SPMD tests on the 8-device CPU mesh: DP/EP equivalence,
sharding placement, soft-label path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import tiny_batch, tiny_module, tiny_vision, tiny_text, tiny_loss

# 8-device mesh train steps compile for minutes on the 1-core CPU host
pytestmark = pytest.mark.slow


def _assert_step_equivalent(m1, m2, state1, state2):
    """Sharded and replicated executions of one train step must agree.

    Loss components and the gradient global norm are compared tightly —
    they are well-conditioned contractions of everything. Post-Adam params
    get an Adam-step-bounded atol on top: the mesh psum's different
    reduction ORDER perturbs roundoff-level gradients, and Adam normalizes
    any nonzero gradient to an lr-sized update, so a sign flip on a
    ~1e-8 gradient legitimately moves a parameter by up to 2·lr = 1e-4
    without any math difference."""
    for key in ("loss", "l_loss", "g_loss", "c_loss"):
        np.testing.assert_allclose(float(m1[key]), float(m2[key]),
                                   rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1.2e-4)


class TestExpertParallel:
    def test_ep_sharding_matches_replicated(self):
        """The same train step under (data=4, expert=2) EP sharding must
        produce the same loss/grads as single-device execution — EP is a
        layout change, not a math change."""
        from medmoe_tpu.config import DotDict
        from medmoe_tpu.parallel.mesh import make_mesh
        from medmoe_tpu.parallel.sharding import param_shardings
        from medmoe_tpu.train.module import MedMoEPretrainingModule
        from medmoe_tpu.train.state import TrainState
        from medmoe_tpu.train.step import build_train_step

        mod = MedMoEPretrainingModule(
            model=DotDict(dict(vision=tiny_vision(moe_mode="ep",
                                                  num_experts=4),
                               text=tiny_text())),
            loss=tiny_loss())
        batch, _ = tiny_batch(batch_size=8)
        params = jax.jit(mod.init_params)(jax.random.PRNGKey(0), batch)
        tx = mod.make_optimizer(gradient_clip_val=0.25)

        # single device
        state1 = TrainState.create(params, tx)
        step1 = build_train_step(mod, accum_steps=1, donate=False)
        state1, m1 = step1(state1, batch, jax.random.PRNGKey(1))

        # 4x2 mesh with expert-sharded bank
        mesh = make_mesh(data=4, expert=2)
        shardings = param_shardings(params, mesh, expert_parallel=True)
        placed = jax.tree_util.tree_map(jax.device_put, params, shardings)
        state2 = TrainState.create(placed, tx)
        step2 = build_train_step(mod, mesh=mesh, accum_steps=1, donate=False)
        state2, m2 = step2(state2, batch, jax.random.PRNGKey(1))

        _assert_step_equivalent(m1, m2, state1, state2)

    def test_ep_top2_matches_replicated(self):
        """Top-2 capacity dispatch sharded over the expert axis ≡ the same
        dispatch unsharded (BASELINE config 2: top-2 router under EP)."""
        from medmoe_tpu.config import DotDict
        from medmoe_tpu.parallel.mesh import make_mesh
        from medmoe_tpu.parallel.sharding import param_shardings
        from medmoe_tpu.train.module import MedMoEPretrainingModule
        from medmoe_tpu.train.state import TrainState
        from medmoe_tpu.train.step import build_train_step

        mod = MedMoEPretrainingModule(
            model=DotDict(dict(vision=tiny_vision(moe_mode="ep",
                                                  num_experts=4,
                                                  router_top_k=2,
                                                  capacity_factor=2.0),
                               text=tiny_text())),
            loss=tiny_loss())
        batch, _ = tiny_batch(batch_size=8)
        params = jax.jit(mod.init_params)(jax.random.PRNGKey(0), batch)
        tx = mod.make_optimizer(gradient_clip_val=0.25)

        state1 = TrainState.create(params, tx)
        step1 = build_train_step(mod, accum_steps=1, donate=False)
        state1, m1 = step1(state1, batch, jax.random.PRNGKey(1))

        mesh = make_mesh(data=4, expert=2)
        shardings = param_shardings(params, mesh, expert_parallel=True)
        placed = jax.tree_util.tree_map(jax.device_put, params, shardings)
        state2 = TrainState.create(placed, tx)
        step2 = build_train_step(mod, mesh=mesh, accum_steps=1, donate=False)
        state2, m2 = step2(state2, batch, jax.random.PRNGKey(1))

        _assert_step_equivalent(m1, m2, state1, state2)

    def test_expert_params_actually_sharded(self):
        from medmoe_tpu.config import DotDict
        from medmoe_tpu.parallel.mesh import make_mesh
        from medmoe_tpu.parallel.sharding import param_shardings
        from medmoe_tpu.train.module import MedMoEPretrainingModule

        mod = MedMoEPretrainingModule(
            model=DotDict(dict(vision=tiny_vision(moe_mode="ep",
                                                  num_experts=4),
                               text=tiny_text())),
            loss=tiny_loss())
        batch, _ = tiny_batch(batch_size=4)
        params = jax.jit(mod.init_params)(jax.random.PRNGKey(0), batch)
        mesh = make_mesh(data=4, expert=2)
        shardings = param_shardings(params, mesh, expert_parallel=True)
        expert_spec = shardings["image_encoder"]["swin_moe"]["moe"][
            "experts"]["proj_w0"].spec
        assert expert_spec[0] == "expert"
        swin_spec = jax.tree_util.tree_leaves(
            shardings["image_encoder"]["swin_moe"]["swin"])[0].spec
        assert swin_spec == jax.sharding.PartitionSpec()


class TestSoftLabelPath:
    def test_soft_losses_finite(self):
        from medmoe_tpu.config import DotDict
        from medmoe_tpu.train.module import MedMoEPretrainingModule

        mod = MedMoEPretrainingModule(
            model=DotDict(dict(vision=tiny_vision(), text=tiny_text())),
            loss=tiny_loss(
                soft_label=True, threshold0=0.9, threshold1=0.8,
                global_loss={"_target_":
                             "medmoe_tpu.ops.losses."
                             "SoftGLORIAGlobalContrastiveLoss"},
                local_loss={"_target_":
                            "medmoe_tpu.ops.losses."
                            "SoftGLORIALocalContrastiveLoss"}))
        batch, _ = tiny_batch(batch_size=4)
        params = jax.jit(mod.init_params)(jax.random.PRNGKey(0), batch)
        loss, metrics = jax.jit(mod.loss_fn)(params, batch)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        grads = jax.jit(jax.grad(lambda p: mod.loss_fn(p, batch)[0]))(params)
        assert all(np.all(np.isfinite(g))
                   for g in jax.tree_util.tree_leaves(grads))
