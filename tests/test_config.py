"""Config composition tests: the surface must match the reference's hydra
behavior (reference configs/train.yaml + experiment/pretraining_medmoe.yaml)."""

import pytest

from medmoe_tpu.config import compose, DotDict


def test_compose_pretraining_experiment():
    cfg = compose("train", ["experiment=pretraining_medmoe"])
    # experiment overlay pins hparams (reference configs/experiment/pretraining_medmoe.yaml)
    assert cfg.seed == 12345
    assert cfg.trainer.max_epochs == 10
    assert cfg.trainer.gradient_clip_val == 0.25
    assert cfg.trainer.accumulate_grad_batches == 10
    assert cfg.data.batch_size == 256
    assert cfg.model.optimizer.lr == 0.00005
    # base model config (reference configs/model/med-moe.yaml)
    assert cfg.model.model.text.max_length == 25
    assert cfg.model.model.vision.num_experts == 6
    assert cfg.model.model.text.last_n_layers == 4
    # loss weights (reference configs/model/med-moe_pretraining.yaml:21-23)
    assert cfg.model.loss.global_loss_weight == 0.5
    assert cfg.model.loss.local_loss_weight == 0.5
    assert cfg.model.loss.classifier_loss_weight == 2.0
    assert cfg.model.loss.temp1 == 4.0
    assert cfg.model.loss.temp2 == 5.0
    assert cfg.model.loss.temp3 == 10.0


def test_group_override():
    cfg = compose("train", ["experiment=pretraining_medmoe", "data=synthetic"])
    assert "SyntheticDataModule" in cfg.data._target_
    # the experiment overlay's inline data.batch_size=256 still merges on top
    # of the swapped group (hydra semantics)
    assert cfg.data.batch_size == 256
    assert cfg.data.num_samples == 256  # synthetic's own field survives


def test_trainer_group_variants_compose():
    """Every trainer= override a reference user might type (the reference
    README's documented launch uses `trainer=ddp trainer.devices=8`,
    SURVEY 3.2) composes onto the SPMD mesh trainer."""
    for option, mesh_expert in [("ddp", 1), ("ddp_sim", 1), ("tpu", 1),
                                ("ep", 2), ("cpu", 1)]:
        cfg = compose("train", ["experiment=pretraining_medmoe",
                                f"trainer={option}", "trainer.devices=8"])
        assert cfg.trainer._target_.endswith("Trainer"), option
        assert cfg.trainer.devices == 8, option
        assert cfg.trainer.mesh.expert == mesh_expert, option


def test_value_overrides():
    cfg = compose(
        "train",
        [
            "experiment=pretraining_medmoe",
            "trainer.max_epochs=3",
            "data.batch_size=16",
            "model.model.vision.moe_mode=ep",
            "+extras.new_key=7",
        ],
    )
    assert cfg.trainer.max_epochs == 3
    assert cfg.data.batch_size == 16
    assert cfg.model.model.vision.moe_mode == "ep"
    assert cfg.extras.new_key == 7


def test_debug_overlay():
    cfg = compose("train", ["experiment=pretraining_medmoe", "debug=fdr"])
    assert cfg.trainer.limit_train_batches == 1
    assert cfg.trainer.detect_anomaly is True
    assert cfg.task_name == "debug"


def test_interpolation():
    cfg = compose("train", ["experiment=pretraining_medmoe"])
    # ${paths.output_dir} resolves through two levels of interpolation
    assert "${" not in cfg.trainer.default_root_dir
    assert cfg.trainer.default_root_dir.endswith("logs/train/runs")


def test_now_resolver(monkeypatch):
    """${now:FMT} — hydra's run-dir templating (reference
    configs/hydra/default.yaml:10-13). Off in the default paths config
    (SPMD collective saves need identical dirs on every process); opt-in
    via override/local overlay, pinnable with MEDMOE_RUN_STAMP."""
    ov = ("paths.output_dir="
          "${paths.log_dir}/${task_name}/runs/${now:%Y-%m-%d}_${now:%H-%M-%S}")
    monkeypatch.setenv("MEDMOE_RUN_STAMP", "1787300000")  # pinned stamp
    cfg = compose("train", ["experiment=pretraining_medmoe", ov])
    import datetime

    expect = datetime.datetime.fromtimestamp(1787300000)
    suffix = expect.strftime("logs/train/runs/%Y-%m-%d_%H-%M-%S")
    assert cfg.paths.output_dir.endswith(suffix)
    # every occurrence in one compose resolves to the same instant, and the
    # pinned stamp makes a second compose byte-identical (multi-process)
    cfg2 = compose("train", ["experiment=pretraining_medmoe", ov])
    assert cfg2.paths.output_dir == cfg.paths.output_dir
    # downstream interpolation consumers pick the templated dir up
    assert cfg.trainer.default_root_dir == cfg.paths.output_dir

    # unpinned: still a valid strftime expansion, no literal '${'
    monkeypatch.delenv("MEDMOE_RUN_STAMP")
    cfg3 = compose("train", ["experiment=pretraining_medmoe", ov])
    assert "${" not in cfg3.paths.output_dir
    assert "_" in cfg3.paths.output_dir.rsplit("/", 1)[-1]


def test_logger_null():
    cfg = compose("train", ["experiment=pretraining_medmoe", "logger=null"])
    assert cfg.get("logger") is None


def test_eval_zs_config():
    cfg = compose("eval_zs", [])
    assert cfg.eval.protocol == "zero_shot"
    assert "CheXpertDataModule" in cfg.data._target_
    assert cfg.eval.prompt_template == "this is a photo of {}"


def test_baseline_experiments_compose():
    """The BASELINE.json config surface: every experiment must compose."""
    zs = compose("train", ["experiment=zero_shot_dense"])
    assert zs.model.model.vision.use_moe is False
    assert zs.model.loss.classifier_loss_weight == 0.0

    moe = compose("train", ["experiment=moe_single_modality"])
    assert moe.model.model.vision.num_experts == 4
    assert moe.model.model.vision.moe_mode == "topk"
    assert moe.model.model.vision.router_top_k == 2

    ep = compose("train", ["experiment=ep_full_mix"])
    assert ep.trainer.mesh.expert == 2
    assert ep.model.model.vision.moe_mode == "ep"


def test_logger_backends_compose():
    for backend in ("csv", "tensorboard", "wandb", "comet", "mlflow",
                    "neptune", "aim", "many_loggers"):
        cfg = compose("train", ["experiment=pretraining_medmoe",
                                f"logger={backend}"])
        assert cfg.logger is not None


def test_dotdict_basic():
    d = DotDict({"a": {"b": [1, {"c": 2}]}})
    assert d.a.b[1].c == 2
    d.set_dotted("a.x.y", 5)
    assert d.a.x.y == 5
    assert d.select("a.b") is not None
    assert d.select("nope.nope", "fallback") == "fallback"


def test_instantiate_partial():
    from medmoe_tpu.utils import instantiate

    cfg = DotDict({"_target_": "builtins.dict", "_partial_": True, "a": 1})
    fn = instantiate(cfg)
    assert fn(b=2) == {"a": 1, "b": 2}


def test_callbacks_group_compose():
    """Every reference callbacks override must compose
    (reference configs/callbacks/*.yaml; VERDICT r2 missing #3)."""
    # default composes the full stack with training overrides pinned
    cfg = compose("train", ["experiment=pretraining_medmoe"])
    cbs = cfg.callbacks
    assert cbs.model_checkpoint.monitor == "val/loss"
    assert cbs.model_checkpoint.save_last is True
    assert cbs.early_stopping.monitor == "val/loss"
    assert cbs.model_summary.max_depth == -1
    assert cbs.rich_progress_bar._target_.endswith("ProgressBar")

    for option in ("model_checkpoint", "model_summary",
                   "rich_progress_bar", "none"):
        cfg = compose("train", ["experiment=pretraining_medmoe",
                                f"callbacks={option}"])
        if option == "none":
            assert not cfg.get("callbacks")
        else:
            assert option in cfg.callbacks, option
            assert len(cfg.callbacks) == 1

    # early_stopping alone leaves monitor '???' (hydra MISSING semantics):
    # composition succeeds, instantiation refuses
    from medmoe_tpu.utils import instantiate_dict

    cfg = compose("train", ["experiment=pretraining_medmoe",
                            "callbacks=early_stopping"])
    assert cfg.callbacks.early_stopping.monitor == "???"
    with pytest.raises(ValueError, match="missing mandatory"):
        instantiate_dict(cfg.callbacks)
    # ...and a CLI override fills it in
    cfg = compose("train", ["experiment=pretraining_medmoe",
                            "callbacks=early_stopping",
                            "callbacks.early_stopping.monitor=val/loss"])
    (cb,) = instantiate_dict(cfg.callbacks)
    assert cb.monitor == "val/loss"


def test_callbacks_default_instantiates():
    from medmoe_tpu.utils import instantiate_dict

    cfg = compose("train", ["experiment=pretraining_medmoe"])
    cbs = instantiate_dict(cfg.callbacks)
    names = {type(cb).__name__ for cb in cbs}
    assert names == {"ModelCheckpoint", "EarlyStopping", "ModelSummary",
                     "ProgressBar"}


def test_persistent_compile_cache(tmp_path):
    """extras.compile_cache points JAX's persistent compilation cache at a
    run-stable dir (a preemption resume / sweep job with the same shapes
    skips the minutes-long full-size recompile)."""
    import jax
    import numpy as np

    from medmoe_tpu.utils.task import enable_compile_cache

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        out = enable_compile_cache(str(tmp_path))
        assert out == str(tmp_path)
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
        # floor to 0 so this tiny program is actually written
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        f = jax.jit(lambda x: (x @ x.T).sum() * 3.0)
        float(f(np.ones((32, 32), np.float32)))
        assert len(list(tmp_path.iterdir())) >= 1
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)

    # the default extras config enables it
    cfg = compose("train", ["experiment=pretraining_medmoe"])
    assert cfg.extras.compile_cache is True
    assert cfg.extras.compile_cache_dir is None


def test_model_checkpoint_null_paths_get_defaults():
    """The standalone group ships dirpath/filename as null (reference
    model_checkpoint.yaml); instantiation must fall back to usable defaults
    instead of dying at first epoch end on None.format / join(None, ...)."""
    from medmoe_tpu.utils import instantiate_dict

    cfg = compose("train", ["experiment=pretraining_medmoe",
                            "callbacks=model_checkpoint"])
    assert cfg.callbacks.model_checkpoint.dirpath is None
    (cb,) = instantiate_dict(cfg.callbacks)
    assert cb.filename.format(epoch=3) == "epoch_003"

    # and a full save cycle resolves the null dirpath under the trainer's
    # root dir, not the process cwd
    import os
    import tempfile

    import jax.numpy as jnp
    import optax

    from medmoe_tpu.train.state import TrainState

    class _FakeTrainer:
        state = TrainState.create({"w": jnp.ones((2,))}, optax.sgd(1e-3))

        def checkpoint_extra(self):
            return {}

    with tempfile.TemporaryDirectory() as root:
        trainer = _FakeTrainer()
        trainer.default_root_dir = root
        cb.on_epoch_end(trainer, epoch=0, metrics={"val/loss": 1.0})
        # commit the async saves before the tempdir goes away (Trainer.fit
        # does this in on_train_end; manual callers must too)
        cb.on_train_end(trainer)
        assert cb.best_path == os.path.join(root, "checkpoints", "epoch_000")
        assert os.path.isdir(cb.best_path)


def test_malformed_override_rejected():
    """A bare token ('--help', or a typo'd 'experiment foo') must error,
    not silently become a junk key and start a default training run."""
    for bad in ("--help", "experiment", "foo bar"):
        with pytest.raises(ValueError, match="malformed override"):
            compose("train", [bad])


def test_cli_help_renders_groups(capsys):
    from medmoe_tpu.cli._help import maybe_print_help

    assert maybe_print_help(["--help"], "prog", "desc", ["ex1"]) is True
    out = capsys.readouterr().out
    assert "experiment=" in out and "pretraining_medmoe" in out
    assert "trainer=" in out and "ddp" in out
    assert maybe_print_help(["a=b"], "prog", "desc", []) is False


class TestYaml12Floats:
    def test_scientific_notation_overrides_are_floats(self):
        from medmoe_tpu.config import compose

        cfg = compose("train", ["experiment=pretraining_medmoe",
                                "model.optimizer.lr=1e-5"])
        assert cfg.model.optimizer.lr == 1e-5
        assert isinstance(cfg.model.optimizer.lr, float)

    def test_sweep_bounds_load_as_floats(self):
        from medmoe_tpu.config import compose

        cfg = compose("train", ["experiment=pretraining_medmoe",
                                "hparams_search=medmoe_tpe"])
        low = cfg.hparams_search.params["model.optimizer.lr"]["low"]
        assert low == 1e-6 and isinstance(low, float)

    def test_ints_stay_ints(self):
        from medmoe_tpu.config.loader import _parse_value

        assert _parse_value("123") == 123
        assert isinstance(_parse_value("123"), int)
        assert _parse_value("epoch_001") == "epoch_001"


class TestMissingInterpolationErrors:
    def test_embedded_missing_ref_raises(self):
        import pytest

        from medmoe_tpu.config.loader import DotDict, resolve_interpolations

        cfg = DotDict({"paths": {"root_dir": "/x"},
                       "out": "${paths.rot_dir}/runs"})     # typo'd ref
        with pytest.raises(KeyError, match="rot_dir"):
            resolve_interpolations(cfg)

    def test_full_match_missing_ref_raises(self):
        import pytest

        from medmoe_tpu.config.loader import DotDict, resolve_interpolations

        cfg = DotDict({"a": "${nope.key}"})
        with pytest.raises(KeyError, match="nope.key"):
            resolve_interpolations(cfg)
