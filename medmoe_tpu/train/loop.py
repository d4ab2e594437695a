"""The Trainer: epoch loop, validation, checkpointing, callbacks, logging.

TPU-native replacement for the reference's Lightning Trainer usage
(reference src/train.py:73-101 + configs/trainer/*): one process per host,
SPMD over a jax.sharding.Mesh inside the jitted step. Supports the
reference's trainer knobs: min/max epochs, gradient clip + accumulation,
limit_{train,val,test}_batches, overfit_batches, num_sanity_val_steps,
detect_anomaly (jax.debug_nans), check_val_every_n_epoch, profiler.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from medmoe_tpu.data.prefetch import prefetch
from medmoe_tpu.parallel.mesh import make_mesh
from medmoe_tpu.parallel.sharding import (param_shardings, shard_batch,
                                          shard_stacked_batch)
from medmoe_tpu.train.optim import get_learning_rate, set_learning_rate
from medmoe_tpu.train.state import TrainState


from medmoe_tpu.train.step import build_eval_step, build_train_step
from medmoe_tpu.utils.checkpoint import restore_checkpoint
from medmoe_tpu.utils.logging import get_logger

log = get_logger(__name__)


def _aggregate_metric_buffers(buffers: Dict[str, List]) -> Dict[str, float]:
    """Mean per key over buffered per-step DEVICE scalars.

    Each key's list is stacked ON DEVICE first so the host pull is one
    transfer per key instead of one per step — per-scalar fetches cost a
    full interconnect round-trip each (measured: ~35 ms/step of pure fetch
    latency at 20-step epochs on a tunneled chip)."""
    stacked = {k: jnp.stack(v) if isinstance(v, (list, tuple)) else v
               for k, v in buffers.items()}
    host = jax.device_get(stacked)
    return {k: float(np.mean(a)) for k, a in host.items()}


def _limit(iterable: Iterable, limit: Optional[float],
           steps_per_epoch: Optional[int], what: str = "train") -> Iterable:
    """Cap an epoch's batches. Lightning semantics: an int limit is a batch
    count; a float limit is a fraction of the dataloader (1.0 = all). A
    fractional limit with unknown dataloader length is an ERROR — silently
    truncating to int(0.05)=0 batches (the round-1 bug) disabled val/loss,
    the plateau scheduler, and ModelCheckpoint without a trace."""
    if limit is None:
        yield from iterable
        return
    if isinstance(limit, float) and not limit.is_integer():
        if not steps_per_epoch:
            raise ValueError(
                f"limit_{what}_batches={limit} is a dataset fraction but the "
                f"{what} dataloader length is unknown. Set the datamodule's "
                f"steps_per_epoch (webdataset: provide sizes.json sidecars "
                f"or *_num_samples config), pass trainer.steps_per_epoch, "
                f"or use an integer batch count.")
        limit = max(1, int(limit * steps_per_epoch))
    elif isinstance(limit, float) and limit == 1.0:
        # float 1.0 = the whole dataloader (int 1 = one batch)
        yield from iterable
        return
    limit = int(limit)
    for i, item in enumerate(iterable):
        if i >= limit:
            return
        yield item


def _select_local_devices(device_list, per_host: int):
    """An int trainer.devices counts LOCAL devices (Lightning semantics):
    take the first ``per_host`` of EACH process. A global-prefix slice
    (jax.devices()[:n]) would hand every selected chip to the first
    host(s) and leave later processes with zero addressable devices in
    the mesh."""
    taken: Dict[int, int] = {}
    picked = []
    for d in device_list:
        p = getattr(d, "process_index", 0)
        if taken.get(p, 0) < per_host:
            taken[p] = taken.get(p, 0) + 1
            picked.append(d)
    return picked


class Trainer:
    def __init__(self, min_epochs: int = 1, max_epochs: int = 10,
                 accelerator: str = "tpu", devices: Any = "auto",
                 num_nodes: int = 1,
                 accumulate_grad_batches: int = 1,
                 gradient_clip_val: Optional[float] = None,
                 mesh: Optional[Dict[str, int]] = None,
                 check_val_every_n_epoch: int = 1,
                 limit_train_batches: Optional[float] = None,
                 limit_val_batches: Optional[float] = None,
                 limit_test_batches: Optional[float] = None,
                 num_sanity_val_steps: int = 2,
                 log_every_n_steps: int = 10,
                 deterministic: bool = False,
                 detect_anomaly: bool = False,
                 overfit_batches: int = 0,
                 steps_per_epoch: Optional[int] = None,
                 prefetch_batches: int = 2,
                 profiler: Optional[str] = None,
                 default_root_dir: str = ".",
                 callbacks: Optional[List] = None,
                 loggers: Optional[List] = None,
                 checkpoint_on_signal: bool = True,
                 seed: int = 0):
        self.min_epochs = min_epochs
        self.max_epochs = max_epochs
        self.accumulate_grad_batches = max(int(accumulate_grad_batches), 1)
        self.gradient_clip_val = gradient_clip_val
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.limit_test_batches = limit_test_batches
        self.num_sanity_val_steps = num_sanity_val_steps
        self.log_every_n_steps = log_every_n_steps
        self.detect_anomaly = detect_anomaly
        self.overfit_batches = int(overfit_batches or 0)
        self.steps_per_epoch = steps_per_epoch
        self.prefetch_batches = int(prefetch_batches)
        self.profiler = profiler
        self.default_root_dir = default_root_dir
        self.callbacks = callbacks or []
        self.loggers = loggers or []
        self.seed = seed

        # multi-host (pod) runs: join the distributed runtime BEFORE first
        # device use so jax.devices() spans every host (reference
        # trainer.num_nodes surface, configs/trainer/ddp.yaml:7)
        from medmoe_tpu.parallel.multihost import maybe_initialize

        maybe_initialize(num_nodes)
        self.num_nodes = int(num_nodes or 1)
        if self.num_nodes > 1 and jax.process_count() != self.num_nodes:
            log.warning(
                f"trainer.num_nodes={self.num_nodes} but the runtime has "
                f"{jax.process_count()} processes — using the runtime's")

        device_list = jax.devices()
        if isinstance(devices, int):
            device_list = _select_local_devices(device_list, devices)
        mesh_cfg = mesh or {}
        self.mesh = make_mesh(data=int(mesh_cfg.get("data", -1) or -1),
                              expert=int(mesh_cfg.get("expert", 1) or 1),
                              devices=device_list)
        self.expert_parallel = int(mesh_cfg.get("expert", 1) or 1) > 1

        self.state: Optional[TrainState] = None
        self.module = None
        self.scheduler = None
        self.best_model_path: Optional[str] = None
        self.metrics_history: List[Dict[str, float]] = []
        self.checkpoint_on_signal = checkpoint_on_signal
        self._preempt_requested = False
        self.interrupted = False

    # ------------------------------------------------------------------
    def request_preemption(self) -> None:
        """Checkpoint-and-stop at the next step boundary (the analogue of
        the reference's submitit SIGUSR1@90 + requeue elasticity,
        configs/hydra/launcher/base_submitit_slurm.yaml:25)."""
        self._preempt_requested = True

    def _preempt_agreed(self) -> bool:
        """Cross-host agreement on the preempt flag. Signals land on hosts
        at different times (or on only some), and both the epoch break and
        the COLLECTIVE checkpoint save must be entered by every process at
        the same step — one host breaking early strands the others in the
        step's gradient psum. The allgather is itself a collective, so it
        may only run at step boundaries every process reaches."""
        if jax.process_count() == 1:
            return self._preempt_requested
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.int32(self._preempt_requested))
        agreed = bool(np.asarray(flags).max())
        if agreed:
            self._preempt_requested = True
        return agreed

    def _install_signal_handlers(self) -> None:
        if not self.checkpoint_on_signal:
            return
        import signal

        def handler(signum, frame):
            log.info(f"received signal {signum}: will checkpoint and stop "
                     f"at the next step boundary")
            self.request_preemption()

        try:
            signal.signal(signal.SIGTERM, handler)
            if hasattr(signal, "SIGUSR1"):
                signal.signal(signal.SIGUSR1, handler)
        except ValueError:
            pass    # not the main thread (e.g. under a test runner)

    def _preempt_checkpoint(self, epoch: int) -> str:
        """Save a resumable 'last' checkpoint mid-epoch; the epoch sidecar
        points at the PREVIOUS epoch so resume re-runs the interrupted one
        (data iteration is epoch-seeded, steps are not replayable)."""
        from medmoe_tpu.utils.checkpoint import save_checkpoint

        dirpath = None
        for cb in self.callbacks:
            dirpath = getattr(cb, "dirpath", None) or dirpath
        path = os.path.join(dirpath or os.path.join(self.default_root_dir,
                                                    "checkpoints"), "last")
        save_checkpoint(path, self.state,
                        extra={"epoch": epoch - 1, "preempted": True,
                               **self.checkpoint_extra()})
        log.info(f"preemption checkpoint written to {path}")
        return path

    # ------------------------------------------------------------------
    def checkpoint_extra(self) -> Dict[str, Any]:
        """Loop state persisted alongside the train-state pytree (sidecar
        metadata): plateau-scheduler best/patience so resume keeps the LR
        trajectory of an uninterrupted run."""
        extra: Dict[str, Any] = {}
        if self.scheduler is not None and hasattr(self.scheduler,
                                                  "state_dict"):
            extra["scheduler"] = self.scheduler.state_dict()
        return extra

    def _log(self, metrics: Dict[str, float], step: int) -> None:
        for logger in self.loggers:
            logger.log_metrics(metrics, step)

    def _place_state(self, state: TrainState) -> TrainState:
        shardings = param_shardings(state.params, self.mesh,
                                    self.expert_parallel)
        params = jax.tree_util.tree_map(jax.device_put, state.params,
                                        shardings)
        return state.replace(params=params,
                             opt_state=state.tx.init(params))

    def _stack_accum(self, batches: List[Dict[str, np.ndarray]]
                     ) -> Dict[str, np.ndarray]:
        """Stack an accumulation window [accum, micro, ...]. Device-placed
        micro-batches (the overfit cache) stack with jnp.stack — a device
        op; np.stack would pull every buffer device→host and re-ship the
        stacked copy each step (1.2 GB/step at 8×32 full size)."""
        leaf = jax.tree_util.tree_leaves(batches[0])[0]
        stack = jnp.stack if isinstance(leaf, jax.Array) else np.stack
        return jax.tree_util.tree_map(lambda *xs: stack(xs), *batches)

    # ------------------------------------------------------------------
    def fit(self, module, datamodule, ckpt_path: Optional[str] = None) -> None:
        if self.detect_anomaly:
            # scoped like Lightning's detect_anomaly: restore on exit so one
            # fit() doesn't poison later jax programs in the same process
            prev_debug_nans = jax.config.jax_debug_nans
            jax.config.update("jax_debug_nans", True)
            try:
                return self._fit(module, datamodule, ckpt_path)
            finally:
                jax.config.update("jax_debug_nans", prev_debug_nans)
        return self._fit(module, datamodule, ckpt_path)

    def _fit(self, module, datamodule, ckpt_path: Optional[str] = None) -> None:
        self._install_signal_handlers()
        self.module = module
        rng = jax.random.PRNGKey(self.seed)

        # init from one sample batch
        try:
            init_batch = next(iter(datamodule.train_dataloader(epoch=0)))
        except StopIteration:
            raise ValueError(
                "the train dataloader yielded no batches — check the data "
                "paths (data.train_data_paths / data.data_dir) and that "
                "batch_size does not exceed the dataset size") from None
        params = jax.jit(module.init_params)(rng, init_batch)
        # frozen soft-label tool BERT = the INITIAL text-tower weights,
        # snapshotted before training or checkpoint restore mutates them
        # (reference medmoe_module.py:207-210 separate frozen tool model)
        if hasattr(module, "capture_tool_params"):
            module.capture_tool_params(params)
        tx = module.make_optimizer(gradient_clip_val=self.gradient_clip_val)
        self.state = self._place_state(TrainState.create(params, tx))
        # the frozen tool tree rides into the jitted step next to the
        # mesh-sharded state — replicate it over the SAME mesh, or jit
        # rejects the mix of a committed single-device input and
        # NamedSharding inputs ("incompatible devices")
        if getattr(module, "tool_bert_params", None) is not None:
            repl = jax.sharding.NamedSharding(self.mesh,
                                              jax.sharding.PartitionSpec())
            module.tool_bert_params = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, repl), module.tool_bert_params)
        self.scheduler = module.make_scheduler()

        start_epoch = 0
        if ckpt_path:
            self.state = restore_checkpoint(ckpt_path, self.state)
            # epoch + scheduler sidecar written by save_checkpoint(extra=...)
            meta_path = os.path.abspath(ckpt_path) + ".meta.json"
            if os.path.exists(meta_path):
                import json

                with open(meta_path) as f:
                    meta = json.load(f)
                start_epoch = int(meta.get("epoch", -1)) + 1
                if self.scheduler is not None and meta.get("scheduler"):
                    # restores best/patience so the LR trajectory matches an
                    # uninterrupted run (Lightning resume semantics)
                    self.scheduler.load_state_dict(meta["scheduler"])
            log.info(f"resumed from {ckpt_path} at step "
                     f"{int(self.state.step)}, epoch {start_epoch}")

        step_cache: Dict[int, Any] = {}

        def get_step(accum: int):
            if accum not in step_cache:
                step_cache[accum] = build_train_step(
                    module, mesh=self.mesh, accum_steps=accum)
            return step_cache[accum]

        train_step = get_step(self.accumulate_grad_batches)
        eval_step = build_eval_step(module, mesh=self.mesh)

        from medmoe_tpu.train.state import param_count

        self._log({"model/params_M": param_count(self.state.params) / 1e6},
                  int(self.state.step))
        for cb in self.callbacks:
            cb.on_train_start(self)

        # sanity validation (Lightning runs val before training)
        if self.num_sanity_val_steps:
            for i, batch in enumerate(datamodule.val_dataloader()):
                if i >= self.num_sanity_val_steps:
                    break
                eval_step(self.state.params, shard_batch(batch, self.mesh))

        profile_dir = None
        if self.profiler:
            profile_dir = os.path.join(self.default_root_dir, "profile")
            jax.profiler.start_trace(profile_dir)

        global_step = int(self.state.step)
        stop = False
        overfit_cache: List = []

        for epoch in range(start_epoch, self.max_epochs):
            # dropout RNG derived from (seed, epoch): a resumed run replays
            # the exact RNG stream of an uninterrupted one
            step_rng = jax.random.fold_in(rng, epoch)
            epoch_metrics: Dict[str, List[float]] = {}
            micro_batches: List = []
            t_epoch = time.time()
            n_pairs = 0

            if self.overfit_batches:
                if not overfit_cache:
                    # cache DEVICE-placed batches: overfit replays the same
                    # data every step, so re-shipping it from the host each
                    # time only measures the interconnect. _stack_accum
                    # stacks device-placed windows with jnp.stack (a device
                    # op), so accumulation caches on device too.
                    for batch in datamodule.train_dataloader(epoch=0):
                        overfit_cache.append(shard_batch(batch, self.mesh))
                        if len(overfit_cache) >= self.overfit_batches:
                            break
                train_iter: Iterable = iter(list(overfit_cache))
            else:
                # call the dataloader first: map-style datamodules discover
                # their row counts (steps_per_epoch) at loader-build time
                loader = datamodule.train_dataloader(epoch=epoch)
                steps = self.steps_per_epoch or getattr(
                    datamodule, "steps_per_epoch", None)
                train_iter = _limit(loader, self.limit_train_batches,
                                    steps, "train")
                # background prefetch: host decode/collate (and, when no
                # accumulation stacking happens on the main thread, the
                # host→device transfer too) overlaps device compute
                transform = ((lambda b: shard_batch(b, self.mesh))
                             if self.accumulate_grad_batches == 1 else None)
                train_iter = prefetch(train_iter, self.prefetch_batches,
                                      transform)

            for batch in train_iter:
                micro_batches.append(batch)
                if len(micro_batches) < self.accumulate_grad_batches:
                    continue
                if self.accumulate_grad_batches > 1:
                    device_batch = shard_stacked_batch(
                        self._stack_accum(micro_batches), self.mesh)
                else:
                    device_batch = micro_batches[0]
                micro_batches = []

                step_rng, sub = jax.random.split(step_rng)
                self.state, metrics = train_step(self.state, device_batch,
                                                 sub)
                global_step += 1
                lead = jax.tree_util.tree_leaves(device_batch)[0].shape
                # stacked accum windows are [accum, micro_b, ...]
                n_pairs += int(np.prod(
                    lead[:2] if self.accumulate_grad_batches > 1
                    else lead[:1]))

                # hot loop stays async: metrics are buffered as DEVICE
                # scalars (no blocking float()); the host only syncs every
                # log_every_n_steps and once per epoch for aggregation
                for k, v in metrics.items():
                    epoch_metrics.setdefault(f"train/{k}", []).append(v)
                if global_step % self.log_every_n_steps == 0:
                    host = {f"train/{k}": float(v)
                            for k, v in metrics.items()}
                    host["lr"] = get_learning_rate(self.state.opt_state)
                    host["epoch"] = epoch
                    self._log(host, global_step)
                # preempt check: per-step single-host; at log-boundary
                # steps on pods (the agreement allgather must be entered by
                # every process at the same step — global_step is identical
                # across hosts since _process_split equalizes batch counts)
                if ((jax.process_count() == 1
                     or global_step % self.log_every_n_steps == 0)
                        and self._preempt_agreed()):
                    break

            if self._preempt_agreed():
                self._preempt_checkpoint(epoch)
                self.interrupted = True
                log.info("stopping after preemption checkpoint "
                         f"(epoch {epoch}, step {global_step})")
                break

            # flush leftover micro-batches at epoch end (Lightning steps the
            # optimizer on a partial accumulation window too)
            if micro_batches:
                leftover = len(micro_batches)
                flush_step = get_step(leftover)
                device_batch = (shard_stacked_batch(
                    self._stack_accum(micro_batches), self.mesh)
                    if leftover > 1
                    else shard_batch(micro_batches[0], self.mesh))
                step_rng, sub = jax.random.split(step_rng)
                self.state, metrics = flush_step(self.state, device_batch,
                                                 sub)
                global_step += 1
                lead = jax.tree_util.tree_leaves(device_batch)[0].shape
                n_pairs += int(np.prod(lead[:2] if leftover > 1
                                       else lead[:1]))
                for k, v in metrics.items():
                    epoch_metrics.setdefault(f"train/{k}", []).append(v)

            # one device→host pull for the whole epoch's buffered metrics;
            # this also drains the async dispatch queue, so train_time below
            # is honest wall-clock for the train phase only (val excluded)
            agg = _aggregate_metric_buffers(epoch_metrics)
            train_time = time.time() - t_epoch
            if (epoch + 1) % self.check_val_every_n_epoch == 0:
                val = self.validate(datamodule, eval_step)
                agg.update(val)
            agg["epoch_time_s"] = time.time() - t_epoch
            if train_time > 0 and n_pairs:
                agg["pairs_per_sec"] = n_pairs / train_time
            self.metrics_history.append(agg)
            self._log(agg, global_step)
            log.info(f"epoch {epoch}: " + ", ".join(
                f"{k}={v:.4f}" for k, v in sorted(agg.items())
                if isinstance(v, float)))

            # plateau scheduler on val/loss (reference scheduler interval:
            # epoch, monitor val/loss)
            if self.scheduler is not None and "val/loss" in agg:
                current = get_learning_rate(self.state.opt_state)
                new_lr = self.scheduler.step(agg["val/loss"], current)
                if new_lr != current:
                    log.info(f"ReduceLROnPlateau: lr {current} -> {new_lr}")
                    self.state = self.state.replace(opt_state=set_learning_rate(
                        self.state.opt_state, new_lr))

            for cb in self.callbacks:
                cb.on_epoch_end(self, epoch, agg)
                if cb.should_stop and epoch + 1 >= self.min_epochs:
                    stop = True
            if stop:
                log.info("early stopping triggered")
                break

        if profile_dir:
            jax.profiler.stop_trace()
            log.info(f"profile written to {profile_dir}")

        for cb in self.callbacks:
            cb.on_train_end(self)
            if getattr(cb, "best_path", None):
                self.best_model_path = cb.best_path
        for logger in self.loggers:
            logger.finalize()

    # ------------------------------------------------------------------
    def validate(self, datamodule, eval_step=None) -> Dict[str, float]:
        if eval_step is None:
            eval_step = build_eval_step(self.module, mesh=self.mesh)
        sums: Dict[str, List[float]] = {}
        loader = datamodule.val_dataloader()
        val_iter = _limit(loader, self.limit_val_batches,
                          getattr(datamodule, "val_steps_per_epoch", None),
                          "val")
        for batch in prefetch(val_iter, self.prefetch_batches,
                              lambda b: shard_batch(b, self.mesh)):
            metrics = eval_step(self.state.params, batch)
            for k, v in metrics.items():
                sums.setdefault(f"val/{k}", []).append(v)
        return _aggregate_metric_buffers(sums)

    def test(self, module, datamodule,
             ckpt_path: Optional[str] = None) -> Dict[str, float]:
        self.module = module
        if self.state is None:
            init_batch = next(iter(datamodule.test_dataloader()))
            params = jax.jit(module.init_params)(
                jax.random.PRNGKey(self.seed), init_batch)
            tx = module.make_optimizer()
            self.state = TrainState.create(params, tx)
        if ckpt_path:
            self.state = restore_checkpoint(ckpt_path, self.state)
        eval_step = build_eval_step(module, mesh=self.mesh)
        sums: Dict[str, List[float]] = {}
        loader = datamodule.test_dataloader()
        test_iter = _limit(loader, self.limit_test_batches,
                           getattr(datamodule, "test_steps_per_epoch", None),
                           "test")
        for batch in prefetch(test_iter, self.prefetch_batches,
                              lambda b: shard_batch(b, self.mesh)):
            metrics = eval_step(self.state.params, batch)
            for k, v in metrics.items():
                sums.setdefault(f"test/{k}", []).append(v)
        out = _aggregate_metric_buffers(sums)
        self._log(out, int(self.state.step))
        return out
