"""Run hygiene utilities (reference src/utils/utils.py + rich_utils.py).

``task_wrapper`` — crash hygiene for sweep runs: on exception, write the
traceback to a .log file in the output dir and re-raise; always close
loggers (reference utils.py:125-177).
``extras`` — warnings/tags/config-print toggles (utils.py:94-122).
``print_config_tree`` — ordered config pretty-print, saved to the run dir
(rich_utils.py:17-74; rendered without the rich dependency).
``enforce_tags`` — refuse untagged runs (rich_utils.py:77-99).
``get_metric_value`` — strict metric lookup for hparam sweeps
(utils.py:180-201).
"""

from __future__ import annotations

import functools
import os
import traceback
import warnings
from typing import Any, Callable, Dict, Optional

from medmoe_tpu.config import DotDict, to_dict
from medmoe_tpu.utils.logging import get_logger

log = get_logger(__name__)

_CONFIG_ORDER = ("data", "model", "callbacks", "logger", "trainer", "paths",
                 "extras")


def task_wrapper(task_func: Callable) -> Callable:
    """Decorator: log exceptions to `${output_dir}/exec_error.log`, re-raise,
    and always finalize loggers so a multirun survives one failed job."""

    @functools.wraps(task_func)
    def wrap(cfg: DotDict, *args: Any, **kwargs: Any):
        output_dir = cfg.select("paths.output_dir", ".")
        try:
            return task_func(cfg, *args, **kwargs)
        except Exception:
            os.makedirs(output_dir, exist_ok=True)
            with open(os.path.join(output_dir, "exec_error.log"), "a") as f:
                f.write(traceback.format_exc())
            raise
        finally:
            log.info(f"Output dir: {output_dir}")
            try:
                import wandb

                if wandb.run:
                    wandb.finish()
            except Exception:
                pass

    return wrap


def extras(cfg: DotDict) -> None:
    """Apply the `extras` config toggles before the task starts."""
    ex = cfg.get("extras")
    if not ex:
        return
    if ex.get("ignore_warnings"):
        warnings.filterwarnings("ignore")
    if ex.get("enforce_tags"):
        enforce_tags(cfg)
    if ex.get("compile_cache", False):
        enable_compile_cache(ex.get("compile_cache_dir"))
    if ex.get("print_config"):
        print_config_tree(cfg, save_dir=cfg.select("paths.output_dir"))


def enable_compile_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a run-stable directory.

    Full-size TPU programs compile in minutes; a preemption resume, a sweep
    job with the same shapes, or eval-after-train would otherwise pay that
    again. Must run before the first jit compilation to cover it. Returns
    the directory actually configured, or None if unavailable."""
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "medmoe_tpu", "xla")
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        # the cache singleton binds its directory at first use: re-pointing
        # after another surface already compiled in-process (CLI chained
        # after CLI, or a test after an export) silently keeps the OLD dir
        # unless the singleton is reset
        if jax.config.jax_compilation_cache_dir not in (None, cache_dir):
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default threshold (1s) already excludes trivial programs; make the
        # floor explicit so behavior doesn't drift with jax versions
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception as exc:               # unsupported backend/version
        log.warning(f"persistent compile cache disabled: {exc}")
        return None


def _render(node: Any, indent: int = 0) -> str:
    pad = " " * indent
    lines = []
    if isinstance(node, dict):
        for k, v in node.items():
            if isinstance(v, dict):
                lines.append(f"{pad}{k}:")
                lines.append(_render(v, indent + 2))
            else:
                lines.append(f"{pad}{k}: {v}")
    else:
        lines.append(f"{pad}{node}")
    return "\n".join(lines)


def print_config_tree(cfg: DotDict, save_dir: Optional[str] = None) -> str:
    plain = to_dict(cfg)
    ordered = {k: plain.pop(k) for k in _CONFIG_ORDER if k in plain}
    ordered.update(plain)
    text = "CONFIG\n" + "\n".join(
        f"├── {k}\n{_render(v, 4) if isinstance(v, dict) else '    ' + str(v)}"
        for k, v in ordered.items())
    log.info("\n" + text)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, "config_tree.log"), "w") as f:
            f.write(text)
    return text


def enforce_tags(cfg: DotDict) -> None:
    if not cfg.get("tags"):
        raise ValueError(
            "Specify tags before launching (e.g. tags=[dev]) — "
            "untagged runs are refused (extras.enforce_tags=true)")


def get_metric_value(metric_dict: Dict[str, Any],
                     metric_name: Optional[str]) -> Optional[float]:
    """Strict metric retrieval for Optuna-style sweeps
    (reference utils.py:180-201)."""
    if not metric_name:
        log.info("metric name is None — skipping metric retrieval")
        return None
    if metric_name not in metric_dict:
        raise KeyError(
            f"metric {metric_name!r} not found in {sorted(metric_dict)}; "
            "check the `optimized_metric` name in your hparams_search config")
    value = float(metric_dict[metric_name])
    log.info(f"retrieved metric {metric_name!r} = {value}")
    return value
