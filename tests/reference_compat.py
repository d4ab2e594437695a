"""Import the REFERENCE's torch loss code (read-only, /root/reference) for
direct numerical parity testing against medmoe_tpu.

The reference's import chain drags in hydra/lightning/rich/torchvision etc.
that aren't installed here and aren't needed to evaluate the pure loss math —
missing modules are auto-stubbed with permissive placeholders. Nothing from
the reference is copied; its module is loaded from disk and executed as-is.
"""

from __future__ import annotations

import sys
import types
from typing import Any, Optional

REFERENCE_ROOT = "/root/reference"


class _AnyAttr(types.ModuleType):
    """Module stub whose every attribute is a permissive placeholder."""

    def __getattr__(self, name: str) -> Any:
        if name.startswith("__"):
            raise AttributeError(name)
        if name and name[0].isupper():
            return type(name, (), {"__init__": lambda self, *a, **k: None})
        return lambda *a, **k: None


def _stub(name: str) -> types.ModuleType:
    import importlib.machinery

    mod = _AnyAttr(name)
    mod.__path__ = []          # behave as a package
    # a real ModuleSpec keeps importlib.util.find_spec happy (transformers
    # probes optional deps like torchvision at import time)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None,
                                                  is_package=True)
    sys.modules[name] = mod
    return mod


def load_reference_losses(max_stubs: int = 40) -> Optional[types.ModuleType]:
    """Returns the reference's ``src.losses`` module, or None if it cannot
    be imported (reference tree absent)."""
    import os

    if not os.path.isdir(REFERENCE_ROOT):
        return None
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # decorators must be identity, not placeholders
    def identity(f=None, *a, **k):
        return f if callable(f) else (lambda g: g)

    for _ in range(max_stubs):
        try:
            import src.losses as losses  # noqa: PLC0415

            return losses
        except ModuleNotFoundError as e:
            missing = e.name
            if missing is None or missing.startswith("src"):
                return None
            _stub(missing)
            # fix decorator-shaped attrs commonly used at import time
            if missing == "lightning_utilities.core.rank_zero":
                sys.modules[missing].rank_zero_only = identity
                sys.modules[missing].rank_prefixed_message = \
                    lambda m, r: m
            if missing == "lightning.pytorch.utilities":
                sys.modules[missing].rank_zero_only = identity
        except ImportError as e:
            # "cannot import name X from Y" — give Y the attribute
            name = getattr(e, "name", None)
            if name and name in sys.modules and \
                    isinstance(sys.modules[name], _AnyAttr):
                return None    # already permissive, real failure
            if name:
                _stub(name)
            else:
                return None
        except Exception:
            return None
    return None
