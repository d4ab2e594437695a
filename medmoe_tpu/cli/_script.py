"""Console-script adapters for pyproject ``[project.scripts]``.

setuptools generates ``sys.exit(fn())`` wrappers around entry points. The
CLI ``main()`` functions return metrics dicts / metric values (they double
as the library surface, and ``python -m`` invocation ignores the return),
but ``sys.exit(<non-empty dict>)`` prints the dict to stderr and exits
with status 1 — every successful ``medmoe-eval ... && next`` would stop
the chain. These adapters map any non-int return to status 0 and pass
real int statuses (e.g. serve's) through.
"""

from __future__ import annotations

from typing import Any


def _as_status(ret: Any) -> int:
    return ret if isinstance(ret, int) else 0


def train() -> int:
    from medmoe_tpu.cli.train import main

    return _as_status(main())


def evaluate() -> int:
    from medmoe_tpu.cli.eval import main

    return _as_status(main())


def eval_zs() -> int:
    from medmoe_tpu.cli.eval_zs import main

    return _as_status(main())


def serve() -> int:
    from medmoe_tpu.cli.serve import main

    return _as_status(main())


def export() -> int:
    from medmoe_tpu.cli.export import main

    return _as_status(main())
