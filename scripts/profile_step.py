"""Profile the B=32 train step on TPU and print the top HLO ops by
self-time (the attack map for the non-matmul 27% — docs/PERFORMANCE.md).

Usage:  python scripts/profile_step.py [--steps 5] [--tool hlo_stats]
        [--override k=v ...]
Writes the raw xplane trace under /tmp/medmoe_profile/ and prints a
sorted op table via the installed xprof/tensorboard-plugin-profile
converter.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--tool", default="hlo_stats")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--override", action="append", default=[])
    ap.add_argument("--logdir", default="/tmp/medmoe_profile")
    args = ap.parse_args()

    import jax

    from bench import _setup, measure_compute
    from medmoe_tpu.utils.task import enable_compile_cache

    enable_compile_cache()
    _, _, _, state, step, batch, gb, n_chips = _setup(
        batch=args.batch, accum=args.accum, overrides=args.override)
    # warm + steady-state rate for context
    pairs, step_s, state = measure_compute(state, step, batch, gb, n_chips)
    print(f"steady state: {pairs:.1f} pairs/s/chip, "
          f"{step_s * 1e3:.2f} ms/step", file=sys.stderr)

    rng = jax.random.PRNGKey(7)
    jax.profiler.start_trace(args.logdir)
    for _ in range(args.steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
    float(metrics["loss"])
    jax.profiler.stop_trace()

    xplanes = sorted(glob.glob(os.path.join(
        args.logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not xplanes:
        raise SystemExit(f"no xplane.pb under {args.logdir}")
    xplane = xplanes[-1]
    print(f"trace: {xplane}", file=sys.stderr)

    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
        data = raw_to_tool_data.xspace_to_tool_data([xplane], args.tool, {})
    except Exception as exc:
        # the plugin converter is broken in this image (protobuf 5.x vs its
        # generated 3.x descriptors) — fall back to the direct xplane
        # aggregation that scripts/xplane_top_ops.py was written for
        print(f"plugin converter unavailable ({exc!r}); falling back to "
              f"xplane_top_ops", file=sys.stderr)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import xplane_top_ops

        sys.argv = ["xplane_top_ops", xplane,
                    "--steps", str(args.steps), "--top", str(args.top)]
        xplane_top_ops.main()
        return

    payload = data[0] if isinstance(data, tuple) else data
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8", errors="replace")
    out = os.path.join(args.logdir, f"{args.tool}.out")
    with open(out, "w") as f:
        f.write(payload if isinstance(payload, str) else json.dumps(payload))
    print(f"tool output written to {out}", file=sys.stderr)

    # hlo_stats arrives as JSON table rows; print the top self-time ops
    try:
        tbl = json.loads(payload)
        rows = tbl[0]["rows"] if isinstance(tbl, list) else tbl["rows"]
        cols = [c["label"] if isinstance(c, dict) else c
                for c in (tbl[0]["cols"] if isinstance(tbl, list)
                          else tbl["cols"])]
        idx_time = next(i for i, c in enumerate(cols)
                        if "self" in c.lower() and "time" in c.lower())

        def val(r, i):
            c = r["c"][i]
            return c.get("v") if isinstance(c, dict) else c

        rows = sorted(rows, key=lambda r: -(val(r, idx_time) or 0))
        for r in rows[:args.top]:
            print([val(r, i) for i in range(len(cols))])
    except Exception as exc:
        print(f"(raw tool output not auto-tabulated: {exc}; see {out})",
              file=sys.stderr)


if __name__ == "__main__":
    main()
