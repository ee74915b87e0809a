"""Aggregate a jax.profiler TPU trace into per-op attribution tables.

Leaf device events carry `source` (file:line), `tf_op` (jit name stack) and
`hlo_category`; container events (whole-program spans like `jit_step(...)`)
carry none of these and are excluded. Aggregations offered:

- by `source` file:line        -> which line of OUR code owns the time
- by `hlo_category`            -> convolution / custom-call / fusion / copy ...
- top leaf ops by self time    -> with long_name shape detail

Usage:
    python scripts/trace_report.py /tmp/jax_trace --steps 3 [--json out.json]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
from collections import defaultdict


def load_device_events(trace_dir: str):
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    assert files, f"no trace under {trace_dir}"
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    dev_pids = {e["pid"] for e in tr["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in (e["args"].get("name") or "")}
    out = []
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or e.get("dur", 0) <= 0:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        args = e.get("args") or {}
        if "hlo_category" not in args:
            continue  # container span (whole program / while), not a leaf op
        out.append(e)
    return out


def report(trace_dir: str, steps: int, top: int = 20):
    evs = load_device_events(trace_dir)
    total = sum(e["dur"] for e in evs) / steps / 1e3

    def agg(keyfn):
        d = defaultdict(float)
        for e in evs:
            d[keyfn(e)] += e["dur"] / steps / 1e3
        return sorted(d.items(), key=lambda kv: -kv[1])

    by_src = agg(lambda e: (e["args"].get("source") or "?").replace(
        "/root/repo/mi_based_regularized_semi_supervised_segmentation_tpu/", ""))
    by_cat = agg(lambda e: e["args"].get("hlo_category", "?"))
    by_op = agg(lambda e: e["name"])

    lines = [f"leaf device time: {total:.2f} ms/step (over {steps} steps)"]
    lines.append("\n-- by hlo_category --")
    for k, ms in by_cat:
        lines.append(f"  {ms:8.3f} ms/step  {100 * ms / total:5.1f}%  {k}")
    lines.append(f"\n-- by source line (top {top}) --")
    for k, ms in by_src[:top]:
        lines.append(f"  {ms:8.3f} ms/step  {100 * ms / total:5.1f}%  {k}")
    lines.append(f"\n-- top leaf ops (top {top}) --")
    name_detail = {}
    for e in evs:
        name_detail.setdefault(e["name"], (e["args"].get("long_name") or "")[:100])
    for k, ms in by_op[:top]:
        lines.append(f"  {ms:8.3f} ms/step  {100 * ms / total:5.1f}%  {k}  {name_detail[k]}")
    return "\n".join(lines), {
        "total_ms_per_step": total,
        "by_category": dict(by_cat),
        "by_source": dict(by_src),
        "by_op": dict(by_op[: 3 * top]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    text, data = report(args.trace_dir, args.steps, args.top)
    print(text)
    if args.json:
        import os

        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(data, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
