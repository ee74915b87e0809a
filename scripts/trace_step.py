"""Capture a jax.profiler trace of the udaiic (or given) step and print the
top ops by self-time from the trace events — exact per-op accounting.

Usage: python scripts/trace_step.py [mode] (default udaiic)
Writes the trace under /tmp/jax_trace and prints a duration-sorted table.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mi_based_regularized_semi_supervised_segmentation_tpu.engine.optim import build_optimizer
from mi_based_regularized_semi_supervised_segmentation_tpu.engine.state import init_train_state
from mi_based_regularized_semi_supervised_segmentation_tpu.engine.steps import build_train_step
from mi_based_regularized_semi_supervised_segmentation_tpu.models import ProjectorWrapper, UNet


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "udaiic"
    dtype = jnp.bfloat16
    crop, num_classes = 224, 4
    key = jax.random.PRNGKey(0)
    batch = {
        "labeled_image": jax.random.uniform(key, (4, crop, crop, 1), jnp.float32),
        "labeled_target": jax.random.randint(key, (4, crop, crop), 0, num_classes, jnp.int32),
        "unlabeled_image": jax.random.uniform(key, (10, crop, crop, 1), jnp.float32),
    }
    feats = ("Conv5", "Up_conv3", "Up_conv2") if mode in ("iic", "udaiic") else ()
    model = UNet(input_dim=1, num_classes=num_classes, dtype=dtype, bn_dtype=dtype)
    projector = None
    if feats:
        projector = ProjectorWrapper(
            feature_names=feats, num_clusters=20, num_subheads=5,
            head_types="linear", normalize=False, local_dtype=dtype, local_flat=True)
    tx = build_optimizer({"name": "Adam", "lr": 1e-7, "weight_decay": 1e-5})
    state = init_train_state(model, tx, (1, crop, crop, 1), seed=0,
                             projector=projector,
                             projector_feature_names=feats or None)
    step = build_train_step(
        model, tx, mode, num_classes=num_classes,
        feature_names=feats, feature_importance=[1.0, 0.5, 0.5][:len(feats)] or [1.0],
        projector=projector, uda_criterion="mse", uda_weight=10.0,
        iic_weight=0.1, reg_weight=1.0, paddings=[1, 3], patch_sizes=1024)

    state, m = step(state, batch)  # compile
    float(jax.device_get(m["total_loss"]))

    trace_dir = "/tmp/jax_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        state, m = step(state, batch)
    float(jax.device_get(m["total_loss"]))
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace file found under", trace_dir)
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur", 0) > 0]
    # keep only device-lane events (TensorFlow Op / XLA Op names), drop host
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()}
    agg = {}
    total = 0
    for e in events:
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e["name"].split(".")[0]
        agg[name] = agg.get(name, 0) + e["dur"]
        total += e["dur"]
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    print(f"mode={mode}  total device event time {total/3/1e3:.2f} ms/step over 3 steps")
    for name, dur in rows:
        print(f"  {dur/3/1e3:9.3f} ms/step  {100*dur/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
