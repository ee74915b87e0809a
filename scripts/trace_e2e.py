"""Profile the END-TO-END pipeline on real TPU (VERDICT r4 item 1): capture a
jax.profiler trace of (a) one device-data epoch-as-one-scan program and
(b) the val/test eval scans, and print duration-sorted per-op tables that
attribute device time to model convs vs MI joints vs augmentation gather vs
BN/glue — the committed artifact behind docs/study_r05/e2e_profile.md.

Usage:
    python scripts/trace_e2e.py [--steps 20] [--dtype bfloat16] [--out docs/study_r05/e2e_profile_raw.json]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CROP, NUM_CLASSES, N_LAB, N_UNLAB = 224, 4, 4, 10


def collect_device_ops(trace_dir, n_steps):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return None, 0.0
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()}
    agg = {}
    total = 0
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or e.get("dur", 0) <= 0:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e["name"].split(".")[0]
        agg[name] = agg.get(name, 0) + e["dur"]
        total += e["dur"]
    per_step = {k: v / n_steps / 1e3 for k, v in agg.items()}  # ms/step
    return per_step, total / n_steps / 1e3


def classify(name: str) -> str:
    n = name.lower()
    if "gather" in n or "dynamic-slice" in n and "fusion" not in n:
        return "augment-gather"
    if "conv" in n:
        return "model-convs"
    if "dot" in n or "einsum" in n:
        return "matmuls (heads/joints/flips)"
    if "scatter" in n:
        return "scatter (grads)"
    if "reduce" in n or "norm" in n:
        return "reductions/BN"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "layout/copies"
    if "fusion" in n:
        return "fusions (elementwise glue)"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="docs/study_r05/e2e_profile_raw.json")
    args = ap.parse_args()

    import tempfile

    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench  # repo-root bench.py provides _build at the flagship config

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mi_based_regularized_semi_supervised_segmentation_tpu.data import (
        ACDCDataset,
        generate_synthetic_acdc,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.data.device_pipeline import (
        DeviceDataStore,
        DevicePatientEvalLoader,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine.steps import (
        build_epoch_scan,
        build_eval_scan,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.models import UNet

    steps = args.steps
    root = tempfile.mkdtemp(prefix="trace_acdc_")
    generate_synthetic_acdc(root, num_train_patients=20, num_val_patients=4,
                            slices_per_patient=10, size=256)
    store = DeviceDataStore(ACDCDataset(root, "train"), pack=True)
    stores = {"labeled": store, "unlabeled": store}
    state, raw = bench._build(args.dtype, data_store=stores, jit=False)
    epoch_fn = build_epoch_scan(raw, steps)
    rng = np.random.default_rng(0)

    def batches():
        return {
            "labeled_indices": jax.device_put(
                rng.integers(0, len(store), (steps, N_LAB)).astype(np.int32)),
            "unlabeled_indices": jax.device_put(
                rng.integers(0, len(store), (steps, N_UNLAB)).astype(np.int32)),
        }

    # ---- epoch scan ------------------------------------------------------
    state, stacked = epoch_fn(state, batches())  # compile + warm
    float(jax.device_get(stacked["total_loss"])[-1])
    trace_dir = "/tmp/jax_trace_e2e_train"
    os.system(f"rm -rf {trace_dir}")
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    state, stacked = epoch_fn(state, batches())
    float(jax.device_get(stacked["total_loss"])[-1])
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0
    train_ops, train_total = collect_device_ops(trace_dir, steps)
    print(f"\n=== epoch scan: {steps} steps, wall {wall:.2f}s "
          f"({(N_LAB + 2 * N_UNLAB) * steps / wall:.1f} slices/s), device "
          f"{train_total:.2f} ms/step ===")
    for name, ms in sorted(train_ops.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms:8.3f} ms/step  {100 * ms / train_total:5.1f}%  "
              f"[{classify(name):28s}] {name[:90]}")
    groups = {}
    for name, ms in train_ops.items():
        groups[classify(name)] = groups.get(classify(name), 0.0) + ms
    print("  -- by group --")
    for g, ms in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:8.3f} ms/step  {100 * ms / train_total:5.1f}%  {g}")

    # ---- eval scan (fp32 eval forward over padded patients) --------------
    val_store = DeviceDataStore(ACDCDataset(root, "val"))
    val_loader = DevicePatientEvalLoader(val_store)
    model = UNet(input_dim=1, num_classes=NUM_CLASSES,
                 dtype=bench._dtype(args.dtype), bn_dtype=bench._dtype(args.dtype))
    eval_scan = build_eval_scan(model, num_classes=NUM_CLASSES,
                                data_store=val_store, crop=CROP)
    indices = np.stack([b["indices"] for b in val_loader])
    masks = np.stack([b["mask"] for b in val_loader])
    idx_d, mask_d = jax.device_put(indices), jax.device_put(masks)
    out = eval_scan(state.params, state.batch_stats, idx_d, mask_d)
    float(jax.device_get(out["loss"])[-1])
    trace_dir = "/tmp/jax_trace_e2e_eval"
    os.system(f"rm -rf {trace_dir}")
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    out = eval_scan(state.params, state.batch_stats, idx_d, mask_d)
    float(jax.device_get(out["loss"])[-1])
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0
    n_pat = indices.shape[0]
    eval_ops, eval_total = collect_device_ops(trace_dir, n_pat)
    n_slices = int(masks.sum())
    print(f"\n=== eval scan: {n_pat} patients ({n_slices} slices, padded "
          f"{indices.shape[1]}/patient), wall {wall:.2f}s, device "
          f"{eval_total:.2f} ms/patient ===")
    for name, ms in sorted(eval_ops.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {ms:8.3f} ms/patient  {100 * ms / eval_total:5.1f}%  {name[:90]}")

    out_path = args.out
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump({"steps": steps, "dtype": args.dtype,
                   "train_ms_per_step": train_ops,
                   "train_total_ms_per_step": train_total,
                   "train_groups_ms_per_step": groups,
                   "eval_ms_per_patient": eval_ops,
                   "eval_total_ms_per_patient": eval_total,
                   "eval_patients": n_pat, "eval_slices": n_slices}, f, indent=1)
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
