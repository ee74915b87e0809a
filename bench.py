"""Throughput benchmark: udaiic (headline) train step on real hardware.

Prints ONE JSON line. Headline metric = the bf16 bare train step; the same
line carries the END-TO-END training pipeline number (device-resident data +
fused on-device augmentation + epoch-as-one-scan — what a real epoch costs)
and the fp32 parity variant, so every BENCH_r*.json records the full story:

  {"metric": "slices_per_sec_per_chip", "value": N, "unit": "slices/s",
   "vs_baseline": N, "baseline": {...},
   "e2e": {"value": N, "vs_baseline": N, "augment": "epoch"},
   "e2e_draw": {"value": N, "vs_baseline": N}, "fp32": {"value": N}}

e2e uses Kernel.augment=epoch (per-epoch store pre-augmentation) — the
fastest CAPABILITY-GATED pipeline (3-seed x 2-mode gate PASS,
docs/study_r05/augment_gate.md); e2e_draw is the same pipeline under the
reference's per-draw augmentation semantics.

Workload = the reference's headline step (SURVEY §6): U-Net fwd+bwd over the
concatenated B=24 batch (4 labeled + 10 unlabeled + 10 flipped twins) at
1x224x224, UDA consistency + global IIC MI at Conv5 + displaced local MI at
Up_conv3 (pad 1) / Up_conv2 (pad 3), 5 subheads, 20 clusters, Adam update.
Slices/sec counts all 24 slices per step (same accounting one would apply to
the reference's per-iteration batch).

Baseline: the reference publishes NO throughput numbers (BASELINE.md). We
anchor vs_baseline to an estimated 68 slices/s for the PyTorch 1.6 reference
on its unspecified CUDA-10.2-era GPU (B=24 step ~350 ms: U-Net fwd+bwd +
C=20 conv2d-joint MI losses + per-step python metric reductions). Override
with env BENCH_BASELINE_SLICES_PER_SEC.

Env knobs: BENCH_DTYPE (bfloat16|float32, default bfloat16),
BENCH_STEPS (default 30), BENCH_BACKEND (auto|xla|pallas),
BENCH_BN_DTYPE (default = BENCH_DTYPE), BENCH_FUSED=1 (softmax-in-kernel).

Modes: default = all three numbers in one line. BENCH_E2E=1 = e2e only
(legacy). BENCH_STEP_ONLY=1 = bare step only (quick checks).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE = float(os.environ.get("BENCH_BASELINE_SLICES_PER_SEC", "68.0"))
BASELINE_ESTIMATED = "BENCH_BASELINE_SLICES_PER_SEC" not in os.environ
N_LAB, N_UNLAB, CROP, NUM_CLASSES = 4, 10, 224, 4
FEATURE_NAMES = ("Conv5", "Up_conv3", "Up_conv2")

# v5e per-chip peak (public spec): 197 TFLOP/s bf16 on the MXU.
PEAK_TFLOPS_BF16 = 197.0
# Analytic fallback when XLA cost analysis is unavailable on the tunneled
# backend: U-Net fwd+bwd at B=24x224² ≈90 GFLOP + MI joints/projectors ≈4
# GFLOP (BASELINE.md derivation). cost_analysis is preferred and exact.
ANALYTIC_FLOPS_PER_STEP = 94e9


def _dtype(name):
    import jax.numpy as jnp

    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def _build(dtype_name: str, data_store=None, jit=True):
    """Model/projector/state/step at the flagship config."""
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine.optim import (
        build_optimizer,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine.state import (
        init_train_state,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine.steps import (
        build_train_step,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.models import (
        ProjectorWrapper,
        UNet,
    )

    dtype = _dtype(dtype_name)
    bn_dtype = _dtype(os.environ.get("BENCH_BN_DTYPE", dtype_name))
    backend = os.environ.get("BENCH_BACKEND", "auto")
    # BENCH_STEM=s2d: experimental space-to-depth stem (models/unet.py) —
    # NOT parity; for measuring the conv-floor lever only
    stem = os.environ.get("BENCH_STEM", "conv")
    model = UNet(input_dim=1, num_classes=NUM_CLASSES, dtype=dtype,
                 bn_dtype=bn_dtype, stem=stem)
    projector = ProjectorWrapper(
        feature_names=FEATURE_NAMES, num_clusters=20, num_subheads=5,
        head_types="linear", normalize=False, local_dtype=dtype, local_flat=True,
        local_emit_logits=os.environ.get("BENCH_FUSED", "0") == "1",
    )
    tx = build_optimizer({"name": "Adam", "lr": 1e-7, "weight_decay": 1e-5})
    state = init_train_state(model, tx, (1, CROP, CROP, 1), seed=0,
                             projector=projector,
                             projector_feature_names=FEATURE_NAMES)
    step = build_train_step(
        model, tx, "udaiic", num_classes=NUM_CLASSES,
        feature_names=FEATURE_NAMES, feature_importance=[1.0, 0.5, 0.5],
        projector=projector, uda_criterion="mse", uda_weight=10.0,
        iic_weight=0.1, reg_weight=1.0, paddings=[1, 3], patch_sizes=1024,
        backend=backend, data_store=data_store, crop=CROP, jit=jit,
        # BENCH_GEOMETRY=shear: Pallas 3-shear rotation instead of the
        # composed single gather (ops/augment_device; only affects the
        # device-data e2e path).
        geometry=os.environ.get("BENCH_GEOMETRY", "fused"),
    )
    return state, step


def _step_flops(step, state, batch):
    """FLOPs of one compiled train step from XLA's cost analysis (exact for
    the lowered program), or None when the backend doesn't expose it."""
    import jax

    try:
        lowered = step.lower(state, batch) if hasattr(step, "lower") else \
            jax.jit(step).lower(state, batch)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def bench_step(dtype_name: str, want_flops: bool = False):
    """Bare train step slices/s (device-synthetic batch, no data pipeline).
    With want_flops, returns (slices/s, flops_per_step, source)."""
    import jax
    import jax.numpy as jnp

    steps = int(os.environ.get("BENCH_STEPS", "30"))
    state, step = _build(dtype_name)

    # Generate the batch ON DEVICE: H2D over the axon tunnel is slow, and
    # benchmark inputs must not hide transfer time in the loop.
    @jax.jit
    def make_batch(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "labeled_image": jax.random.uniform(k1, (N_LAB, CROP, CROP, 1), jnp.float32),
            "labeled_target": jax.random.randint(
                k2, (N_LAB, CROP, CROP), 0, NUM_CLASSES, jnp.int32),
            "unlabeled_image": jax.random.uniform(k3, (N_UNLAB, CROP, CROP, 1), jnp.float32),
        }

    batch = make_batch(jax.random.PRNGKey(0))

    def sync(state, metrics):
        # NOTE: block_until_ready does NOT synchronize on the tunneled axon
        # platform; a scalar device->host readback is the only reliable sync.
        # The state chains through every step, so reading one scalar of the
        # final state waits for the whole timed sequence.
        return float(jax.device_get(metrics["total_loss"])) + float(
            jax.device_get(state.step))

    for _ in range(3):
        state, metrics = step(state, batch)
    sync(state, metrics)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    sync(state, metrics)
    elapsed = time.perf_counter() - t0
    rate = (N_LAB + 2 * N_UNLAB) * steps / elapsed
    if not want_flops:
        return rate
    flops = _step_flops(step, state, batch)
    source = "xla" if flops is not None else "analytic"
    return rate, (flops or ANALYTIC_FLOPS_PER_STEP), source


def bench_e2e(dtype_name: str, augment: str | None = None) -> float:
    """End-to-end epoch slices/s: device store + on-device augmentation +
    whole epoch as ONE lax.scan program."""
    import tempfile

    import jax

    from mi_based_regularized_semi_supervised_segmentation_tpu.data import (
        ACDCDataset,
        generate_synthetic_acdc,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.data.device_pipeline import (
        DeviceDataStore,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine.steps import (
        build_augment_fn,
        build_epoch_scan,
        build_epoch_scan_pipelined,
    )

    # Epoch length matches the flagship/reference epoch (config/semi.yaml
    # Trainer.num_batches: 300, /root/reference/config/semi.yaml:49): the
    # e2e number is the cost of a REAL epoch program, and per-epoch work
    # (store pre-augmentation under augment=epoch) amortizes exactly as it
    # does in training.
    steps = int(os.environ.get("BENCH_E2E_STEPS", "300"))
    # BENCH_PIPELINED=1: software-pipelined scan — measured NEUTRAL on v5e
    # (the core serializes ops; see build_epoch_scan_pipelined docstring)
    pipelined = os.environ.get("BENCH_PIPELINED", "0") == "1"
    # BENCH_AUGMENT=epoch (default): per-epoch store pre-augmentation —
    # amortizes the serialized rotation gather across within-epoch redraws
    # of a slice; capability-gated PASS on 3 seeds x 2 modes
    # (docs/study_r05/augment_gate.md). draw = reference per-draw semantics.
    if augment is None:
        augment = os.environ.get("BENCH_AUGMENT", "epoch")
    preaug = augment == "epoch"
    root = tempfile.mkdtemp(prefix="bench_acdc_")
    generate_synthetic_acdc(root, num_train_patients=20, num_val_patients=2,
                            slices_per_patient=10, size=256)
    store = DeviceDataStore(ACDCDataset(root, "train"), pack=True)
    stores = {"labeled": store, "unlabeled": store}
    if preaug:
        from mi_based_regularized_semi_supervised_segmentation_tpu.engine.steps import (
            build_epoch_scan_preaug,
        )

        state, raw = _build(dtype_name, data_store=None, jit=False)
        epoch_fn = build_epoch_scan_preaug(
            raw, stores, steps, crop=CROP,
            geometry=os.environ.get("BENCH_GEOMETRY", "fused"))
    elif pipelined:  # augmentation scheduled alongside the previous step
        state, raw = _build(dtype_name, data_store=None, jit=False)
        epoch_fn = build_epoch_scan_pipelined(
            build_augment_fn(stores, crop=CROP,
                             geometry=os.environ.get("BENCH_GEOMETRY", "fused")),
            raw, steps)
    else:
        state, raw = _build(dtype_name, data_store=stores, jit=False)
        epoch_fn = build_epoch_scan(raw, steps)
    rng = np.random.default_rng(0)

    def batches():
        return {
            "labeled_indices": jax.device_put(
                rng.integers(0, len(store), (steps, N_LAB)).astype(np.int32)),
            "unlabeled_indices": jax.device_put(
                rng.integers(0, len(store), (steps, N_UNLAB)).astype(np.int32)),
        }

    state, stacked = epoch_fn(state, batches())  # compile + warm
    float(jax.device_get(stacked["total_loss"])[-1])
    t0 = time.perf_counter()
    state, stacked = epoch_fn(state, batches())
    float(jax.device_get(stacked["total_loss"])[-1])
    elapsed = time.perf_counter() - t0
    return (N_LAB + 2 * N_UNLAB) * steps / elapsed


def _measured_cpu_ratio():
    """Measured same-silicon torch-vs-JAX anchor (VERDICT r3 item 2): the
    reference's udaiic step and ours, timed on THIS host's CPU by
    scripts/cpu_baseline.py (record committed at docs/study_r04/
    cpu_baseline.json). The reference's GPU is unspecified, so this is the
    only hardware-controlled ratio available; reported alongside the
    estimated GPU denominator, never silently substituted for it."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "docs", "study_r04", "cpu_baseline.json")
    try:
        with open(path) as f:
            rec = json.load(f)
        return {"torch_slices_per_sec": rec["torch"]["slices_per_sec"],
                "jax_cpu_slices_per_sec": rec["jax_cpu"]["slices_per_sec"],
                "jax_over_torch": rec["ratio_jax_over_torch"]}
    except Exception:
        return None


def main() -> None:
    import jax

    # persistent executable cache: repeat bench runs skip the (remote)
    # compiles entirely
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    if os.environ.get("BENCH_E2E"):  # legacy single-number mode
        v = bench_e2e(dtype_name)
        print(json.dumps({
            "metric": "e2e_train_slices_per_sec_per_chip",
            "value": round(v, 2), "unit": "slices/s",
            "vs_baseline": round(v / BASELINE, 2),
            "baseline": {"value": BASELINE, "estimated": BASELINE_ESTIMATED},
        }))
        return

    step_v, flops, flops_source = bench_step(dtype_name, want_flops=True)
    batch = N_LAB + 2 * N_UNLAB
    achieved_tflops = step_v / batch * flops / 1e12
    record = {
        "metric": "slices_per_sec_per_chip",
        "value": round(step_v, 2),
        "unit": "slices/s",
        "vs_baseline": round(step_v / BASELINE, 2),
        # the reference publishes NO throughput numbers (BASELINE.md); the
        # denominator is an estimate — derivation in BASELINE.md. When a
        # measured same-host CPU ratio exists it is reported alongside.
        "baseline": {"value": BASELINE, "estimated": BASELINE_ESTIMATED},
        # MFU accounting (VERDICT r3 item 5): achieved FLOP rate of the
        # whole train step vs the v5e bf16 MXU peak. The flagship U-Net is
        # narrow-channel (16-64ch at 224²) so low %-of-peak is the model's
        # arithmetic shape, not an implementation gap — see README.
        "mfu": {
            "flops_per_step": round(flops / 1e9, 2),
            "flops_unit": "GFLOP",
            "flops_source": flops_source,
            "achieved_tflops": round(achieved_tflops, 2),
            "pct_peak_bf16": round(100.0 * achieved_tflops / PEAK_TFLOPS_BF16, 2),
        },
    }
    measured_ratio = _measured_cpu_ratio()
    if measured_ratio is not None:
        record["baseline"]["measured_cpu_ratio"] = measured_ratio
    if not os.environ.get("BENCH_STEP_ONLY"):
        e2e_v = bench_e2e(dtype_name)  # augment=epoch (gated default)
        record["e2e"] = {"value": round(e2e_v, 2),
                         "vs_baseline": round(e2e_v / BASELINE, 2),
                         "achieved_tflops": round(e2e_v / batch * flops / 1e12, 2),
                         "augment": os.environ.get("BENCH_AUGMENT", "epoch")}
        # reference per-draw augmentation semantics, same pipeline otherwise
        e2e_draw = bench_e2e(dtype_name, augment="draw")
        record["e2e_draw"] = {"value": round(e2e_draw, 2),
                              "vs_baseline": round(e2e_draw / BASELINE, 2)}
        fp32_v = bench_step("float32")
        record["fp32"] = {"value": round(fp32_v, 2),
                          "vs_baseline": round(fp32_v / BASELINE, 2)}
    print(json.dumps(record))


if __name__ == "__main__":
    main()
