"""Throughput benchmark: udaiic (headline) train step on real hardware.

Prints ONE JSON line:
  {"metric": "slices_per_sec_per_chip", "value": N, "unit": "slices/s", "vs_baseline": N}

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
BENCH_BN_DTYPE (default = BENCH_DTYPE).

BENCH_E2E=1 benches the full TRAINING pipeline instead of the bare step:
device-resident synthetic ACDC data, fused on-device augmentation, whole
epoch as one lax.scan program — i.e., what a real training epoch costs.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main_e2e() -> None:
    """End-to-end epoch throughput: device store + augmentation + scan."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from mi_based_regularized_semi_supervised_segmentation_tpu.data import (
        ACDCDataset,
        generate_synthetic_acdc,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.data.device_pipeline import (
        DeviceDataStore,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine.optim import (
        build_optimizer,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine.state import (
        init_train_state,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine.steps import (
        build_epoch_scan,
        build_train_step,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.models import (
        ProjectorWrapper,
        UNet,
    )

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        os.environ.get("BENCH_DTYPE", "bfloat16")
    ]
    steps = int(os.environ.get("BENCH_STEPS", "100"))
    n_lab, n_unlab, crop, num_classes = 4, 10, 224, 4
    feature_names = ("Conv5", "Up_conv3", "Up_conv2")

    root = tempfile.mkdtemp(prefix="bench_acdc_")
    generate_synthetic_acdc(root, num_train_patients=20, num_val_patients=2,
                            slices_per_patient=10, size=256)
    store = DeviceDataStore(ACDCDataset(root, "train"))

    model = UNet(input_dim=1, num_classes=num_classes, dtype=dtype, bn_dtype=dtype)
    projector = ProjectorWrapper(
        feature_names=feature_names, num_clusters=20, num_subheads=5,
        local_dtype=dtype, local_flat=True,
        local_emit_logits=os.environ.get("BENCH_FUSED", "0") == "1",
    )
    tx = build_optimizer({"name": "Adam", "lr": 1e-7, "weight_decay": 1e-5})
    state = init_train_state(model, tx, (1, crop, crop, 1), seed=0,
                             projector=projector,
                             projector_feature_names=feature_names)
    raw = build_train_step(
        model, tx, "udaiic", num_classes=num_classes,
        feature_names=feature_names, feature_importance=[1.0, 0.5, 0.5],
        projector=projector, uda_criterion="mse", uda_weight=10.0,
        iic_weight=0.1, reg_weight=1.0, paddings=[1, 3], patch_sizes=1024,
        data_store={"labeled": store, "unlabeled": store}, crop=crop, jit=False,
    )
    epoch_fn = build_epoch_scan(raw, steps)
    rng = np.random.default_rng(0)

    def batches():
        return {
            "labeled_indices": jax.device_put(
                rng.integers(0, len(store), (steps, n_lab)).astype(np.int32)),
            "unlabeled_indices": jax.device_put(
                rng.integers(0, len(store), (steps, n_unlab)).astype(np.int32)),
        }

    state, stacked = epoch_fn(state, batches())  # compile + warm
    float(jax.device_get(stacked["total_loss"])[-1])
    t0 = time.perf_counter()
    state, stacked = epoch_fn(state, batches())
    float(jax.device_get(stacked["total_loss"])[-1])
    elapsed = time.perf_counter() - t0
    slices_per_sec = (n_lab + 2 * n_unlab) * steps / elapsed
    baseline = float(os.environ.get("BENCH_BASELINE_SLICES_PER_SEC", "68.0"))
    print(json.dumps({
        "metric": "e2e_train_slices_per_sec_per_chip",
        "value": round(slices_per_sec, 2),
        "unit": "slices/s",
        "vs_baseline": round(slices_per_sec / baseline, 2),
        # the reference publishes NO throughput numbers (BASELINE.md); the
        # denominator is an estimate — derivation in BASELINE.md
        "baseline": {"value": baseline, "estimated": "BENCH_BASELINE_SLICES_PER_SEC" not in os.environ},
    }))


def main() -> None:
    import jax
    import jax.numpy as jnp

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

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        os.environ.get("BENCH_DTYPE", "bfloat16")
    ]
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    backend = os.environ.get("BENCH_BACKEND", "auto")
    crop, num_classes = 224, 4
    n_lab, n_unlab = 4, 10
    feature_names = ("Conv5", "Up_conv3", "Up_conv2")

    bn_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        os.environ.get("BENCH_BN_DTYPE", os.environ.get("BENCH_DTYPE", "bfloat16"))
    ]
    model = UNet(input_dim=1, num_classes=num_classes, dtype=dtype, bn_dtype=bn_dtype)
    projector = ProjectorWrapper(
        feature_names=feature_names, num_clusters=20, num_subheads=5,
        head_types="linear", normalize=False, local_dtype=dtype, local_flat=True,
        local_emit_logits=os.environ.get("BENCH_FUSED", "0") == "1",
    )
    tx = build_optimizer({"name": "Adam", "lr": 1e-7, "weight_decay": 1e-5})
    state = init_train_state(
        model, tx, (1, crop, crop, 1), seed=0,
        projector=projector, projector_feature_names=feature_names,
    )
    step = build_train_step(
        model, tx, "udaiic",
        num_classes=num_classes,
        feature_names=feature_names,
        feature_importance=[1.0, 0.5, 0.5],
        projector=projector,
        uda_criterion="mse", uda_weight=10.0, iic_weight=0.1, reg_weight=1.0,
        paddings=[1, 3], patch_sizes=1024,
        backend=backend,
    )

    # Generate the batch ON DEVICE: H2D over the axon tunnel is slow, and
    # benchmark inputs must not hide transfer time in the loop.
    @jax.jit
    def make_batch(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "labeled_image": jax.random.uniform(k1, (n_lab, crop, crop, 1), jnp.float32),
            "labeled_target": jax.random.randint(
                k2, (n_lab, crop, crop), 0, num_classes, jnp.int32
            ),
            "unlabeled_image": jax.random.uniform(k3, (n_unlab, crop, crop, 1), jnp.float32),
        }

    batch = make_batch(jax.random.PRNGKey(0))

    def sync(state, metrics):
        # NOTE: block_until_ready does NOT synchronize on the tunneled axon
        # platform; a scalar device->host readback is the only reliable sync.
        # The state chains through every step, so reading one scalar of the
        # final state waits for the whole timed sequence.
        return float(jax.device_get(metrics["total_loss"])) + float(
            jax.device_get(state.step)
        )

    # warmup / compile
    for _ in range(3):
        state, metrics = step(state, batch)
    sync(state, metrics)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    sync(state, metrics)
    elapsed = time.perf_counter() - t0

    slices_per_sec = (n_lab + 2 * n_unlab) * steps / elapsed
    baseline = float(os.environ.get("BENCH_BASELINE_SLICES_PER_SEC", "68.0"))
    print(json.dumps({
        "metric": "slices_per_sec_per_chip",
        "value": round(slices_per_sec, 2),
        "unit": "slices/s",
        "vs_baseline": round(slices_per_sec / baseline, 2),
        "baseline": {"value": baseline, "estimated": "BENCH_BASELINE_SLICES_PER_SEC" not in os.environ},
    }))


if __name__ == "__main__":
    if os.environ.get("BENCH_E2E"):
        main_e2e()
    else:
        main()
