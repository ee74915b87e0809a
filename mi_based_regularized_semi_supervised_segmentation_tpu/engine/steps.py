"""Jitted train / eval steps — the hot loop, one XLA program per mode.

This is the TPU-native re-expression of the reference epochers
(/root/reference/semi_seg/epocher.py:110-323). One call does what a reference
batch iteration did: sample flip booleans, build the twin view, ONE U-Net
forward over the concatenated [labeled, unlabeled, unlabeled_tf] batch (BN
statistics over the mixed batch — load-bearing for semi-supervised BN, SURVEY
§7), split logits, re-apply the same flips to the unlabeled logits to form the
transform-equivariant pair, supervised KL(CE) + mode-specific regularization,
grads, optimizer update — all fused by XLA, no host round-trips.

Mode semantics (semi_seg/trainer.py:24-214):
- partial: reg = 0
- uda:     reg_weight * consistency(softmax(f(Tx)), softmax(T f(x)).detach())
- iic:     reg_weight * weighted-avg over feature positions of subhead-mean
           MI losses (global IIDLoss at encoder taps, displaced local MI at
           decoder taps, with the same flips re-applied to decoder features)
- udaiic:  uda_weight * uda + iic_weight * iic (outer reg_weight 1.0)
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet import ENCODER_NAMES
from ..ops.flips import apply_flips, sample_flip_mask
from ..ops.iic import iid_loss
from ..ops.iic_local import (
    iid_segmentation_loss_fused_logits,
    iid_segmentation_small_patch_loss_flat,
    iid_segmentation_small_patch_loss_subheads,
)
from ..ops.losses import kl_div, mse_consistency
from ..utils.general import class2one_hot
from .state import TrainState


def _as_list(value, n: int) -> List:
    if isinstance(value, (list, tuple)):
        assert len(value) == n, (value, n)
        return list(value)
    return [value] * n


def dice_stats(pred_labels: jnp.ndarray, target: jnp.ndarray, num_classes: int,
               mask: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample per-class intersection / union sums ([B, C] each).
    pred_labels/target: [B, H, W] ints; mask: [B] sample validity."""
    pred_oh = class2one_hot(pred_labels, num_classes, class_axis=-1)  # [B,H,W,C]
    tgt_oh = class2one_hot(target, num_classes, class_axis=-1)
    inter = jnp.sum(pred_oh * tgt_oh, axis=(1, 2))
    union = jnp.sum(pred_oh, axis=(1, 2)) + jnp.sum(tgt_oh, axis=(1, 2))
    if mask is not None:
        inter = inter * mask[:, None]
        union = union * mask[:, None]
    return inter, union


def _iic_regularization(
    projector,
    proj_params,
    features: Dict[str, jnp.ndarray],
    flip_mask: jnp.ndarray,
    n_labeled: int,
    n_unlabeled: int,
    feature_names: Sequence[str],
    paddings: Sequence[int],
    patch_sizes: Sequence[int],
    backend: str,
    row_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Per-position MI losses (subhead-averaged). Returns ({name: loss}, …).

    Pairing per position (semi_seg/epocher.py:249-276): slice the last
    2*B_u feature rows into (plain, tf). Encoder positions use (plain, tf)
    directly (global pooling is flip-invariant); decoder positions re-apply
    the flips to the plain features. Both go through the position's cluster
    head; per-subhead IIC losses are averaged.

    row_mask: optional [B_u] validity over the unlabeled rows (pad-and-mask
    batch sharding). Pad rows' cluster probabilities are zeroed before the
    joints; every joint downstream normalizes by its own sum, so the losses
    equal the unpadded computation exactly."""
    dec_idx = 0
    half1: Dict[str, jnp.ndarray] = {}
    half2: Dict[str, jnp.ndarray] = {}
    is_encoder: Dict[str, bool] = {}
    loss_cfg: Dict[str, Tuple[int, int]] = {}
    for name in feature_names:
        feat = features[name]
        plain = feat[n_labeled:n_labeled + n_unlabeled]
        tf = feat[n_labeled + n_unlabeled:]
        if name in ENCODER_NAMES:
            is_encoder[name] = True
            half1[name] = plain
            half2[name] = tf
        else:
            is_encoder[name] = False
            pad = paddings[dec_idx]
            loss_cfg[name] = (pad, patch_sizes[dec_idx])
            dec_idx += 1
            # pre-pad decoder features spatially so the cluster-head output
            # is born on the padded canvas the displaced-MI kernel needs —
            # its flatten becomes a free reshape (no big pad copies). The
            # border probs are zero-masked after softmax (or in-kernel on the
            # fused path), reproducing the conv zero-padding semantics.
            # Heads are applied PER HALF: concat->head->split would copy the
            # [2Bu, Hp, Wp, 128] head outputs twice (~1 GB/step at Up_conv2).
            spad = ((0, 0), (pad, pad), (pad, pad), (0, 0))
            half1[name] = jnp.pad(apply_flips(plain, flip_mask), spad)
            half2[name] = jnp.pad(tf, spad)

    # one shared-parameter head application per view
    probs1 = projector.apply({"params": proj_params}, half1)
    probs2 = projector.apply({"params": proj_params}, half2)

    losses: Dict[str, jnp.ndarray] = {}
    for name in feature_names:
        p1, p2 = probs1[name], probs2[name]
        if row_mask is not None:
            # fused path carries logits (unmaskable); trainers disable it in
            # padded mode — guard here so the invariant can't silently break
            assert not (not is_encoder[name]
                        and getattr(projector, "local_emit_logits", False)), \
                "pad-and-mask batches need materialized probs (fused off)"
            shape = (-1,) + (1,) * (p1.ndim - 1)
            m = jax.lax.stop_gradient(row_mask.astype(p1.dtype).reshape(shape))
            p1 = p1 * m
            p2 = p2 * m
        if is_encoder[name]:
            # [B, S, K] -> per-subhead global IID loss, averaged
            per_subhead = jax.vmap(
                lambda a, b: iid_loss(a, b)[0], in_axes=(1, 1)
            )(p1, p2)
            losses[name] = jnp.mean(per_subhead)
        else:
            padding, patch = loss_cfg[name]
            Hp, Wp = p1.shape[1], p1.shape[2]
            if getattr(projector, "local_emit_logits", False):
                # fused hot path: p1/p2 carry lane-padded LOGITS; softmax,
                # border masking, and the joint all happen inside the Pallas
                # kernel (probabilities never materialize in HBM)
                assert patch >= Hp - 2 * padding and patch >= Wp - 2 * padding, \
                    "fused path covers the single-tile (headline) config"
                S, K = projector.head_shape(name)
                losses[name] = iid_segmentation_loss_fused_logits(
                    p1, p2, S, K, padding=padding,
                )
                continue
            mask_shape = (
                (1, Hp, Wp, 1) if p1.ndim == 4 else (1, Hp, Wp, 1, 1)
            )
            valid = jnp.pad(
                jnp.ones((Hp - 2 * padding, Wp - 2 * padding), p1.dtype),
                ((padding, padding), (padding, padding)),
            ).reshape(mask_shape)
            p1 = p1 * valid
            p2 = p2 * valid
            if p1.ndim == 4:  # flat [.., S*K] layout (local_flat heads)
                S, K = projector.head_shape(name)
                losses[name] = iid_segmentation_small_patch_loss_flat(
                    p1, p2, S, K, padding=padding, patch_size=patch,
                    backend=backend, pre_padded=True,
                )
            else:
                losses[name] = iid_segmentation_small_patch_loss_subheads(
                    p1, p2, padding=padding, patch_size=patch, backend=backend,
                    pre_padded=True,
                )
    return losses


def build_train_step(
    model,
    tx,
    mode: str,
    *,
    num_classes: int,
    feature_names: Sequence[str] = (),
    feature_importance: Sequence[float] = (),
    projector=None,
    uda_criterion: str = "mse",
    uda_weight: float = 0.0,
    iic_weight: float = 0.0,
    reg_weight: float = 0.0,
    paddings=1,
    patch_sizes=1024,
    flip_threshold: float = 0.8,
    backend: str = "auto",
    data_store=None,
    crop: int = 224,
    geometry: str = "fused",
    ema_alpha: float = 0.999,
    ema_weight_decay: float = 1e-6,
    n_labeled_valid: Optional[int] = None,
    n_unlabeled_valid: Optional[int] = None,
    jit: bool = True,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Returns step(state, batch) -> (state, metrics).

    n_labeled_valid / n_unlabeled_valid: pad-and-mask batch sharding. When
    the flagship global batch (4 labeled + 10 unlabeled) doesn't divide the
    mesh data axis, batches are padded up to a device multiple with dummy
    rows AT THE END; these statics say how many leading rows are real. The
    step then masks BN statistics, every loss mean, the IIC joints, and the
    dice sums so the numerics equal the unpadded computation exactly.

    batch: {"labeled_image" [Bl,H,W,1], "labeled_target" [Bl,H,W],
            "unlabeled_image" [Bu,H,W,1]}  (device arrays, batch axis may be
            sharded over the mesh 'data' axis) — or, when ``data_store`` (a
    data.device_pipeline.DeviceDataStore) is given, just
    {"labeled_indices" [Bl], "unlabeled_indices" [Bu]} int32: the slices are
    gathered from HBM and augmented inside the step (fused on-device
    augmentation; no per-batch host traffic).
    """
    assert mode in ("partial", "uda", "iic", "udaiic", "entropy", "meanteacher"), mode
    needs_iic = mode in ("iic", "udaiic")
    needs_uda = mode in ("uda", "udaiic", "meanteacher")
    if needs_iic:
        assert projector is not None
        dec_names = [n for n in feature_names if n not in ENCODER_NAMES]
        paddings = _as_list(paddings, len(dec_names))
        patch_sizes = _as_list(patch_sizes, len(dec_names))
        importance = [float(x) for x in feature_importance]
        importance = [x / sum(importance) for x in importance]

    def consistency_per_row(p_tf_logits, p_logits_tf):
        """Unreduced consistency, [B, ...] — reduced by masked_mean."""
        if uda_criterion == "mse":
            target = jax.lax.stop_gradient(p_logits_tf.astype(jnp.float32))
            diff = p_tf_logits.astype(jnp.float32) - target
            return diff * diff
        return kl_div(p_tf_logits, jax.lax.stop_gradient(p_logits_tf),
                      reduction="none")

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        if data_store is not None:
            # device-resident path: gather + augment on device; the batch
            # carries only int32 slice indices.
            from ..ops.augment_device import augment_pair_batch

            lab_store = data_store["labeled"] if isinstance(data_store, dict) else data_store
            unlab_store = data_store["unlabeled"] if isinstance(data_store, dict) else data_store
            new_rng, flip_key, aug_l, aug_u = jax.random.split(state.rng, 4)
            lab_idx = batch["labeled_indices"]
            unlab_idx = batch["unlabeled_indices"]
            lab_packed = getattr(lab_store, "packed", None)
            labeled_image, labeled_target = augment_pair_batch(
                aug_l,
                lab_store.images[lab_idx] if lab_packed is None
                else lab_packed[lab_idx],
                lab_store.labels[lab_idx] if lab_packed is None else None,
                crop=crop,
                valid_hw=lab_store.valid_hw_dev[lab_idx],
                offsets=lab_store.offsets_dev[lab_idx],
                geometry=geometry,
                packed=lab_packed is not None,
            )
            unlabeled_image, _ = augment_pair_batch(
                aug_u,
                unlab_store.images[unlab_idx],
                None,
                crop=crop,
                valid_hw=unlab_store.valid_hw_dev[unlab_idx],
                offsets=unlab_store.offsets_dev[unlab_idx],
                geometry=geometry,
            )
        else:
            labeled_image = batch["labeled_image"]
            labeled_target = batch["labeled_target"]
            unlabeled_image = batch["unlabeled_image"]
            new_rng, flip_key = jax.random.split(state.rng)
        n_labeled = labeled_image.shape[0]
        n_unlabeled = unlabeled_image.shape[0]
        padded = (
            (n_labeled_valid is not None and n_labeled_valid != n_labeled)
            or (n_unlabeled_valid is not None and n_unlabeled_valid != n_unlabeled)
        )
        if padded:
            lab_valid = n_labeled_valid if n_labeled_valid is not None else n_labeled
            unlab_valid = n_unlabeled_valid if n_unlabeled_valid is not None else n_unlabeled
            lab_mask = (jnp.arange(n_labeled) < lab_valid).astype(jnp.float32)
            unlab_mask = (jnp.arange(n_unlabeled) < unlab_valid).astype(jnp.float32)
            bn_mask = jnp.concatenate([lab_mask, unlab_mask, unlab_mask])[
                :, None, None, None] > 0
        else:
            lab_mask = unlab_mask = bn_mask = None
        flip_mask = sample_flip_mask(flip_key, n_unlabeled, flip_threshold)
        unlabeled_image_tf = apply_flips(unlabeled_image, flip_mask)

        def masked_mean(per_row, mask):
            """per_row: [B, ...] unreduced; mask [B] — mean over real rows."""
            if mask is None:
                return jnp.mean(per_row)
            per_elem = float(np.prod(per_row.shape[1:])) if per_row.ndim > 1 else 1.0
            m = mask.reshape((-1,) + (1,) * (per_row.ndim - 1))
            return jnp.sum(per_row * m) / (jnp.sum(mask) * per_elem)

        teacher_logits_tf = None
        teacher_batch_stats = None
        if mode == "meanteacher":
            # teacher no-grad forward on the plain unlabeled view; flips
            # re-applied to its logits (MeanTeacherEpocher semantics,
            # base_epocher.py:171-186, applied to the semi setting). The
            # teacher runs train-mode BN over ITS OWN running stats —
            # dedicated teacher statistics, as the reference ema_updater's
            # BN buffer mixing implies (ema.py:7-130) and as the pretrain
            # MT step (build_finetune_mt_step) already does.
            teacher_logits, teacher_mutated = model.apply(
                {"params": state.ema_params["params"],
                 "batch_stats": state.ema_params["batch_stats"]},
                unlabeled_image, train=True, mutable=["batch_stats"],
                bn_mask=None if unlab_mask is None
                else (unlab_mask[:, None, None, None] > 0),
            )
            teacher_logits_tf = apply_flips(
                jax.lax.stop_gradient(teacher_logits), flip_mask)
            teacher_batch_stats = teacher_mutated["batch_stats"]

        def loss_fn(params):
            inputs = jnp.concatenate([labeled_image, unlabeled_image, unlabeled_image_tf], axis=0)
            (logits, features), mutated = model.apply(
                {"params": params["model"], "batch_stats": state.batch_stats},
                inputs, train=True, return_features=True, mutable=["batch_stats"],
                bn_mask=bn_mask,
            )
            label_logits = logits[:n_labeled]
            unlabel_logits = logits[n_labeled:n_labeled + n_unlabeled]
            unlabel_tf_logits = logits[n_labeled + n_unlabeled:]
            unlabel_logits_tf = apply_flips(unlabel_logits, flip_mask)

            onehot = class2one_hot(labeled_target, num_classes, class_axis=-1)
            sup_loss = masked_mean(
                kl_div(jax.nn.softmax(label_logits, axis=-1), onehot,
                       reduction="none"),
                lab_mask,
            )

            metrics: Dict[str, jnp.ndarray] = {"sup_loss": sup_loss}
            reg_loss = jnp.zeros((), jnp.float32)
            total_weight = reg_weight

            if mode == "meanteacher":
                uda_loss = masked_mean(consistency_per_row(
                    jax.nn.softmax(unlabel_tf_logits, axis=-1),
                    jax.nn.softmax(teacher_logits_tf, axis=-1),
                ), unlab_mask)
                metrics["uda"] = uda_loss
            elif needs_uda:
                uda_loss = masked_mean(consistency_per_row(
                    jax.nn.softmax(unlabel_tf_logits, axis=-1),
                    jax.nn.softmax(unlabel_logits_tf, axis=-1),
                ), unlab_mask)
                metrics["uda"] = uda_loss
            if mode == "entropy":
                # EntropyMin (the reference's dormant EntropyMinParameters
                # section): minimize prediction entropy on unlabeled views.
                from ..ops.losses import entropy as _entropy

                ent = masked_mean(
                    _entropy(jax.nn.softmax(
                        jnp.concatenate([unlabel_logits, unlabel_tf_logits],
                                        axis=0), axis=-1), reduction="none"),
                    None if unlab_mask is None
                    else jnp.concatenate([unlab_mask, unlab_mask]),
                )
                metrics["entropy"] = ent
            if needs_iic:
                iic_losses = _iic_regularization(
                    projector, params["projector"], features, flip_mask,
                    n_labeled, n_unlabeled, feature_names, paddings, patch_sizes,
                    backend, row_mask=unlab_mask,
                )
                iic_loss_val = sum(
                    w * iic_losses[n] for n, w in zip(feature_names, importance)
                )
                metrics["mi"] = -iic_loss_val
                for n in feature_names:
                    metrics[f"individual_mis/{n}"] = -iic_losses[n]

            if mode in ("uda", "meanteacher"):
                reg_loss = uda_loss
                total_weight = reg_weight
            elif mode == "entropy":
                reg_loss = ent
                total_weight = reg_weight
            elif mode == "iic":
                reg_loss = iic_loss_val
                total_weight = reg_weight
            elif mode == "udaiic":
                reg_loss = uda_weight * uda_loss + iic_weight * iic_loss_val
                total_weight = 1.0

            metrics["reg_loss"] = reg_loss
            total = sup_loss + total_weight * reg_loss
            metrics["total_loss"] = total
            return total, (mutated["batch_stats"], metrics, label_logits)

        grads, (new_batch_stats, metrics, label_logits) = jax.grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )

        new_ema = state.ema_params
        if mode == "meanteacher":
            t = state.step.astype(jnp.float32)
            alpha = jnp.minimum(1.0 - 1.0 / (t + 1.0), ema_alpha)
            decay = 1.0 - ema_weight_decay
            new_teacher = jax.tree_util.tree_map(
                lambda e, s: (e * alpha + (1 - alpha) * s) * decay,
                state.ema_params["params"], new_params["model"],
            )
            new_ema = {"params": new_teacher,
                       "batch_stats": teacher_batch_stats}

        pred = jnp.argmax(label_logits, axis=-1)
        inter, union = dice_stats(pred, labeled_target, num_classes,
                                  mask=lab_mask)
        metrics["sup_dice_inter"] = inter
        metrics["sup_dice_union"] = union

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            rng=new_rng,
            ema_params=new_ema,
        )
        return new_state, metrics

    if jit:
        return jax.jit(step, donate_argnums=(0,))
    return step


def build_epoch_scan(step_fn, num_batches: int, jit: bool = True):
    """Fuse a whole training epoch into ONE device program.

    With device-resident data the per-step host work is nil, so dispatching
    steps one by one only pays host->device round-trip latency per step
    (milliseconds over thin links). ``lax.scan`` over the step turns the
    epoch into a single XLA invocation: one dispatch, metrics stacked on
    device, one readback at epoch end.

    step_fn must be the UNJITTED step (jit=False) over index batches.
    Returns epoch_fn(state, batches) where batches is a dict of
    [num_batches, ...]-stacked index arrays.
    """

    def epoch(state: TrainState, batches: Dict[str, jnp.ndarray]):
        def body(carry, batch):
            new_state, metrics = step_fn(carry, batch)
            return new_state, metrics

        return jax.lax.scan(body, state, batches, length=num_batches)

    if jit:
        return jax.jit(epoch, donate_argnums=(0,))
    return epoch


def build_augment_fn(data_store, crop: int = 224, geometry: str = "fused"):
    """Standalone device augmentation: aug(base_key, i, idx_batch) ->
    {"labeled_image", "labeled_target", "unlabeled_image"} tensors.

    Keys derive from fold_in(base_key, i) — NOT from the step-chained rng —
    so augmenting batch i+1 has no data dependency on step i. That is what
    lets the pipelined epoch scan overlap the gather-bound augmentation
    (rotation ~13 ms at B=18/256² on v5e) with the previous step's MXU
    work."""
    from ..ops.augment_device import augment_pair_batch

    lab_store = data_store["labeled"] if isinstance(data_store, dict) else data_store
    unlab_store = data_store["unlabeled"] if isinstance(data_store, dict) else data_store

    def aug(base_key, i, batch):
        k = jax.random.fold_in(base_key, i)
        k_l, k_u = jax.random.split(k)
        lab_idx = batch["labeled_indices"]
        unlab_idx = batch["unlabeled_indices"]
        lab_packed = getattr(lab_store, "packed", None)
        labeled_image, labeled_target = augment_pair_batch(
            k_l,
            lab_store.images[lab_idx] if lab_packed is None
            else lab_packed[lab_idx],
            lab_store.labels[lab_idx] if lab_packed is None else None,
            crop=crop, valid_hw=lab_store.valid_hw_dev[lab_idx],
            offsets=lab_store.offsets_dev[lab_idx], geometry=geometry,
            packed=lab_packed is not None,
        )
        unlabeled_image, _ = augment_pair_batch(
            k_u, unlab_store.images[unlab_idx], None, crop=crop,
            valid_hw=unlab_store.valid_hw_dev[unlab_idx],
            offsets=unlab_store.offsets_dev[unlab_idx], geometry=geometry,
        )
        return {"labeled_image": labeled_image,
                "labeled_target": labeled_target,
                "unlabeled_image": unlabeled_image}

    return aug


def build_epoch_scan_pipelined(aug_fn, step_fn, num_batches: int, jit: bool = True):
    """Software-pipelined whole-epoch program: batch i+1's
    gather+augmentation is scheduled alongside step i (no data dependency —
    augmentation keys are fold_in(epoch rng, i), see build_augment_fn).

    MEASURED NEUTRAL on TPU v5e (291 vs 292 slices/s e2e): a TPU core
    executes ops of one program strictly sequentially — there are no
    concurrent streams to overlap independent ops on — so the gather-bound
    augmentation costs the same wherever it is scheduled. Kept as a tested
    option for platforms with genuine inter-op concurrency; the trainer
    default is the plain aug-in-step scan.

    step_fn must be the UNJITTED TENSOR-mode step (data_store=None): it
    receives the pre-augmented batch. Returns epoch_fn(state, batches) with
    the same contract as build_epoch_scan ([num_batches, B] index arrays,
    optionally sharded on the data axis)."""

    def epoch(state: TrainState, batches: Dict[str, jnp.ndarray]):
        base = state.rng  # per-epoch augmentation base key
        first = {k: v[0] for k, v in batches.items()}
        aug0 = aug_fn(base, 0, first)
        # batch i+1's indices feed iteration i; the final iteration augments
        # a wrapped batch whose output is discarded (one wasted augmentation
        # per epoch).
        shifted = {k: jnp.roll(v, -1, axis=0) for k, v in batches.items()}
        steps_i = jnp.arange(1, num_batches + 1)

        def body(carry, xs):
            state, cur = carry
            next_idx, i_next = xs
            nxt = aug_fn(base, i_next, next_idx)
            new_state, metrics = step_fn(state, cur)
            return (new_state, nxt), metrics

        (state, _), stacked = jax.lax.scan(
            body, (state, aug0), (shifted, steps_i), length=num_batches)
        return state, stacked

    if jit:
        return jax.jit(epoch, donate_argnums=(0,))
    return epoch


def build_epoch_scan_preaug(step_fn, data_store, num_batches: int,
                            crop: int = 224, geometry: str = "fused",
                            jit: bool = True):
    """Per-EPOCH store pre-augmentation (Kernel.augment=epoch): augment every
    stored slice ONCE at the top of the epoch program, then each step does a
    contiguous row-gather from the augmented store plus the per-step keyed
    twin-view flips inside ``step_fn``.

    Why: the e2e profile (docs/study_r05/e2e_profile.md) shows the per-draw
    rotation gather costs 8.9 ms of the 74.3 ms step — gathers run at ~13
    cycles/ELEMENT serialized on the core, and the flagship epoch redraws
    each stored slice ~10x (300 steps x 14 draws vs ~400 stored slices).
    Augmenting per slice per epoch amortizes that 10x: each occurrence of a
    slice within one epoch shares its rotate/flip/crop/jitter draw, but the
    draw is fresh every epoch (keys fold in the epoch rng), so across the
    100-epoch budget every slice still sees ~100 independent transforms.
    SEMANTICS DELTA vs the reference (fresh transform per DRAW,
    semi_seg/epocher.py:144-150): within-epoch redraws are correlated. The
    per-step twin-view flips that drive the UDA/IIC pairing stay per-draw
    keyed inside the train step, untouched. Capability-checked in
    docs/study_r05/STUDY.md before becoming a default anywhere.

    step_fn must be the UNJITTED TENSOR-mode step (data_store=None).
    Returns epoch_fn(state, batches) with the build_epoch_scan contract.
    """
    from ..ops.augment_device import augment_pair_batch

    lab_store = data_store["labeled"] if isinstance(data_store, dict) else data_store
    unlab_store = data_store["unlabeled"] if isinstance(data_store, dict) else data_store

    def epoch(state: TrainState, batches: Dict[str, jnp.ndarray]):
        aug_key, chain_rng = jax.random.split(state.rng)
        state = state.replace(rng=chain_rng)
        k_l, k_u = jax.random.split(aug_key)
        lab_packed = getattr(lab_store, "packed", None)
        lab_img, lab_tgt = augment_pair_batch(
            k_l,
            lab_store.images if lab_packed is None else lab_packed,
            lab_store.labels if lab_packed is None else None,
            crop=crop, valid_hw=lab_store.valid_hw_dev,
            offsets=lab_store.offsets_dev, geometry=geometry,
            packed=lab_packed is not None,
        )
        unlab_img, _ = augment_pair_batch(
            k_u, unlab_store.images, None, crop=crop,
            valid_hw=unlab_store.valid_hw_dev,
            offsets=unlab_store.offsets_dev, geometry=geometry,
        )

        def body(carry, batch):
            b = {
                "labeled_image": lab_img[batch["labeled_indices"]],
                "labeled_target": lab_tgt[batch["labeled_indices"]],
                "unlabeled_image": unlab_img[batch["unlabeled_indices"]],
            }
            return step_fn(carry, b)

        return jax.lax.scan(body, state, batches, length=num_batches)

    if jit:
        return jax.jit(epoch, donate_argnums=(0,))
    return epoch


def build_eval_scan(model, *, num_classes: int, data_store, crop: int = 224,
                    jit: bool = True):
    """Whole-eval-set program: scan over patient index batches.
    eval_all(params, batch_stats, indices [P, padded], masks [P, padded]) ->
    {loss [P], inter [P, C], union [P, C]}."""
    eval_one = build_eval_step(model, num_classes=num_classes,
                               data_store=data_store, crop=crop, jit=False)

    def eval_all(params, batch_stats, indices, masks):
        def body(_, im):
            idx, mask = im
            out = eval_one(params, batch_stats, idx, mask)
            return None, {"loss": out["loss"], "inter": out["inter"][0],
                          "union": out["union"][0]}

        _, stacked = jax.lax.scan(body, None, (indices, masks))
        return stacked

    if jit:
        return jax.jit(eval_all)
    return eval_all


def build_eval_step(model, *, num_classes: int, data_store=None, crop: int = 224,
                    jit: bool = True):
    """Returns eval(params, batch_stats, image, target, mask) ->
    {loss, inter [1,C], union [1,C]} — one padded patient volume per call,
    dice I/U pooled over valid slices on device (the volume-dice semantics of
    the reference's patient-batched EvalEpocher, semi_seg/epocher.py:36-73).

    With ``data_store``, the signature is eval(params, batch_stats, indices,
    mask): slices are gathered + center-cropped on device."""

    def evaluate_device(params, batch_stats, indices, mask):
        from ..ops.augment_device import center_crop_batch

        raw_img = data_store.images[indices].astype(jnp.float32) / 255.0
        raw_lab = data_store.labels[indices].astype(jnp.int32)
        image = center_crop_batch(raw_img, crop)[..., None]
        target = center_crop_batch(raw_lab, crop)
        return evaluate(params, batch_stats, image, target, mask)

    def evaluate(params, batch_stats, image, target, mask):
        logits = model.apply(
            {"params": params["model"], "batch_stats": batch_stats},
            image, train=False,
        )
        probs = jax.nn.softmax(logits, axis=-1)
        onehot = class2one_hot(target, num_classes, class_axis=-1)
        per_pixel = kl_div(probs, onehot, reduction="none")  # [P, H, W]
        valid = mask.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(valid), 1.0) * per_pixel.shape[1] * per_pixel.shape[2]
        loss = jnp.sum(per_pixel * valid[:, None, None]) / denom
        pred = jnp.argmax(logits, axis=-1)
        inter, union = dice_stats(pred, target, num_classes, mask=valid)
        return {
            "loss": loss,
            "inter": jnp.sum(inter, axis=0, keepdims=True),
            "union": jnp.sum(union, axis=0, keepdims=True),
            "pred": pred,
        }

    fn = evaluate_device if data_store is not None else evaluate
    if jit:
        return jax.jit(fn)
    return fn
