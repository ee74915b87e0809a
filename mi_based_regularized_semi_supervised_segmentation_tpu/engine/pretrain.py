"""Contrastive pretraining pipeline (the reference's `contrastyou` trainer zoo).

Capability parity:
- ContrastTrainer: 3-phase pretrain-encoder -> pretrain-decoder -> finetune
  (/root/reference/contrastyou/trainer/contrast_trainer.py:23-232)
- ContrastTrainerMT: finetune replaced by mean-teacher with EMA teacher
  (contrast_trainer.py:235-268, WHEEL::deepclustering2/models/ema.py:7-130)
- IICContrastTrainer: pretrain phases get an extra IIC cluster-head branch
  (/root/reference/contrastyou/trainer/iic_trainer.py:16-157)
- Pretrain epochers (contrastyou/epocher/contrast_epocher.py:21-176,
  IIC_epocher.py:21-169, base_epocher.py:21-216) become jitted steps.
- Label generators / unfold_position (contrastyou/epocher/_utils.py:36-87).

TPU-native structure: each phase is one jitted step over a TrainState whose
update is masked by the component-freeze pytree (replacing requires_grad
toggling, unet.py:135-182); the EMA teacher is a device PyTree updated inside
the jitted mean-teacher step.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from .. import PROJECT_PATH
from ..models import (
    ClusterHead,
    LocalClusterHead,
    LocalProjectionHead,
    ProjectionHead,
    UNet,
)
from ..models.unet import COMPONENT_NAMES, UNET_DIMENSIONS
from ..ops.flips import apply_flips, sample_flip_mask
from ..ops.iic import iid_loss
from ..ops.iic_local import iid_segmentation_small_patch_loss_subheads
from ..ops.losses import kl_div, mse_consistency, supcon_loss
from ..parallel import prefetch_to_device, replicate_state, shard_batch
from ..utils import (
    AverageValueMeter,
    MeterInterface,
    Storage,
    StorageIncomeDict,
    UniversalDice,
)
from ..utils.general import class2one_hot
from ..utils.writer import SummaryWriter
from .checkpoints import BEST_NAME, LAST_NAME, load_checkpoint, save_checkpoint
from .optim import build_optimizer, lr_at_epoch, set_learning_rate
from .state import TrainState
from .steps import build_eval_step, dice_stats

__all__ = [
    "global_labels",
    "local_labels",
    "unfold_blocks",
    "component_range",
    "freeze_mask",
    "ContrastTrainer",
    "ContrastTrainerMT",
    "IICContrastTrainer",
    "pretrain_zoos",
]


# --------------------------------------------------------------------------
# label generation (host side)
# --------------------------------------------------------------------------

def _unique_mapping(names: Sequence[str]) -> np.ndarray:
    mapping = {u: i for i, u in enumerate(sorted(set(names)))}
    return np.asarray([mapping[n] for n in names], np.int32)


def global_labels(
    partitions: Sequence[str],
    groups: Sequence[str],
    on_patient: bool = False,
    on_partition: bool = True,
) -> np.ndarray:
    """Contrastive positives share (patient and/or partition) identity."""
    keys = []
    for part, grp in zip(partitions, groups):
        key = ""
        if on_patient:
            key += f"_{grp}"
        if on_partition:
            key += f"_{part}"
        keys.append(key)
    return _unique_mapping(keys)


def local_labels(
    partitions: Sequence[str],
    groups: Sequence[str],
    locations: Sequence[str],
) -> np.ndarray:
    """Patient+partition+patch-location identity; ``locations`` has
    len = n_blocks * B (batch repeated per block, reference order)."""
    mul = len(locations) // len(partitions)
    partitions = [str(p) for p in partitions] * mul
    groups = [str(g) for g in groups] * mul
    keys = [f"_{g}_{p}_{l}" for g, p, l in zip(groups, partitions, locations)]
    return _unique_mapping(keys)


def group_option_flags(group_option: str) -> Tuple[bool, bool]:
    assert group_option in ("partition", "patient", "both"), group_option
    return (
        group_option in ("patient", "both"),
        group_option in ("partition", "both"),
    )


# --------------------------------------------------------------------------
# unfold (device side)
# --------------------------------------------------------------------------

def unfold_blocks(x: jnp.ndarray, partition_num: Tuple[int, int] = (2, 2)):
    """[B, H, W, C] -> ([n_blocks*B, bh, bw, C], location_strings).
    Block raster order with all B per block, matching unfold_position
    (contrastyou/epocher/_utils.py:36-50)."""
    B, H, W, C = x.shape
    bh, bw = H // partition_num[0], W // partition_num[1]
    blocks = []
    locations: List[str] = []
    for hi in range(0, H - bh + 1, bh):
        for wi in range(0, W - bw + 1, bw):
            blocks.append(x[:, hi:hi + bh, wi:wi + bw, :])
            locations.extend([f"({hi}, {wi})"] * B)
    return jnp.concatenate(blocks, axis=0), locations


def unfold_locations(shape_hw: Tuple[int, int], batch: int,
                     partition_num: Tuple[int, int] = (2, 2)) -> List[str]:
    """Host-side location strings for a given feature size (static)."""
    H, W = shape_hw
    bh, bw = H // partition_num[0], W // partition_num[1]
    locations: List[str] = []
    for hi in range(0, H - bh + 1, bh):
        for wi in range(0, W - bw + 1, bw):
            locations.extend([f"({hi}, {wi})"] * batch)
    return locations


# --------------------------------------------------------------------------
# component freezing (enable_grad(from_, util) semantics)
# --------------------------------------------------------------------------

def component_range(from_: str, util: str) -> List[str]:
    """UNet components in [from_, util], reference order (unet.py:163-177)."""
    i, j = COMPONENT_NAMES.index(from_), COMPONENT_NAMES.index(util)
    assert i <= j, (from_, util)
    return COMPONENT_NAMES[i:j + 1]


def freeze_mask(params: Any, trainable_model_components: Sequence[str]) -> Any:
    """0/1 float pytree: model params masked by component name (top-level
    module name); all non-model subtrees (heads) trainable."""
    trainable = set(trainable_model_components)

    def mask_for(tree, active: bool):
        return jax.tree_util.tree_map(lambda _: 1.0 if active else 0.0, tree)

    out = {}
    for key, subtree in params.items():
        if key == "model":
            out[key] = {
                comp: mask_for(sub, comp in trainable)
                for comp, sub in subtree.items()
            }
        else:
            out[key] = mask_for(subtree, True)
    return out


def _masked_apply(tx, grads, state, mask):
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    if mask is not None:
        updates = jax.tree_util.tree_map(lambda u, m: u * m, updates, mask)
    new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
    return new_params, new_opt_state


def _l2n(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True)), eps)


# --------------------------------------------------------------------------
# jitted steps
# --------------------------------------------------------------------------

def build_pretrain_encoder_step(
    model, projector, tx, *, extract_position: str = "Conv5", mask=None,
    iic_head=None, iic_weight: float = 1.0, disable_contrastive: bool = False,
    jit: bool = True,
):
    """Global contrastive (+ optional IIC) pretraining step.
    batch: {image, image_tf [B,H,W,1], labels [B]}."""

    def step(state: TrainState, batch):
        new_rng, _ = jax.random.split(state.rng)

        def loss_fn(params):
            inputs = jnp.concatenate([batch["image"], batch["image_tf"]], axis=0)
            (_, feats), mutated = model.apply(
                {"params": params["model"], "batch_stats": state.batch_stats},
                inputs, train=True, return_features=True, mutable=["batch_stats"],
            )
            en = feats[extract_position]
            proj = projector.apply({"params": params["projector"]}, en)
            z = _l2n(proj)
            z1, z2 = jnp.split(z, 2, axis=0)
            closs = supcon_loss(jnp.stack([z1, z2], axis=1), labels=batch["labels"])
            metrics = {"contrastive_loss": closs}
            total = closs
            if iic_head is not None:
                probs = iic_head.apply({"params": params["iic"]}, en)  # [2B,S,K]
                p1, p2 = jnp.split(probs, 2, axis=0)
                per_subhead = jax.vmap(
                    lambda a, b: iid_loss(a, b)[0], in_axes=(1, 1))(p1, p2)
                iic = jnp.mean(per_subhead)
                metrics["iic_loss"] = iic
                total = iic if disable_contrastive else iic_weight * iic + closs
            metrics["total_loss"] = total
            return total, (mutated["batch_stats"], metrics)

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_params, new_opt = _masked_apply(tx, grads, state, mask)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bs, opt_state=new_opt, rng=new_rng), metrics

    return jax.jit(step, donate_argnums=(0,)) if jit else step


def build_pretrain_decoder_step(
    model, projector, tx, *, extract_position: str = "Up_conv3", mask=None,
    iic_head=None, iic_weight: float = 1.0, disable_contrastive: bool = False,
    iic_padding: int = 0, iic_patch_size: int = 512,
    flip_threshold: float = 0.5, jit: bool = True,
):
    """Local contrastive (+ optional local IIC) pretraining step.
    batch: {image (view1), image_tf (view2, shared-geometry), labels [4B]}.
    View1 gets on-device flips; the flip is re-applied to view2's features to
    form the equivariant pair (contrast_epocher.py:130-176)."""

    def step(state: TrainState, batch):
        new_rng, flip_key = jax.random.split(state.rng)
        img = batch["image"]
        img_ctf = batch["image_tf"]
        B = img.shape[0]
        flip = sample_flip_mask(flip_key, B, flip_threshold)
        img_gtf = apply_flips(img, flip)

        def loss_fn(params):
            inputs = jnp.concatenate([img_gtf, img_ctf], axis=0)
            (_, feats), mutated = model.apply(
                {"params": params["model"], "batch_stats": state.batch_stats},
                inputs, train=True, return_features=True, mutable=["batch_stats"],
            )
            dn = feats[extract_position]
            dn_gtf, dn_ctf = jnp.split(dn, 2, axis=0)
            dn_ctf_gtf = apply_flips(dn_ctf, flip)
            dn_tf = jnp.concatenate([dn_gtf, dn_ctf_gtf], axis=0)

            proj = projector.apply({"params": params["projector"]}, dn_tf)  # [2B,4,4,32]
            p1, p2 = jnp.split(proj, 2, axis=0)
            u1, _ = unfold_blocks(p1, (2, 2))
            u2, _ = unfold_blocks(p2, (2, 2))
            z1 = _l2n(u1.reshape(u1.shape[0], -1))
            z2 = _l2n(u2.reshape(u2.shape[0], -1))
            closs = supcon_loss(jnp.stack([z1, z2], axis=1), labels=batch["labels"])
            metrics = {"contrastive_loss": closs}
            total = closs
            if iic_head is not None:
                probs = iic_head.apply({"params": params["iic"]}, dn_tf)  # [2B,h,w,S,K]
                q1, q2 = jnp.split(probs, 2, axis=0)
                iic = iid_segmentation_small_patch_loss_subheads(
                    q1, q2, padding=iic_padding, patch_size=iic_patch_size,
                )
                metrics["iic_loss"] = iic
                total = iic if disable_contrastive else iic_weight * iic + closs
            metrics["total_loss"] = total
            return total, (mutated["batch_stats"], metrics)

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_params, new_opt = _masked_apply(tx, grads, state, mask)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bs, opt_state=new_opt, rng=new_rng), metrics

    return jax.jit(step, donate_argnums=(0,)) if jit else step


def build_finetune_step(model, tx, *, num_classes: int, jit: bool = True):
    """Plain supervised fine-tune on labeled data (SimpleFineTuneEpoch)."""

    def step(state: TrainState, batch):
        new_rng, _ = jax.random.split(state.rng)

        def loss_fn(params):
            logits, mutated = model.apply(
                {"params": params["model"], "batch_stats": state.batch_stats},
                batch["image"], train=True, mutable=["batch_stats"],
            )
            onehot = class2one_hot(batch["target"], num_classes, class_axis=-1)
            sup = kl_div(jax.nn.softmax(logits, axis=-1), onehot)
            return sup, (mutated["batch_stats"], logits)

        grads, (new_bs, logits) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_params, new_opt = _masked_apply(tx, grads, state, None)
        pred = jnp.argmax(logits, axis=-1)
        inter, union = dice_stats(pred, batch["target"], num_classes)
        onehot = class2one_hot(batch["target"], num_classes, class_axis=-1)
        metrics = {
            "sup_loss": kl_div(jax.nn.softmax(logits, axis=-1), onehot),
            "sup_dice_inter": inter,
            "sup_dice_union": union,
        }
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bs, opt_state=new_opt, rng=new_rng), metrics

    return jax.jit(step, donate_argnums=(0,)) if jit else step


def build_finetune_mt_step(
    model, tx, *, num_classes: int, reg_weight: float = 10.0,
    ema_alpha: float = 0.999, ema_weight_decay: float = 1e-6,
    flip_threshold: float = 0.5, jit: bool = True,
):
    """Mean-teacher fine-tune (MeanTeacherEpocher, base_epocher.py:129-216):
    student on [labeled, unlabeled_tf]; teacher no-grad on unlabeled, teacher
    logits flipped with the shared mask; MSE consistency; in-step EMA update
    with the torch ema_updater schedule alpha_t = min(1 - 1/(t+1), alpha)
    then (1 - wd) shrink.

    state.ema_params holds {"params": teacher params, "batch_stats": ...}.
    """

    def step(state: TrainState, batch):
        new_rng, flip_key = jax.random.split(state.rng)
        unlabeled = batch["unlabeled_image"]
        Bu = unlabeled.shape[0]
        flip = sample_flip_mask(flip_key, Bu, flip_threshold)
        unlabeled_tf = apply_flips(unlabeled, flip)
        n_lab = batch["image"].shape[0]

        # teacher forward (train-mode BN: updates ITS running stats)
        teacher_logits, teacher_mutated = model.apply(
            {"params": state.ema_params["params"],
             "batch_stats": state.ema_params["batch_stats"]},
            unlabeled, train=True, mutable=["batch_stats"],
        )
        teacher_logits_tf = apply_flips(jax.lax.stop_gradient(teacher_logits), flip)

        def loss_fn(params):
            inputs = jnp.concatenate([batch["image"], unlabeled_tf], axis=0)
            logits, mutated = model.apply(
                {"params": params["model"], "batch_stats": state.batch_stats},
                inputs, train=True, mutable=["batch_stats"],
            )
            sup_logits = logits[:n_lab]
            stu_unl_tf_logits = logits[n_lab:]
            onehot = class2one_hot(batch["target"], num_classes, class_axis=-1)
            sup = kl_div(jax.nn.softmax(sup_logits, axis=-1), onehot)
            reg = mse_consistency(
                jax.nn.softmax(stu_unl_tf_logits, axis=-1),
                jax.nn.softmax(teacher_logits_tf, axis=-1),
            )
            total = sup + reg_weight * reg
            return total, (mutated["batch_stats"], sup, reg, sup_logits)

        grads, (new_bs, sup, reg, sup_logits) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_params, new_opt = _masked_apply(tx, grads, state, None)

        # EMA update
        t = state.step.astype(jnp.float32)
        alpha = jnp.minimum(1.0 - 1.0 / (t + 1.0), ema_alpha)
        decay = 1.0 - ema_weight_decay
        new_teacher = jax.tree_util.tree_map(
            lambda e, s: (e * alpha + (1 - alpha) * s) * decay,
            state.ema_params["params"], new_params["model"],
        )
        new_ema = {"params": new_teacher, "batch_stats": teacher_mutated["batch_stats"]}

        pred = jnp.argmax(sup_logits, axis=-1)
        inter, union = dice_stats(pred, batch["target"], num_classes)
        metrics = {
            "sup_loss": sup, "reg_loss": reg,
            "sup_dice_inter": inter, "sup_dice_union": union,
        }
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bs, opt_state=new_opt,
                             rng=new_rng, ema_params=new_ema), metrics

    return jax.jit(step, donate_argnums=(0,)) if jit else step


# --------------------------------------------------------------------------
# trainers
# --------------------------------------------------------------------------

class ContrastTrainer:
    """3-phase pretrain/finetune pipeline."""

    RUN_DIR = str(Path(PROJECT_PATH) / "runs")
    name = "contrast"

    def __init__(
        self,
        *,
        pretrain_loader,     # TwiceLoader over unlabeled data
        fine_tune_loader,    # SegmentationLoader over labeled fraction
        val_loader,          # PatientEvalLoader
        configuration: Dict[str, Any],
        save_dir: str = "contrast",
        max_epoch_train_encoder: int = 100,
        max_epoch_train_decoder: int = 100,
        max_epoch_train_finetune: int = 100,
        num_batches: int = 256,
        train_encoder: bool = True,
        train_decoder: bool = True,
        crop_size: int = 224,
        mesh=None,
        run_dir: Optional[str] = None,
        **kwargs,
    ) -> None:
        self._config = configuration
        self._pretrain_loader = pretrain_loader
        self._fine_tune_loader = fine_tune_loader
        self._val_loader = val_loader
        self._max_epoch_encoder = max_epoch_train_encoder
        self._max_epoch_decoder = max_epoch_train_decoder
        self._max_epoch_finetune = max_epoch_train_finetune
        self._num_batches = num_batches
        self.train_encoder = train_encoder
        self.train_decoder = train_decoder
        self._crop = crop_size
        self._mesh = mesh
        # run_dir overrides the class-level RUN_DIR root (tests, sweeps)
        self._save_dir = str(Path(run_dir or self.RUN_DIR) / save_dir)
        Path(self._save_dir).mkdir(parents=True, exist_ok=True)
        with open(Path(self._save_dir) / "config.yaml", "w") as f:
            yaml.safe_dump(configuration, f, sort_keys=False)

        arch = configuration.get("Arch", {"input_dim": 1, "num_classes": 4})
        self._num_classes = int(arch.get("num_classes", 4))
        self._model = UNet(input_dim=int(arch.get("input_dim", 1)),
                           num_classes=self._num_classes)
        self._eval_step = build_eval_step(self._model, num_classes=self._num_classes)

        self._encoder_storage = Storage()
        self._decoder_storage = Storage()
        self._finetune_storage = Storage()
        self._best_score = -1.0
        self._start_epoch = 0
        self._cur_epoch = 0
        self._seed = int(configuration.get("RandomSeed", 10))

        # model params/batch_stats carried across phases
        key = jax.random.PRNGKey(self._seed)
        dummy = jnp.zeros((1, self._crop, self._crop, int(arch.get("input_dim", 1))))
        variables = self._model.init(key, dummy, train=False)
        self._model_params = variables["params"]
        self._batch_stats = variables.get("batch_stats", {})
        self._feature_shapes = {
            name: feat.shape
            for name, feat in self._model.apply(
                variables, dummy, train=False, return_features=True)[1].items()
        }

    # ----- phase helpers ------------------------------------------------
    def _make_state(self, head_params: Dict[str, Any], tx, with_ema: bool = False) -> TrainState:
        params = {"model": self._model_params, **head_params}
        ema = None
        if with_ema:
            ema = {
                "params": jax.tree_util.tree_map(jnp.copy, self._model_params),
                "batch_stats": jax.tree_util.tree_map(jnp.copy, self._batch_stats),
            }
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=self._batch_stats,
            opt_state=tx.init(params),
            rng=jax.random.PRNGKey(self._seed + 1),
            ema_params=ema,
        )
        return replicate_state(state, self._mesh)

    def _absorb_state(self, state: TrainState) -> None:
        state = jax.device_get(state)
        self._model_params = state.params["model"]
        self._batch_stats = state.batch_stats

    def _init_head(self, module, feature_name: str, key_salt: int):
        dummy = jnp.zeros(self._feature_shapes[feature_name])
        return module.init(jax.random.PRNGKey(self._seed + key_salt), dummy)["params"]

    def _phase_lr(self, epoch, lr, multiplier, warmup_max, max_epoch, eta_min):
        return lr_at_epoch(epoch, lr, multiplier, warmup_max, max_epoch, eta_min)

    def _run_phase(
        self, *, phase_name: str, step_fn, state: TrainState, batches_fn,
        max_epoch: int, lr_schedule, storage: Storage, writer,
        meters_names: Sequence[str], income_key: str, save_best: bool = False,
    ) -> TrainState:
        phase_dir = os.path.join(self._save_dir, phase_name)
        for epoch in range(self._start_epoch, max_epoch):
            self._cur_epoch = epoch
            meters = MeterInterface()
            meters.register_meter("lr", AverageValueMeter())
            for m in meters_names:
                meters.register_meter(m, AverageValueMeter())
            if save_best:
                meters.register_meter(
                    "ds", UniversalDice(self._num_classes,
                                        list(range(1, self._num_classes))))
            lr = lr_schedule(epoch)
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, lr))
            meters["lr"].add(lr)

            pending = []
            batch_iter = batches_fn()
            for _ in range(self._num_batches):
                batch = next(batch_iter)
                groups = batch.pop("group", None)
                state, metrics = step_fn(state, batch)
                pending.append((metrics, groups))
            for metrics, groups in pending:
                metrics = jax.device_get(metrics)
                for m in meters_names:
                    if m in metrics:
                        meters[m].add(float(metrics[m]))
                if save_best and "sup_dice_inter" in metrics:
                    meters["ds"].add_stats(
                        np.asarray(metrics["sup_dice_inter"]),
                        np.asarray(metrics["sup_dice_union"]),
                        group_name=groups,
                    )
            report = meters.tracking_status()
            income = {income_key: report}
            if save_best:
                val_report, cur_score = self._eval_phase(state)
                income["val"] = val_report
            storage.put_from_dict(StorageIncomeDict(**income), epoch)
            writer.add_scalars_from_income_dict(income, epoch)
            storage.to_csv(phase_dir, f"{phase_name}.csv")
            meta = {"cur_epoch": epoch, "best_score": self._best_score, "phase": phase_name}
            save_checkpoint(Path(phase_dir) / LAST_NAME, state, meta)
            if save_best and cur_score > self._best_score:
                self._best_score = float(cur_score)
                meta["best_score"] = self._best_score
                save_checkpoint(Path(phase_dir) / BEST_NAME, state, meta)
        self._start_epoch = 0
        return state

    def _eval_phase(self, state: TrainState, use_teacher: bool = False):
        meters = MeterInterface()
        meters.register_meter("sup_loss", AverageValueMeter())
        meters.register_meter(
            "ds", UniversalDice(self._num_classes, list(range(1, self._num_classes))))
        if use_teacher:
            params = {"model": state.ema_params["params"]}
            batch_stats = state.ema_params["batch_stats"]
        else:
            params = {"model": state.params["model"]}
            batch_stats = state.batch_stats
        for batch in self._val_loader:
            device_batch = shard_batch(
                {k: batch[k] for k in ("image", "target", "mask")}, self._mesh)
            out = jax.device_get(self._eval_step(
                params, batch_stats,
                device_batch["image"], device_batch["target"], device_batch["mask"]))
            meters["sup_loss"].add(float(out["loss"]))
            meters["ds"].add_stats(np.asarray(out["inter"]), np.asarray(out["union"]),
                                   group_name=batch["group"])
        report = meters.tracking_status()
        return report, report["ds"]["DSC_mean"]

    # ----- phases -------------------------------------------------------
    def pretrain_encoder(self, writer, *, group_option: str = "partition",
                         lr=1e-6, weight_decay=1e-5, multiplier=300, warmup_max=10,
                         ptype="mlp", extract_position="Conv5", checkpoint=None,
                         **head_options) -> None:
        projector = ProjectionHead(output_dim=256, head_type=ptype)
        proj_params = self._init_head(projector, extract_position, 11)
        tx = build_optimizer({"name": "Adam", "lr": lr, "weight_decay": weight_decay})
        heads = {"projector": proj_params}
        iic_head, heads, extra = self._encoder_iic_branch(extract_position, heads, head_options)
        state = self._make_state(heads, tx)
        mask = freeze_mask(jax.device_get(state).params,
                           component_range("Conv1", extract_position))
        on_patient, on_partition = group_option_flags(group_option)
        self._pretrain_loader.set_total_freedom(True)
        step = build_pretrain_encoder_step(
            self._model, projector, tx, extract_position=extract_position,
            mask=mask, iic_head=iic_head, **extra)

        loader_iter = iter(self._pretrain_loader)

        def batches():
            def host_iter():
                for batch in loader_iter:
                    labels = global_labels(batch["partition"], batch["group"],
                                           on_patient, on_partition)
                    yield {
                        "image": batch["image"],
                        "image_tf": batch["image_tf"],
                        "labels": labels,
                        "group": batch["group"],
                    }
            return prefetch_to_device(host_iter(), self._mesh)

        if checkpoint is not None:
            state, meta = load_checkpoint(
                Path(checkpoint) / "pretrain_encoder" / LAST_NAME, state)
            self._start_epoch = int(meta.get("cur_epoch", -1)) + 1
        schedule = lambda e: self._phase_lr(e, lr, multiplier, warmup_max,
                                            self._max_epoch_encoder, 0.0)
        meters = ["contrastive_loss"] + (["iic_loss"] if iic_head is not None else [])
        state = self._run_phase(
            phase_name="pretrain_encoder", step_fn=step, state=state,
            batches_fn=batches, max_epoch=self._max_epoch_encoder,
            lr_schedule=schedule, storage=self._encoder_storage, writer=writer,
            meters_names=meters, income_key="PRETRAIN_ENCODER")
        self._absorb_state(state)

    def _encoder_iic_branch(self, extract_position, heads, head_options):
        return None, heads, {}

    def _decoder_iic_branch(self, extract_position, heads, head_options):
        return None, heads, {}

    def pretrain_decoder(self, writer, *, lr=1e-6, weight_decay=0.0,
                         multiplier=300, warmup_max=10, ptype="mlp",
                         extract_position="Up_conv3", enable_grad_from="Up5",
                         checkpoint=None, **head_options) -> None:
        projector = LocalProjectionHead(head_type=ptype, output_size=(4, 4))
        proj_params = self._init_head(projector, extract_position, 13)
        tx = build_optimizer({"name": "Adam", "lr": lr, "weight_decay": weight_decay})
        heads = {"projector": proj_params}
        iic_head, heads, extra = self._decoder_iic_branch(extract_position, heads, head_options)
        state = self._make_state(heads, tx)
        mask = freeze_mask(jax.device_get(state).params,
                           component_range(enable_grad_from, extract_position))
        self._pretrain_loader.set_total_freedom(False)
        step = build_pretrain_decoder_step(
            self._model, projector, tx, extract_position=extract_position,
            mask=mask, iic_head=iic_head, **extra)

        feat_hw = self._feature_shapes[extract_position][1:3]
        loader_iter = iter(self._pretrain_loader)

        def batches():
            def host_iter():
                for batch in loader_iter:
                    locations = unfold_locations((4, 4), len(batch["group"]), (2, 2))
                    labels = local_labels(batch["partition"], batch["group"], locations)
                    yield {
                        "image": batch["image"],
                        "image_tf": batch["image_tf"],
                        "labels": labels,
                        "group": batch["group"],
                    }
            return prefetch_to_device(host_iter(), self._mesh)

        if checkpoint is not None:
            state, meta = load_checkpoint(
                Path(checkpoint) / "pretrain_decoder" / LAST_NAME, state)
            self._start_epoch = int(meta.get("cur_epoch", -1)) + 1
        schedule = lambda e: self._phase_lr(e, lr, multiplier, warmup_max,
                                            self._max_epoch_decoder, 0.0)
        meters = ["contrastive_loss"] + (["iic_loss"] if iic_head is not None else [])
        state = self._run_phase(
            phase_name="pretrain_decoder", step_fn=step, state=state,
            batches_fn=batches, max_epoch=self._max_epoch_decoder,
            lr_schedule=schedule, storage=self._decoder_storage, writer=writer,
            meters_names=meters, income_key="PRETRAIN_DECODER")
        self._absorb_state(state)

    def finetune(self, writer, *, lr=1e-7, weight_decay=1e-5, multiplier=200,
                 warmup_max=10, checkpoint=None, **kwargs) -> None:
        tx = build_optimizer({"name": "Adam", "lr": lr, "weight_decay": weight_decay})
        state = self._make_state({}, tx, with_ema=self._with_teacher())
        step = self._build_finetune_step(tx, **kwargs)
        loader_iter = iter(self._fine_tune_loader)
        pretrain_iter = iter(self._pretrain_loader) if self._with_teacher() else None

        def batches():
            def host_iter():
                while True:
                    lab = next(loader_iter)
                    out = {"image": lab["image"], "target": lab["target"],
                           "group": lab["group"]}
                    if pretrain_iter is not None:
                        unlab = next(pretrain_iter)
                        out["unlabeled_image"] = unlab["image"]
                    yield out
            return prefetch_to_device(host_iter(), self._mesh)

        if checkpoint is not None:
            state, meta = load_checkpoint(Path(checkpoint) / "finetune" / LAST_NAME, state)
            self._start_epoch = int(meta.get("cur_epoch", -1)) + 1
            self._best_score = float(meta.get("best_score", -1.0))
        schedule = lambda e: self._phase_lr(e, lr, multiplier, warmup_max,
                                            self._max_epoch_finetune, 5e-7)
        meters = ["sup_loss"] + (["reg_loss"] if self._with_teacher() else [])
        state = self._run_phase(
            phase_name="finetune", step_fn=step, state=state, batches_fn=batches,
            max_epoch=self._max_epoch_finetune, lr_schedule=schedule,
            storage=self._finetune_storage, writer=writer,
            meters_names=meters, income_key="finetune", save_best=True)
        self._absorb_state(state)

    def _with_teacher(self) -> bool:
        return False

    def _build_finetune_step(self, tx, **kwargs):
        return build_finetune_step(self._model, tx, num_classes=self._num_classes)

    # ----- orchestration ------------------------------------------------
    def start_training(
        self,
        checkpoint: Optional[str] = None,
        pretrain_encoder_init_options: Optional[Dict[str, Any]] = None,
        pretrain_decoder_init_options: Optional[Dict[str, Any]] = None,
        finetune_network_init_options: Optional[Dict[str, Any]] = None,
    ) -> float:
        enc_opt = dict(pretrain_encoder_init_options or {"group_option": "partition"})
        dec_opt = dict(pretrain_decoder_init_options or {})
        fin_opt = dict(finetune_network_init_options or {})
        with SummaryWriter(self._save_dir) as writer:
            if self.train_encoder:
                self.pretrain_encoder(writer, checkpoint=checkpoint, **enc_opt)
            if self.train_decoder:
                self.pretrain_decoder(writer, checkpoint=checkpoint, **dec_opt)
            self.finetune(writer, checkpoint=checkpoint, **fin_opt)
        return self._best_score


class ContrastTrainerMT(ContrastTrainer):
    """Finetune phase replaced by mean-teacher; eval on the teacher."""

    name = "contrastMT"

    def _with_teacher(self) -> bool:
        return True

    def _build_finetune_step(self, tx, *, reg_weight: float = 10.0,
                             alpha: float = 0.999, ema_weight_decay: float = 1e-6,
                             **kwargs):
        return build_finetune_mt_step(
            self._model, tx, num_classes=self._num_classes,
            reg_weight=reg_weight, ema_alpha=alpha,
            ema_weight_decay=ema_weight_decay)

    def _eval_phase(self, state: TrainState, use_teacher: bool = True):
        if state.ema_params is not None:
            return super()._eval_phase(state, use_teacher=True)
        return super()._eval_phase(state, use_teacher=False)


class IICContrastTrainer(ContrastTrainer):
    """Pretrain phases get a parallel IIC cluster-head branch."""

    name = "iiccontrast"

    def _encoder_iic_branch(self, extract_position, heads, head_options):
        opts = dict(head_options)
        iic_head = ClusterHead(
            num_clusters=int(opts.get("num_clusters", 10)),
            num_subheads=int(opts.get("num_subheads", 10)),
            head_type=opts.get("ctype", "linear"),
            T=float(opts.get("ctemperature", 1.0)),
        )
        heads = dict(heads)
        heads["iic"] = self._init_head(iic_head, extract_position, 17)
        extra = dict(
            iic_weight=float(opts.get("iic_weight", 1.0)),
            disable_contrastive=bool(opts.get("disable_contrastive", False)),
        )
        return iic_head, heads, extra

    def _decoder_iic_branch(self, extract_position, heads, head_options):
        opts = dict(head_options)
        iic_head = LocalClusterHead(
            num_clusters=int(opts.get("num_clusters", 20)),
            num_subheads=int(opts.get("num_subheads", 10)),
            head_type=opts.get("ctype", "mlp"),
            T=float(opts.get("ctemperature", 1.0)),
        )
        heads = dict(heads)
        heads["iic"] = self._init_head(iic_head, extract_position, 19)
        extra = dict(
            iic_weight=float(opts.get("iic_weight", 1.0)),
            disable_contrastive=bool(opts.get("disable_contrastive", False)),
            iic_padding=int(opts.get("padding", 0)),
            iic_patch_size=int(opts.get("patch_size", 512)),
        )
        return iic_head, heads, extra


pretrain_zoos = {
    "contrast": ContrastTrainer,
    "contrastMT": ContrastTrainerMT,
    "iiccontrast": IICContrastTrainer,
}
