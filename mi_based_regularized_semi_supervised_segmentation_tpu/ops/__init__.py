from .losses import (
    kl_div,
    entropy,
    simplex_cross_entropy,
    jsd_div,
    mse_consistency,
    supcon_loss,
)
from .iic import iid_loss, compute_joint
from .iic_local import (
    iid_segmentation_loss,
    iid_segmentation_small_patch_loss,
    displaced_joint,
    displaced_joint_xla,
    mi_from_joint,
)
from .flips import sample_flip_mask, apply_flips

__all__ = [
    "kl_div",
    "entropy",
    "simplex_cross_entropy",
    "jsd_div",
    "mse_consistency",
    "supcon_loss",
    "iid_loss",
    "compute_joint",
    "iid_segmentation_loss",
    "iid_segmentation_small_patch_loss",
    "displaced_joint",
    "displaced_joint_xla",
    "mi_from_joint",
    "sample_flip_mask",
    "apply_flips",
]
