"""Experiment entry point.

Usage (same dotted-key surface as the reference semi_seg/main.py:19-45):

    python -m mi_based_regularized_semi_supervised_segmentation_tpu.main \
        Trainer.name=udaiic Trainer.save_dir=udaiic_run \
        UDARegCriterion.weight=10.0 IICRegParameters.weight=0.1

Flow: config (YAML + overrides) -> seed -> loaders (labeled/unlabeled/test +
val carved from unlabeled) -> trainer from registry -> optional checkpoint
resume -> start_training.
"""

from __future__ import annotations

import sys
from typing import List, Optional

import jax

from . import PROJECT_PATH
from .config import ConfigManager
from .data import create_val_loader, generate_synthetic_acdc, get_dataloaders
from .engine import trainer_zoos
from .parallel import make_mesh
from .utils import gethash, set_seed


def main(argv: Optional[List[str]] = None):
    cmanager = ConfigManager(argv=argv if argv is not None else sys.argv[1:])
    config = cmanager.config
    cur_githash = gethash(PROJECT_PATH)

    set_seed(int(config.get("RandomSeed", 1)))

    data_cfg = config.get("Data", {})
    if data_cfg.get("synthetic"):
        from . import DATA_PATH

        generate_synthetic_acdc(DATA_PATH)

    labeled_loader, unlabeled_loader, test_loader = get_dataloaders(config)
    val_loader = create_val_loader(unlabeled_loader, test_loader)

    trainer_config = dict(config["Trainer"])
    trainer_name = trainer_config.pop("name")
    Trainer = trainer_zoos[trainer_name]

    parallel_cfg = config.get("Parallel", {}) or {}
    n_devices = parallel_cfg.get("num_devices") or len(jax.devices())
    mesh = make_mesh(n_devices) if n_devices > 1 else None

    trainer = Trainer(
        labeled_loader=labeled_loader,
        unlabeled_loader=unlabeled_loader,
        val_loader=val_loader,
        test_loader=test_loader,
        configuration={**config, "GITHASH": cur_githash},
        mesh=mesh,
        **trainer_config,
    )
    trainer.init()
    checkpoint = config.get("Checkpoint")
    if checkpoint is not None:
        trainer.load_state_dict_from_path(checkpoint, strict=False)
    trainer.start_training()
    # Optional post-training inference pass with PNG dumps + Hausdorff
    # (reference kept this commented at semi_seg/main.py:45).
    if config.get("Inference"):
        report, score = trainer.inference()
        print(f"inference DSC_mean={score:.4f}")
    return trainer


if __name__ == "__main__":
    main()
