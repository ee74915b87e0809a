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

    # Precision.matmul_precision governs XLA's default dot/conv precision
    # (fp32 inputs only; bf16 compute is selected via compute_dtype).
    precision_cfg = config.get("Precision", {}) or {}
    matmul_precision = precision_cfg.get("matmul_precision")
    if matmul_precision:
        jax.config.update("jax_default_matmul_precision", str(matmul_precision))

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
    if parallel_cfg.get("multihost"):
        from .parallel import initialize_multihost

        initialize_multihost(
            coordinator_address=parallel_cfg.get("coordinator_address"),
            num_processes=parallel_cfg.get("num_processes"),
            process_id=parallel_cfg.get("process_id"),
        )
    n_devices = parallel_cfg.get("num_devices") or len(jax.devices())
    space_size = int(parallel_cfg.get("space_size", 1) or 1)
    mesh = (
        make_mesh(
            n_devices,
            data_axis=parallel_cfg.get("data_axis", "data"),
            space_axis="space" if space_size > 1 else None,
            space_size=space_size,
        )
        if n_devices > 1
        else None
    )

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
