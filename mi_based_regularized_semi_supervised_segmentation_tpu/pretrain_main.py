"""Contrastive pretraining entry point.

The reference shipped no CLI for its `contrastyou` pipeline; this exposes it
with the same dotted-override config surface as the semi-supervised entry:

    python -m mi_based_regularized_semi_supervised_segmentation_tpu.pretrain_main \
        Trainer.name=contrastMT Trainer.save_dir=mt_run
"""

from __future__ import annotations

import sys
from typing import List, Optional

import jax

from . import DATA_PATH, PROJECT_PATH
from .config import ConfigManager
from .config.manager import load_yaml
from .data import (
    ACDCSemiInterface,
    ACDCStrongTransforms,
    PatientEvalLoader,
    SegmentationLoader,
    TwiceLoader,
    generate_synthetic_acdc,
)
from .data.sampler import ContrastBatchSampler
from .engine import pretrain_zoos
from .parallel import make_mesh
from .utils import gethash, set_seed

from pathlib import Path

PRETRAIN_CONFIG_PATH = str(Path(__file__).resolve().parent / "config" / "pretrain.yaml")


def main(argv: Optional[List[str]] = None):
    cmanager = ConfigManager(default_path=PRETRAIN_CONFIG_PATH,
                             argv=argv if argv is not None else sys.argv[1:])
    config = cmanager.config
    set_seed(int(config.get("RandomSeed", 1)))

    if config.get("Data", {}).get("synthetic"):
        generate_synthetic_acdc(DATA_PATH)
    data_root = config.get("Data", {}).get("root_dir") or DATA_PATH

    interface = ACDCSemiInterface(
        root_dir=data_root,
        labeled_data_ratio=config["Data"]["labeled_data_ratio"],
        unlabeled_data_ratio=config["Data"]["unlabeled_data_ratio"],
    )
    labeled_set, unlabeled_set, test_set = interface.create_semi_supervised_datasets()

    seed = int(config.get("RandomSeed", 10))
    pcfg = config.get("PretrainData", {})
    sampler = ContrastBatchSampler(
        unlabeled_set.stems, unlabeled_set.get_group, unlabeled_set.get_partition,
        group_sample_num=int(pcfg.get("group_sample_num", 4)),
        partition_sample_num=int(pcfg.get("partition_sample_num", 1)),
        seed=seed,
    )
    pretrain_loader = TwiceLoader(
        unlabeled_set, ACDCStrongTransforms.pretrain, batch_sampler=sampler,
        seed=seed, num_workers=int(pcfg.get("num_workers", 4)),
    )
    fcfg = config.get("FineTuneData", {})
    fine_tune_loader = SegmentationLoader(
        labeled_set, ACDCStrongTransforms.pretrain,
        batch_size=int(fcfg.get("batch_size", 4)), seed=seed + 1,
        num_workers=int(fcfg.get("num_workers", 4)),
    )
    val_loader = PatientEvalLoader(test_set, ACDCStrongTransforms.val)

    trainer_cfg = dict(config["Trainer"])
    name = trainer_cfg.pop("name")
    Trainer = pretrain_zoos[name]

    parallel_cfg = config.get("Parallel", {}) or {}
    n_devices = parallel_cfg.get("num_devices") or len(jax.devices())
    mesh = make_mesh(n_devices) if n_devices > 1 else None

    trainer = Trainer(
        pretrain_loader=pretrain_loader,
        fine_tune_loader=fine_tune_loader,
        val_loader=val_loader,
        configuration={**config, "GITHASH": gethash(PROJECT_PATH)},
        mesh=mesh,
        **trainer_cfg,
    )

    enc_opt = dict(config.get("PretrainEncoder", {}))
    dec_opt = dict(config.get("PretrainDecoder", {}))
    fin_opt = dict(config.get("FinetuneNetwork", {}))
    if name == "contrast":
        fin_opt = {k: fin_opt[k] for k in ("lr", "weight_decay", "multiplier", "warmup_max")
                   if k in fin_opt}
    if name == "iiccontrast":
        iic_cfg = config.get("IICHead", {})
        enc_opt.update(iic_cfg.get("Encoder", {}))
        dec_opt.update(iic_cfg.get("Decoder", {}))

    trainer.start_training(
        checkpoint=config.get("Checkpoint"),
        pretrain_encoder_init_options=enc_opt,
        pretrain_decoder_init_options=dec_opt,
        finetune_network_init_options=fin_opt,
    )
    return trainer


if __name__ == "__main__":
    main()
