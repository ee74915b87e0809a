"""JAX side of the full-training-loop torch-parity study (VERDICT r3 item 1).

Trains OUR framework on the identical synthetic fixture / split / budget /
hyperparameters as scripts/torch_oracle.py drives the PyTorch reference
with, on the same CPU, fp32, host data path (the PairedTransform pipeline —
the tested distributional match for the reference's PIL transform chain),
and appends per-epoch rows in the same JSONL schema so
scripts/parity_report.py can overlay the trajectories.

Usage:
    python scripts/jax_parity_run.py --modes partial udaiic --seeds 10 20 \
        --epochs 5 --batches 20 --out runs/jax_parity
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_one(mode, seed, epochs, batches, out_dir: Path, data_root: str,
            device: str = "cpu"):
    from mi_based_regularized_semi_supervised_segmentation_tpu.data import (
        create_val_loader,
        get_dataloaders,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine import (
        trainer_zoos,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.utils import set_seed

    sys.path.insert(0, str(REPO / "scripts"))
    from capability_study import build_config

    set_seed(seed)
    cfg = build_config(mode, seed, f"{mode}_s{seed}", epochs, batches,
                       precision="float32")
    # Parity variant: host data path (PairedTransform), no epoch scan,
    # XLA backend for the MI joints — fp32 XLA is the numerics-parity mode
    # regardless of device (the 1-core host makes CPU runs of the heavier
    # modes compile-bound, so udaiic runs on the TPU chip instead).
    # xla_scan = same per-displacement fp32 HIGHEST einsums, lax.scan-
    # serialized so the fp32 backward fits a 16 GB chip (the unrolled 'xla'
    # variant OOMs by ~0.5 GB at B=10, paddings [1,3]).
    cfg["Trainer"].update(device=device, device_data=False, epoch_scan=False,
                          progress=False)
    cfg["Kernel"] = {"backend": "xla_scan" if device == "tpu" else "xla"}

    labeled, unlabeled, test = get_dataloaders(cfg, data_root=data_root)
    val = create_val_loader(unlabeled, test)
    lab_patients = sorted(labeled._dataset.get_group_list())
    print(f"[jax-parity] labeled patients: {lab_patients}", flush=True)

    Trainer = trainer_zoos[cfg["Trainer"]["name"]]
    trainer = Trainer(
        labeled_loader=labeled, unlabeled_loader=unlabeled,
        val_loader=val, test_loader=test, configuration=cfg,
        run_dir=str(out_dir), save_dir=f"{mode}_s{seed}",
        max_epoch=epochs, num_batches=batches, device=device,
    )
    trainer.init()
    t0 = time.perf_counter()
    best = trainer.start_training()
    wall = time.perf_counter() - t0

    import pandas as pd

    df = pd.read_csv(out_dir / f"{mode}_s{seed}" / "storage.csv")
    rows = []
    for _, r in df.iterrows():
        rows.append({
            "framework": "jax-tpu-rebuild", "mode": mode, "seed": seed,
            "epoch": int(r["epoch"]),
            "sup_loss": float(r["tra_sup_loss_mean"]),
            "reg_loss": float(r.get("tra_reg_loss_mean", float("nan"))),
            "val_dsc": float(r["val_dice_DSC_mean"]),
            "test_dsc": float(r.get("test_dice_DSC_mean", float("nan"))),
        })
    return {"rows": rows, "best_val_dsc": float(best), "wall_seconds": wall,
            "labeled_patients": lab_patients, "device": device}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="*", default=["partial", "udaiic"])
    ap.add_argument("--seeds", type=int, nargs="*", default=[10, 20])
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--out", default="runs/jax_parity")
    ap.add_argument("--data-root", default="/tmp/parity_data")
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_parity_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mi_based_regularized_semi_supervised_segmentation_tpu.data.synthetic import (
        generate_synthetic_acdc,
    )

    # the SAME fixture the oracle generates (v1-hard, 40/8 patients, seed 0)
    generate_synthetic_acdc(args.data_root, num_train_patients=40,
                            num_val_patients=8, slices_per_patient=10,
                            size=256, hard=True, seed=0)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    results_path = out_dir / "results.jsonl"
    done = set()
    if results_path.exists():
        for line in results_path.read_text().splitlines():
            r = json.loads(line)
            done.add((r["mode"], r["seed"]))
    for mode in args.modes:
        for seed in args.seeds:
            if (mode, seed) in done:
                print(f"[jax-parity] skip {mode} s{seed} (done)", flush=True)
                continue
            print(f"[jax-parity] {mode} seed {seed}: "
                  f"{args.epochs}x{args.batches}", flush=True)
            res = run_one(mode, seed, args.epochs, args.batches, out_dir,
                          args.data_root, device=args.device)
            row = {"mode": mode, "seed": seed, "epochs": args.epochs,
                   "batches": args.batches, **res}
            with open(results_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"[jax-parity] DONE {mode} s{seed}: "
                  f"best={res['best_val_dsc']:.4f} wall={res['wall_seconds']:.0f}s",
                  flush=True)


if __name__ == "__main__":
    main()
