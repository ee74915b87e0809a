"""Multi-seed capability study on the hard synthetic ACDC fixture.

Reproduces the reference's headline ORDERING claim (README.md:42-43:
udaiic > {uda, iic} > ps, fs highest) with 3 seeds x 5 modes at a
reference-shaped budget, on data hard enough that partial supervision
underfits. Appends one JSON line per completed run to results.jsonl
(resumable: completed (mode, seed) pairs are skipped) and writes a
markdown summary table at the end.

Usage:
    python scripts/capability_study.py [--out runs/study] [--quick]

~7 min/run on one v5e (50 epochs x 120 steps, device-resident data +
epoch-as-one-program); 15 runs ~= 2 h. --quick cuts to 2 epochs for CI.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = (10, 20, 30)
MODES = ("partial", "uda", "iic", "udaiic", "fs")


def build_config(mode: str, seed: int, save_dir: str, epochs: int, batches: int,
                 stem: str = "conv", geometry: str = "fused",
                 precision: str = "bfloat16", bn_dtype: str = "",
                 augment: str = "draw"):
    labeled_ratio = 1.0 if mode == "fs" else 0.05
    unlabeled_ratio = 0.0 if mode == "fs" else 0.95
    trainer_name = "partial" if mode == "fs" else mode
    return {
        "RandomSeed": seed,
        "Arch": {"input_dim": 1, "num_classes": 4, "stem": stem},
        "Optim": {"name": "Adam", "lr": 1e-7, "weight_decay": 1e-5},
        "Scheduler": {"name": "GradualWarmupScheduler", "multiplier": 400,
                      "warmup_max": 10},
        "Data": {"name": "acdc", "labeled_data_ratio": labeled_ratio,
                 "unlabeled_data_ratio": unlabeled_ratio},
        "LabeledData": {"batch_size": 4, "shuffle": True},
        "UnlabeledData": {"batch_size": 10, "shuffle": True},
        "Trainer": {"name": trainer_name, "save_dir": save_dir,
                    "device": "tpu", "num_batches": batches,
                    "max_epoch": epochs, "device_data": True,
                    "epoch_scan": True, "progress": False,
                    "feature_names": ["Conv5", "Up_conv3", "Up_conv2"],
                    "feature_importance": [1.0, 0.5, 0.5]},
        "Precision": {"compute_dtype": precision,
                      "bn_dtype": bn_dtype or precision},
        "Kernel": {"geometry": geometry, "augment": augment},
        "UDARegCriterion": {"name": "mse", "weight": 10.0},
        "IICRegParameters": {
            "EncoderParams": {"num_clusters": 20, "num_subheads": 5,
                              "head_types": "linear", "normalize": False},
            "DecoderParams": {"num_clusters": 20, "num_subheads": 5,
                              "head_types": "linear", "normalize": False},
            "LossParams": {"paddings": [1, 3], "patch_sizes": 1024},
            "weight": 0.1,
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/study")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batches", type=int, default=None)
    ap.add_argument("--seeds", type=int, nargs="*", default=None)
    ap.add_argument("--modes", nargs="*", default=None)
    ap.add_argument("--fixture", choices=["v1", "v2", "v3"], default="v1",
                    help="v2: cross-scale class-diagnostic texture so the "
                         "local-MI term has real signal (VERDICT r2 item 5); "
                         "v3: v2 texture + randomized per-patient intensity "
                         "ordering — partial supervision underfits harder "
                         "(VERDICT r4 item 9 headroom fixture)")
    ap.add_argument("--stem", choices=["conv", "s2d"], default="conv",
                    help="s2d: experimental space-to-depth stem "
                         "(capability spot-check for the conv-floor lever)")
    ap.add_argument("--geometry", choices=["fused", "sequential", "shear"],
                    default="fused",
                    help="shear: Pallas 3-shear roll rotation "
                         "(capability spot-check for the rotation lever)")
    ap.add_argument("--augment", choices=["draw", "epoch"], default="draw",
                    help="epoch: per-epoch store pre-augmentation "
                         "(Kernel.augment=epoch capability gate, r5)")
    ap.add_argument("--precision", choices=["bfloat16", "float32"],
                    default="bfloat16",
                    help="float32: fp32-parity capability spot-check "
                         "(VERDICT r3 weak item 4)")
    ap.add_argument("--bn-dtype", choices=["", "bfloat16", "float32"],
                    default="",
                    help="BatchNorm dtype override (default: follow "
                         "--precision). bfloat16 compute + float32 BN is "
                         "the mixed-precision capability probe")
    ap.add_argument("--resume", action="store_true",
                    help="continue an interrupted run from its last.ckpt "
                         "(epoch/best/storage restored) instead of "
                         "restarting from scratch")
    args = ap.parse_args()

    epochs = args.epochs or (2 if args.quick else 50)
    batches = args.batches or (2 if args.quick else 120)
    seeds = tuple(args.seeds) if args.seeds else ((SEEDS[0],) if args.quick else SEEDS)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_study_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mi_based_regularized_semi_supervised_segmentation_tpu.data import (
        create_val_loader,
        get_dataloaders,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.data.synthetic import (
        generate_synthetic_acdc as _gen,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine import trainer_zoos
    from mi_based_regularized_semi_supervised_segmentation_tpu.utils import set_seed

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    results_path = out_dir / "results.jsonl"
    # Resume key includes the variant axes (fixture/stem/geometry) so a
    # re-run with a different variant against the same --out re-runs
    # instead of silently skipping and re-summarizing the old rows. Rows
    # written before these fields existed default to the CURRENT
    # invocation's values (out dirs are per-variant by convention), so
    # resuming an in-flight directory keeps working.
    variant = {"fixture": args.fixture, "stem": args.stem,
               "geometry": args.geometry, "precision": args.precision,
               "bn_dtype": args.bn_dtype or args.precision,
               "augment": args.augment}

    def run_key(r):
        return (r["mode"], r["seed"],
                r.get("fixture", variant["fixture"]),
                r.get("stem", variant["stem"]),
                r.get("geometry", variant["geometry"]),
                # every row written before this field existed was bfloat16,
                # so the missing-field default is factual, not invocation-tied
                r.get("precision", "bfloat16"),
                # rows written before bn_dtype existed used bn == compute
                r.get("bn_dtype", r.get("precision", "bfloat16")),
                # rows written before the augment axis existed were draw
                r.get("augment", "draw"))

    done = set()
    if results_path.exists():
        for line in results_path.read_text().splitlines():
            r = json.loads(line)
            done.add(run_key(r))

    # HARD fixture: 40 train patients (5% labels = 2 patients), noisy
    # low-contrast phantoms — partial supervision underfits here.
    default_root = {"v1": "/tmp/study_data", "v2": "/tmp/study_data_v2",
                    "v3": "/tmp/study_data_v3"}[args.fixture]
    data_root = os.environ.get("STUDY_DATA", default_root)
    _gen(data_root, num_train_patients=40, num_val_patients=8,
         slices_per_patient=10, size=256, hard=True, seed=0,
         v2=args.fixture == "v2", v3=args.fixture == "v3")

    modes = tuple(args.modes) if args.modes else MODES
    for mode in modes:
        for seed in seeds:
            if (mode, seed, args.fixture, args.stem, args.geometry,
                    args.precision, variant["bn_dtype"], args.augment) in done:
                print(f"[study] skip {mode} seed {seed} (done)", flush=True)
                continue
            set_seed(seed)
            cfg = build_config(mode, seed, f"study/{mode}_s{seed}", epochs, batches,
                               stem=args.stem, geometry=args.geometry,
                               precision=args.precision, bn_dtype=args.bn_dtype,
                               augment=args.augment)
            labeled, unlabeled, test = get_dataloaders(cfg, data_root=data_root)
            val = create_val_loader(unlabeled, test)
            Trainer = trainer_zoos[cfg["Trainer"]["name"]]
            tcfg = dict(cfg["Trainer"])
            tcfg.pop("name")
            trainer = Trainer(
                labeled_loader=labeled, unlabeled_loader=unlabeled,
                val_loader=val, test_loader=test, configuration=cfg,
                run_dir=str(out_dir),
                save_dir=f"{mode}_s{seed}",
                max_epoch=epochs, num_batches=batches,
                device=tcfg.get("device", "tpu"),
            )
            trainer.init()
            last = out_dir / f"{mode}_s{seed}" / "last.ckpt"
            if args.resume and last.exists():
                trainer.load_state_dict_from_path(str(last))
                print(f"[study] {mode} seed {seed}: resuming after epoch "
                      f"{trainer._cur_epoch}", flush=True)
            print(f"[study] {mode} seed {seed}: {epochs} epochs x {batches}",
                  flush=True)
            best = trainer.start_training()
            row = {"mode": mode, "seed": seed, "best_val_dsc": float(best),
                   "epochs": epochs, "batches": batches, **variant}
            with open(results_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"[study] DONE {mode} seed {seed}: best val DSC {best:.4f}",
                  flush=True)

    # summary table — dedup by full run key (last row wins) so appended
    # re-runs or merged files never double-count a (mode, seed)
    rows = [json.loads(l) for l in results_path.read_text().splitlines()]
    by_key = {}
    for r in rows:
        by_key[run_key(r)] = r
    by_mode = {}
    for r in by_key.values():
        by_mode.setdefault(r["mode"], []).append(r["best_val_dsc"])
    lines = ["| mode | seeds | best val DSC (mean ± range) |",
             "|---|---|---|"]
    import numpy as np

    for mode in modes:
        v = by_mode.get(mode, [])
        if not v:
            continue
        lines.append(
            f"| {mode} | {len(v)} | {np.mean(v):.4f} "
            f"({np.min(v):.4f}–{np.max(v):.4f}) |")
    (out_dir / "SUMMARY.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines), flush=True)


if __name__ == "__main__":
    main()
