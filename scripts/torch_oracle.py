"""Run the ACTUAL PyTorch reference training loop as a capability oracle.

VERDICT r3 items 1+2: the parity suite (tests/test_torch_parity.py) pins the
losses/model pieces; this driver closes the remaining gap by running the
reference's REAL trainer (/root/reference/semi_seg/trainer.py:24-206 +
epocher.py:110-323) end to end on the same synthetic ACDC fixture our
framework trains on, CPU fp32, and recording per-epoch sup-loss / val-DSC
trajectories plus the measured per-step wall time (the same-silicon
throughput denominator for BASELINE.md).

The reference is loaded AT RUNTIME from a /tmp working copy (the mount is
read-only and its package __init__ needs a writable tree): nothing is
vendored into this repo. Shims bridge the 2020-era dependency surface to
this environment (torch 2.x removed torch._six; python 3.12 removed the
collections ABC aliases; torchvision/medpy/torch_optimizer are absent —
a minimal PIL-faithful torchvision subset is provided below, matching
torchvision 0.7 semantics for exactly the ops the ACDC pipeline uses).

Usage:
    python scripts/torch_oracle.py --modes partial udaiic --seeds 10 20 \
        --epochs 5 --batches 20 --out runs/torch_oracle
    python scripts/torch_oracle.py --time-step            # step-timing only
"""
from __future__ import annotations

import argparse
import json
import numbers
import os
import random
import shutil
import sys
import time
import types
import zipfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
ORACLE_ROOT = Path(os.environ.get("ORACLE_ROOT", "/tmp/ref_oracle"))

sys.path.insert(0, str(REPO))


# ---------------------------------------------------------------------------
# working tree + shims
# ---------------------------------------------------------------------------

def prepare_tree():
    ORACLE_ROOT.mkdir(parents=True, exist_ok=True)
    if not (ORACLE_ROOT / "deepclustering2").exists():
        with zipfile.ZipFile(REF / "deepclustering2-2.0.0-py3-none-any.whl") as z:
            z.extractall(ORACLE_ROOT)
    for sub in ("contrastyou", "semi_seg", "config"):
        dst = ORACLE_ROOT / sub
        if not dst.exists():
            shutil.copytree(REF / sub, dst)


def _build_torchvision():
    """Minimal torchvision matching 0.7 semantics for the ACDC path:
    transforms.{Compose,ToTensor,ColorJitter} + transforms.functional
    {to_tensor,rotate,crop,center_crop,hflip,vflip,pad,resize,to_grayscale}.
    Everything else the wheel's unused dataset helpers construct at import
    time is a permissive inert stub."""
    import torch
    from PIL import Image, ImageEnhance, ImageOps

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    fn = types.ModuleType("torchvision.transforms.functional")
    ds = types.ModuleType("torchvision.datasets")

    def to_tensor(pic):
        if isinstance(pic, torch.Tensor):
            return pic
        if isinstance(pic, np.ndarray):
            arr = pic
        else:
            arr = np.array(pic)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.transpose(2, 0, 1)).contiguous()
        if t.dtype == torch.uint8:
            return t.float().div(255.0)
        return t.float()

    def rotate(img, angle, resample=0, expand=False, center=None, fill=None):
        kwargs = {}
        if fill is not None:
            kwargs["fillcolor"] = fill
        if isinstance(resample, bool):  # tv0.7 positional quirk
            resample = Image.NEAREST
        return img.rotate(angle, resample=resample, expand=expand,
                          center=center, **kwargs)

    def crop(img, top, left, height, width):
        return img.crop((left, top, left + width, top + height))

    def center_crop(img, output_size):
        if isinstance(output_size, numbers.Number):
            output_size = (int(output_size), int(output_size))
        w, h = img.size
        th, tw = output_size
        i = int(round((h - th) / 2.0))
        j = int(round((w - tw) / 2.0))
        return crop(img, i, j, th, tw)

    def hflip(img):
        return img.transpose(Image.FLIP_LEFT_RIGHT)

    def vflip(img):
        return img.transpose(Image.FLIP_TOP_BOTTOM)

    def pad(img, padding, fill=0, padding_mode="constant"):
        if padding_mode != "constant":
            raise NotImplementedError(padding_mode)
        if isinstance(padding, (list, tuple)):
            padding = tuple(int(p) for p in padding)
        return ImageOps.expand(img, border=padding, fill=fill)

    def resize(img, size, interpolation=Image.BILINEAR):
        if isinstance(size, int):
            w, h = img.size
            if (w <= h and w == size) or (h <= w and h == size):
                return img
            if w < h:
                return img.resize((size, int(size * h / w)), interpolation)
            return img.resize((int(size * w / h), size), interpolation)
        return img.resize(tuple(size[::-1]), interpolation)

    def to_grayscale(img, num_output_channels=1):
        img = img.convert("L")
        if num_output_channels == 3:
            img = img.convert("RGB")
        return img

    for f in (to_tensor, rotate, crop, center_crop, hflip, vflip, pad,
              resize, to_grayscale):
        setattr(fn, f.__name__, f)

    class Compose:
        def __init__(self, transforms_list):
            self.transforms = transforms_list

        def __call__(self, img):
            for t in self.transforms:
                img = t(img)
            return img

        def __repr__(self):
            return "Compose(%s)" % (self.transforms,)

    class ToTensor:
        def __call__(self, pic):
            return to_tensor(pic)

        def __repr__(self):
            return "ToTensor()"

    class ColorJitter:
        """torchvision 0.7 semantics: per-call uniform factor per enabled op,
        ops applied in random.shuffle order, python `random` stream (so the
        reference's FixRandomSeed synchronization applies)."""

        def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
            self.brightness = self._check(brightness)
            self.contrast = self._check(contrast)
            self.saturation = self._check(saturation)
            self.hue = self._check(hue, center=0, bound=(-0.5, 0.5),
                                   clip_first_on_zero=False)

        @staticmethod
        def _check(value, center=1, bound=(0, float("inf")),
                   clip_first_on_zero=True):
            if isinstance(value, numbers.Number):
                if value < 0:
                    raise ValueError(value)
                value = [center - value, center + value]
                if clip_first_on_zero:
                    value[0] = max(value[0], 0)
            value = [float(v) for v in value]
            if value[0] == value[1] == center:
                return None
            return value

        def __call__(self, img):
            ops = []
            if self.brightness is not None:
                b = random.uniform(*self.brightness)
                ops.append(lambda im: ImageEnhance.Brightness(im).enhance(b))
            if self.contrast is not None:
                c = random.uniform(*self.contrast)
                ops.append(lambda im: ImageEnhance.Contrast(im).enhance(c))
            if self.saturation is not None:
                s = random.uniform(*self.saturation)
                ops.append(lambda im: ImageEnhance.Color(im).enhance(s))
            if self.hue is not None:
                raise NotImplementedError("hue jitter not used by the ACDC path")
            random.shuffle(ops)
            for op in ops:
                img = op(img)
            return img

    def _inert(name):
        class _Stub:
            def __init__(self, *a, **k):
                pass

            def __call__(self, img):
                raise NotImplementedError(
                    f"torchvision shim: {name} is construct-only")
        _Stub.__name__ = name
        return _Stub

    tr.Compose = Compose
    tr.ToTensor = ToTensor
    tr.ColorJitter = ColorJitter
    tr.functional = fn
    for name in ("RandomRotation", "RandomHorizontalFlip", "RandomVerticalFlip",
                 "RandomCrop", "CenterCrop", "Resize", "Grayscale",
                 "RandomGrayscale", "RandomChoice", "RandomApply", "RandomOrder",
                 "Normalize", "Lambda", "Pad", "RandomResizedCrop",
                 "RandomAffine", "ToPILImage", "FiveCrop", "TenCrop"):
        setattr(tr, name, _inert(name))

    class _DatasetStub:
        def __init__(self, *a, **k):
            raise NotImplementedError("torchvision shim: datasets unavailable")

    class _DatasetsModule(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return _DatasetStub

    ds = _DatasetsModule("torchvision.datasets")
    tv.transforms = tr
    tv.datasets = ds
    tv.__version__ = "0.7.0-shim"
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = fn
    sys.modules["torchvision.datasets"] = ds


def install_shims():
    import collections
    import collections.abc as cabc

    for name in ("Iterator", "Iterable", "Mapping", "MutableMapping",
                 "Sequence", "MutableSequence", "Set", "MutableSet",
                 "Callable", "Container", "Hashable", "Sized"):
        if not hasattr(collections, name):
            setattr(collections, name, getattr(cabc, name))

    import math

    six = types.ModuleType("torch._six")
    six.container_abcs = cabc
    six.int_classes = int
    six.string_classes = str
    six.inf = math.inf
    six.nan = math.nan
    import queue as _queue

    six.queue = _queue
    six.FileNotFoundError = FileNotFoundError
    sys.modules.setdefault("torch._six", six)

    import tqdm.utils as tqdm_utils
    if not hasattr(tqdm_utils, "_basestring"):
        tqdm_utils._basestring = str
    if not hasattr(tqdm_utils, "_OrderedDict"):
        tqdm_utils._OrderedDict = collections.OrderedDict

    topt = types.ModuleType("torch_optimizer")
    topt.__all__ = []
    sys.modules.setdefault("torch_optimizer", topt)

    def _no_medpy(*a, **k):
        raise RuntimeError("medpy shim: surface metrics unavailable")

    medpy = types.ModuleType("medpy")
    metric = types.ModuleType("medpy.metric")
    binary = types.ModuleType("medpy.metric.binary")
    for name in ("hd", "assd", "__surface_distances", "hd95", "dc"):
        setattr(binary, name, _no_medpy)
    metric.binary = binary
    metric.assd = _no_medpy
    metric.hd = _no_medpy
    medpy.metric = metric
    sys.modules.setdefault("medpy", medpy)
    sys.modules.setdefault("medpy.metric", metric)
    sys.modules.setdefault("medpy.metric.binary", binary)

    import itertools

    import torch._utils as torch_utils
    if not hasattr(torch_utils, "_accumulate"):
        torch_utils._accumulate = lambda iterable, fn=None: itertools.accumulate(iterable)

    # torch 1.x Sampler.__init__ accepted data_source; 2.x removed it and the
    # wheel's samplers all call super().__init__(data_source)
    from torch.utils.data import Sampler as _TorchSampler

    _TorchSampler.__init__ = lambda self, data_source=None: None

    skimage = types.ModuleType("skimage")
    skio = types.ModuleType("skimage.io")

    def imsave(fname, arr, **kwargs):
        from PIL import Image as _Image

        a = np.asarray(arr)
        if a.dtype != np.uint8:
            a = np.clip(a, 0, 255).astype(np.uint8)
        _Image.fromarray(a).save(fname)

    skio.imsave = imsave
    skimage.io = skio
    sys.modules.setdefault("skimage", skimage)
    sys.modules.setdefault("skimage.io", skio)

    _build_torchvision()
    if str(ORACLE_ROOT) not in sys.path:
        sys.path.insert(0, str(ORACLE_ROOT))


# ---------------------------------------------------------------------------
# data: the SAME synthetic fixture the JAX capability studies use
# ---------------------------------------------------------------------------

def prepare_data(num_train=40, num_val=8, slices=10, size=256):
    from mi_based_regularized_semi_supervised_segmentation_tpu.data.synthetic import (
        generate_synthetic_acdc,
    )

    data_root = ORACLE_ROOT / ".data"
    generate_synthetic_acdc(str(data_root), num_train_patients=num_train,
                            num_val_patients=num_val,
                            slices_per_patient=slices, size=size, hard=True,
                            seed=0)
    # the reference asserts len(acdc_info) == 200 (real-ACDC patient count);
    # pad with entries for patients that have no files on disk — only groups
    # present in the tree are ever looked up (_get_partition by filename)
    info_path = data_root / "ACDC_contrast" / "acdc_info.npy"
    info = np.load(str(info_path), allow_pickle=True).item()
    if len(info) < 200:
        i = 900
        while len(info) < 200:
            info.setdefault(f"patient{i:03d}_00", slices)
            i += 1
        np.save(str(info_path), info, allow_pickle=True)
    return str(data_root)


def build_config(mode, seed, epochs, batches):
    """Mirror scripts/capability_study.py's flagship config surface on the
    reference's key schema (config/semi.yaml)."""
    labeled_ratio, unlabeled_ratio = 0.05, 0.95
    return {
        "RandomSeed": seed,
        "Arch": {"input_dim": 1, "num_classes": 4},
        "Optim": {"name": "Adam", "lr": 1e-7, "weight_decay": 1e-5},
        "Scheduler": {"name": "GradualWarmupScheduler", "multiplier": 400,
                      "warmup_max": 10},
        "Data": {"name": "acdc", "labeled_data_ratio": labeled_ratio,
                 "unlabeled_data_ratio": unlabeled_ratio},
        "LabeledData": {"batch_size": 4, "shuffle": True, "num_workers": 0},
        "UnlabeledData": {"batch_size": 10, "shuffle": True, "num_workers": 0},
        "Trainer": {"name": mode, "save_dir": f"{mode}_s{seed}",
                    "device": "cpu", "num_batches": batches,
                    "max_epoch": epochs,
                    "feature_names": ["Conv5", "Up_conv3", "Up_conv2"],
                    "feature_importance": [1.0, 0.5, 0.5]},
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


def run_reference(mode, seed, epochs, batches, out_dir: Path):
    import torch

    from deepclustering2.utils import set_benchmark
    from deepclustering2.loss import KL_div
    from contrastyou.arch import UNet
    from semi_seg.dataloader_helper import get_dataloaders, create_val_loader
    from semi_seg.trainer import trainer_zoos

    config = build_config(mode, seed, epochs, batches)
    set_benchmark(seed)

    labeled_loader, unlabeled_loader, test_loader = get_dataloaders(config)
    val_loader = create_val_loader(unlabeled_loader, test_loader)
    lab_patients = sorted({g for g in labeled_loader.dataset.show_groups()})
    print(f"[oracle] labeled patients: {lab_patients}", flush=True)

    trainer_config = dict(config["Trainer"])
    trainer_name = trainer_config.pop("name")
    Trainer = trainer_zoos[trainer_name]
    model = UNet(**config["Arch"])

    save_dir = out_dir / f"{mode}_s{seed}"
    trainer_config["save_dir"] = str(save_dir.resolve())
    trainer = Trainer(
        model=model, labeled_loader=iter(labeled_loader),
        unlabeled_loader=iter(unlabeled_loader),
        val_loader=val_loader, test_loader=test_loader,
        sup_criterion=KL_div(), configuration=config, **trainer_config,
    )
    trainer.init()
    t0 = time.perf_counter()
    trainer.start_training()
    wall = time.perf_counter() - t0

    import pandas as pd

    df = pd.read_csv(save_dir / "storage.csv")
    rows = []
    for _, r in df.iterrows():
        rows.append({
            "framework": "torch-reference", "mode": mode, "seed": seed,
            "epoch": int(r.get("epoch", _)),
            "sup_loss": float(r["tra_sup_loss_mean"]),
            "reg_loss": float(r.get("tra_reg_loss_mean", float("nan"))),
            "val_dsc": float(r["val_dice_DSC_mean"]),
            "test_dsc": float(r.get("test_dice_DSC_mean", float("nan"))),
        })
    best = max(r["val_dsc"] for r in rows)
    return {"rows": rows, "best_val_dsc": best, "wall_seconds": wall,
            "labeled_patients": lab_patients}


# ---------------------------------------------------------------------------
# step timing (measured same-silicon throughput denominator, VERDICT item 2)
# ---------------------------------------------------------------------------

def time_step(steps=10, mode="udaiic"):
    """Time the reference's udaiic train step (epocher.py:137-188 semantics:
    one concat forward over [4 labeled + 10 unlabeled + 10 tf], sup KL + UDA
    MSE + IIC global/local MI through the projector wrappers, Adam update)
    on random tensors — pure compute, no data loading, mirroring bench.py's
    bare-step accounting (24 slices/step)."""
    import torch
    from torch import nn

    from deepclustering2.loss import KL_div
    from deepclustering2.utils import class2one_hot
    from contrastyou.arch import UNet
    from contrastyou.helper import average_iter, weighted_average_iter
    from contrastyou.trainer._utils import ClusterHead
    from semi_seg._utils import FeatureExtractor, ProjectorWrapper, IICLossWrapper

    torch.manual_seed(0)
    feature_names = ["Conv5", "Up_conv3", "Up_conv2"]
    feature_importance = [x / 2.0 for x in [1.0, 0.5, 0.5]]
    model = UNet(input_dim=1, num_classes=4)
    projectors = ProjectorWrapper()
    projectors.init_encoder(feature_names=feature_names, num_clusters=20,
                            num_subheads=5, head_types="linear",
                            normalize=False)
    projectors.init_decoder(feature_names=feature_names, num_clusters=20,
                            num_subheads=5, head_types="linear",
                            normalize=False)
    iic_wrapper = IICLossWrapper(feature_names=feature_names,
                                 paddings=[1, 3], patch_sizes=1024)
    from itertools import chain

    opt = torch.optim.Adam(chain(model.parameters(), projectors.parameters()),
                           lr=1e-7, weight_decay=1e-5)
    sup_criterion = KL_div()
    reg_criterion = nn.MSELoss()

    lab = torch.rand(4, 1, 224, 224)
    lab_t = torch.randint(0, 4, (4, 224, 224))
    unlab = torch.rand(10, 1, 224, 224)
    unlab_tf = torch.rand(10, 1, 224, 224)

    def one_step():
        with FeatureExtractor(model, feature_names) as fextractor:
            logits = model(torch.cat([lab, unlab, unlab_tf], dim=0))
            lab_logits, unlab_logits, unlab_tf_logits = torch.split(
                logits, [4, 10, 10], dim=0)
            unlab_logits_tf = torch.flip(unlab_logits, dims=[2])
            onehot = class2one_hot(lab_t, 4)
            sup_loss = sup_criterion(lab_logits.softmax(1), onehot)
            uda_loss = reg_criterion(unlab_tf_logits.softmax(1),
                                     unlab_logits_tf.softmax(1).detach())
            iic_losses = []
            for feat, projector, criterion in zip(fextractor, projectors,
                                                  iic_wrapper):
                u = feat[len(feat) - 20:]
                u_plain, u_tf = torch.chunk(u, 2, dim=0)
                if isinstance(projector, ClusterHead):
                    u_plain_tf = u_plain
                else:
                    u_plain_tf = torch.flip(u_plain, dims=[2])
                prob1, prob2 = list(zip(*[
                    torch.chunk(x, 2, 0)
                    for x in projector(torch.cat([u_plain_tf, u_tf], dim=0))]))
                iic_losses.append(average_iter(
                    [criterion(x, y) for x, y in zip(prob1, prob2)]))
            iic_loss = weighted_average_iter(iic_losses, feature_importance)
            total = sup_loss + 10.0 * uda_loss + 0.1 * iic_loss
        opt.zero_grad()
        total.backward()
        opt.step()
        return float(total.detach())

    one_step()  # warm (allocator, oneDNN primitive caches)
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    elapsed = time.perf_counter() - t0
    per_step = elapsed / steps
    return {"mode": mode, "steps": steps, "sec_per_step": per_step,
            "slices_per_sec": 24.0 / per_step,
            "torch_threads": __import__("torch").get_num_threads()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="*", default=["partial", "udaiic"])
    ap.add_argument("--seeds", type=int, nargs="*", default=[10, 20])
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--out", default="runs/torch_oracle")
    ap.add_argument("--time-step", action="store_true")
    ap.add_argument("--time-steps", type=int, default=10)
    args = ap.parse_args()

    prepare_tree()
    install_shims()
    prepare_data()

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.time_step:
        rec = time_step(steps=args.time_steps)
        print(json.dumps(rec), flush=True)
        with open(out_dir / "step_timing.json", "w") as f:
            json.dump(rec, f, indent=1)
        return

    results_path = out_dir / "results.jsonl"
    done = set()
    if results_path.exists():
        for line in results_path.read_text().splitlines():
            r = json.loads(line)
            done.add((r["mode"], r["seed"]))
    for mode in args.modes:
        for seed in args.seeds:
            if (mode, seed) in done:
                print(f"[oracle] skip {mode} s{seed} (done)", flush=True)
                continue
            print(f"[oracle] {mode} seed {seed}: {args.epochs}x{args.batches}",
                  flush=True)
            res = run_reference(mode, seed, args.epochs, args.batches, out_dir)
            row = {"mode": mode, "seed": seed, "epochs": args.epochs,
                   "batches": args.batches, **res}
            with open(results_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"[oracle] DONE {mode} s{seed}: best={res['best_val_dsc']:.4f} "
                  f"wall={res['wall_seconds']:.0f}s", flush=True)


if __name__ == "__main__":
    main()
