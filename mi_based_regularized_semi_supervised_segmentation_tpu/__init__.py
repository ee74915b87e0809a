"""TPU-native framework for MI-regularized semi-supervised segmentation.

A from-scratch JAX/XLA/Pallas/pjit rebuild with the capabilities of
jizongFox/MI-based-Regularized-Semi-supervised-Segmentation: 2D U-Net training on
ACDC cardiac MRI with a small labeled fraction, regularized by UDA softmax
consistency between twin augmented views and IIC-style global/local mutual
information maximization over cluster-head outputs at multiple U-Net feature
positions (reference entry: /root/reference/semi_seg/main.py), plus the
companion contrastive (SupCon) pretraining / mean-teacher pipeline
(reference: /root/reference/contrastyou/trainer/contrast_trainer.py).

Design is idiomatic TPU rather than a port: one jitted functional train step
over a TrainState PyTree, keyed (not seed-replayed) paired augmentation,
a fused Pallas kernel for the displaced-MI joint distribution, mesh data
parallelism via jax.sharding, and the same `semi.yaml` + dotted-key CLI
config surface.
"""

import os
from pathlib import Path

PROJECT_PATH = str(Path(__file__).resolve().parents[1])
# Mirrors reference contrastyou/__init__.py:1-10 (DATA_PATH = <repo>/.data, auto-mkdir)
DATA_PATH = os.environ.get("MISST_DATA_PATH", str(Path(PROJECT_PATH) / ".data"))
Path(DATA_PATH).mkdir(exist_ok=True, parents=True)

__version__ = "0.1.0"
