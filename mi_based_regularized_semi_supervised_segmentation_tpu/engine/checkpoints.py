"""Checkpoint / resume: last + best policy over the TrainState PyTree.

Parity with the reference's most developed subsystem (WHEEL::deepclustering2/
trainer/_io.py:84-223): ``save()`` writes last.ckpt every epoch and best.ckpt
on val-score improvement; loading accepts a file or a directory (-> last.ckpt
inside); resume restores epoch counters, best score, and metric history;
config.yaml is snapshotted into the run dir at init.

Serialization: flax msgpack for the device PyTree + a JSON sidecar for host
metadata (epoch, best score, Storage history). Single-file, atomic-rename."""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization

from .state import TrainState

LAST_NAME = "last.ckpt"
BEST_NAME = "best.ckpt"


def save_checkpoint(path: str | Path, state: TrainState, meta: Dict[str, Any]) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    state = jax.device_get(state)
    payload = serialization.to_bytes(state)
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    meta_tmp = path.with_suffix(".meta.tmp")
    with open(meta_tmp, "w") as f:
        json.dump(meta, f)
    os.replace(meta_tmp, path.with_suffix(".meta.json"))


def load_checkpoint(
    path: str | Path, template: TrainState
) -> Tuple[TrainState, Dict[str, Any]]:
    """``path``: checkpoint file or run directory (-> last.ckpt)."""
    path = Path(path)
    if path.is_dir():
        path = path / LAST_NAME
    if not path.exists():
        raise FileNotFoundError(str(path))
    with open(path, "rb") as f:
        state = serialization.from_bytes(template, f.read())
    meta_path = path.with_suffix(".meta.json")
    meta: Dict[str, Any] = {}
    if meta_path.exists():
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
