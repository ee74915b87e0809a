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


def _flatten_tree(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_tree(v, prefix + (str(k),)))
    else:
        out[prefix] = tree
    return out


def lenient_load_checkpoint(
    path: str | Path, template: TrainState
) -> Tuple[TrainState, Dict[str, Any]]:
    """strict=False load: merge leaves by path where shapes match — the
    reference tolerated missing keys when fine-tuning from a different
    trainer's checkpoint (WHEEL::deepclustering2/trainer/_io.py:170-171).
    ``path``: checkpoint file or run directory (-> last.ckpt)."""
    from flax import serialization as _ser

    import numpy as np

    p = Path(path)
    if p.is_dir():
        p = p / LAST_NAME
    with open(p, "rb") as f:
        raw = _ser.msgpack_restore(f.read())
    flat_raw = _flatten_tree(raw)
    template = jax.device_get(template)
    state_dict = _ser.to_state_dict(template)
    # overlay matching leaves onto the template structure (preserves
    # empty-dict nodes that a flatten/unflatten round trip would drop)
    for key, raw_val in flat_raw.items():
        node = state_dict
        ok = True
        for part in key[:-1]:
            if not isinstance(node, dict) or part not in node:
                ok = False
                break
            node = node[part]
        if not ok or not isinstance(node, dict) or key[-1] not in node:
            continue
        tpl_val = node[key[-1]]
        if np.shape(raw_val) == np.shape(tpl_val):
            node[key[-1]] = raw_val
    state = _ser.from_state_dict(template, state_dict)
    meta_path = p.with_suffix(".meta.json")
    meta: Dict[str, Any] = {}
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
    return state, meta
