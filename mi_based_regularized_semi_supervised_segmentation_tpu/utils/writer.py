"""Experiment writers: JSONL event log + optional TensorBoard.

Parity: WHEEL::deepclustering2/writer/SummaryWriter.py:15-54 — per-epoch
flattened scalar tags under tra/ val/ test/ sections. TensorBoard(X) is
optional in this image, so the always-on sink is a JSONL event stream
(events.jsonl) that tooling/pandas can consume; a real SummaryWriter is used
when importable."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Mapping

from .general import flatten_dict


class SummaryWriter:
    def __init__(self, save_dir: str | Path) -> None:
        self._dir = Path(save_dir)
        self._dir.mkdir(parents=True, exist_ok=True)
        self._events = open(self._dir / "events.jsonl", "a")
        self._tb = None
        try:  # pragma: no cover - optional dependency
            from torch.utils.tensorboard import SummaryWriter as TBWriter

            self._tb = TBWriter(log_dir=str(self._dir / "tensorboard"))
        except Exception:
            self._tb = None

    def add_scalars_from_income_dict(self, income: Mapping[str, Any], epoch: int) -> None:
        flat = {}
        for section, result in income.items():
            if result is None:
                continue
            for k, v in flatten_dict(result).items():
                try:
                    flat[f"{section}/{k}"] = float(v)
                except (TypeError, ValueError):
                    pass
        self._events.write(json.dumps({"epoch": int(epoch), **flat}) + "\n")
        self._events.flush()
        if self._tb is not None:
            for tag, value in flat.items():
                self._tb.add_scalar(tag, value, epoch)

    def close(self) -> None:
        self._events.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
