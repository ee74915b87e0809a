"""Device-resident data pipeline: whole dataset in HBM, augmentation in-step.

The reference streamed PNG slices through 4 torch DataLoader worker processes
per loader (SURVEY §2.6); on TPU the preprocessed ACDC corpus is a few
hundred MB of uint8 — small enough to stage into HBM ONCE. Each train step
then gathers its slice indices (the only per-step host input: a handful of
int32s) and runs the full augmentation pipeline fused into the jitted step
(ops/augment_device.py). This removes the host round-trip entirely — batches
"stream without host round-trips" per the rebuild's north star — and is the
only viable path on hosts with thin links to the accelerator.

Images of varying sizes are padded to a common [Hmax, Wmax] canvas (centered)
before staging; each slice's valid window (size + offset) is staged alongside
so the in-step random crop samples offsets INSIDE the valid window
(pad-if-small semantics when the slice is narrower than the crop), matching
the reference's RandomCrop rather than cropping zero canvas borders.

With a mesh, arrays are replicated across devices (NamedSharding(mesh, P()))
so batch-sharded index gathers stay local to each device.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .acdc import ACDCDataset
from .sampler import InfiniteRandomSampler, PatientSampler


class DeviceDataStore:
    """Staged dataset: images [N, H, W] uint8, labels [N, H, W] uint8 on
    device, plus host-side metadata (stems, groups, partitions) and the
    device-resident per-slice valid windows (valid_hw_dev / offsets_dev)."""

    def __init__(self, dataset: ACDCDataset, pad_to: Optional[Tuple[int, int]] = None,
                 device=None, mesh=None, pack: bool = False) -> None:
        n = len(dataset)
        assert n > 0
        shapes = []
        raws = []
        for i in range(n):
            img, gt, stem = dataset.load_raw(i)
            raws.append((img, gt, stem))
            shapes.append(img.shape)
        hmax = max(s[0] for s in shapes)
        wmax = max(s[1] for s in shapes)
        if pad_to is not None:
            hmax, wmax = max(hmax, pad_to[0]), max(wmax, pad_to[1])
        images = np.zeros((n, hmax, wmax), np.uint8)
        labels = np.zeros((n, hmax, wmax), np.uint8)
        self.stems: List[str] = []
        self.valid_hw = np.zeros((n, 2), np.int32)
        self.offsets = np.zeros((n, 2), np.int32)
        for i, (img, gt, stem) in enumerate(raws):
            h, w = img.shape
            top, left = (hmax - h) // 2, (wmax - w) // 2
            images[i, top:top + h, left:left + w] = np.clip(img * 255.0, 0, 255).astype(np.uint8)
            labels[i, top:top + h, left:left + w] = gt.astype(np.uint8)
            self.stems.append(stem)
            self.valid_hw[i] = (h, w)
            self.offsets[i] = (top, left)
        if mesh is not None and device is None:
            device = NamedSharding(mesh, P())  # replicated: local gathers
        self.images = jax.device_put(images, device)
        self.labels = jax.device_put(labels, device)
        # pack=True (labeled train stores): image and label interleaved into
        # ONE uint16 plane (img<<8 | label) so the in-step augmentation
        # gathers the pair with a single element gather — the gather is
        # per-element serialized on the TPU core (~13 cycles/element,
        # ops/augment_device.py), so halving the gathered element count
        # halves its cost. Costs 2 extra bytes/px of HBM for the store.
        self.packed = (
            jax.device_put((images.astype(np.uint16) << 8) | labels, device)
            if pack else None
        )
        self.valid_hw_dev = jax.device_put(self.valid_hw, device)
        self.offsets_dev = jax.device_put(self.offsets, device)
        self.groups = [dataset.get_group(s) for s in self.stems]
        self.partitions = [dataset.get_partition(s) for s in self.stems]
        self.shape = (hmax, wmax)

    def __len__(self) -> int:
        return self.images.shape[0]


class DeviceIndexLoader:
    """Yields per-step int32 index arrays (the only host->device traffic)
    with the InfiniteRandomSampler's reshuffled-epoch semantics, plus the
    host-side group names for dice metering."""

    def __init__(self, store: DeviceDataStore, batch_size: int, shuffle: bool = True,
                 seed: int = 0) -> None:
        self._store = store
        self._batch = batch_size
        self._sampler = InfiniteRandomSampler(len(store), shuffle=shuffle, seed=seed)

    @property
    def store(self) -> DeviceDataStore:
        return self._store

    def __iter__(self) -> Iterator[Dict[str, object]]:
        it = iter(self._sampler)
        while True:
            idx = [next(it) for _ in range(self._batch)]
            yield {
                "indices": np.asarray(idx, np.int32),
                "group": [self._store.groups[i] for i in idx],
            }


class DevicePatientEvalLoader:
    """Patient-grouped eval over a device store: yields padded index arrays
    + masks; slices stay on device (center-crop happens in the eval step)."""

    def __init__(self, store: DeviceDataStore, pad_multiple: int = 8) -> None:
        self._store = store
        self._sampler = PatientSampler(store.stems, lambda s: _group_of(store, s))
        counts = [len(v) for v in self._sampler]
        maxn = max(counts) if counts else 1
        self._padded = ((maxn + pad_multiple - 1) // pad_multiple) * pad_multiple

    @property
    def store(self) -> DeviceDataStore:
        return self._store

    @property
    def padded_size(self) -> int:
        return self._padded

    def __len__(self) -> int:
        return len(self._sampler)

    def __iter__(self):
        for patient, indices in zip(self._sampler.patients, self._sampler):
            n = len(indices)
            idx = np.zeros(self._padded, np.int32)
            idx[:n] = indices
            mask = np.zeros(self._padded, np.bool_)
            mask[:n] = True
            yield {
                "indices": idx,
                "mask": mask,
                "group": patient,
                "filename": [self._store.stems[i] for i in indices],
            }


def _group_of(store: DeviceDataStore, stem: str) -> str:
    return store.groups[store.stems.index(stem)]
