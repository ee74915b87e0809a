"""Device mesh + shardings: data parallelism over ICI via jax.sharding.

The reference had NO distributed path (single CUDA device, SURVEY §2.9);
parallelism here is a new first-class axis. Design: a 1-D (or 2-D) mesh with
a ``data`` axis; the global [B, H, W, C] batch is sharded on axis 0; params/
state are replicated. Everything runs under plain jit — XLA's SPMD
partitioner inserts the all-reduces for gradients and the cross-replica sums
for BatchNorm statistics, so sharded numerics match single-device numerics
exactly (global batch stats, global loss means).

An optional ``space`` mesh axis spatially shards the 224x224 activations
(XLA handles conv halo exchange); useful headroom if per-device batch ever
hits 1.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterable, Iterator, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    data_axis: str = "data",
    space_axis: Optional[str] = None,
    space_size: int = 1,
) -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    devices = np.asarray(devices[:n])
    if space_axis is not None and space_size > 1:
        assert n % space_size == 0, (n, space_size)
        return Mesh(devices.reshape(n // space_size, space_size), (data_axis, space_axis))
    return Mesh(devices, (data_axis,))


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host (DCN) bring-up: `jax.distributed.initialize`, the TPU-pod
    equivalent of the comm layer the reference never had (SURVEY §2.9/§5).
    On Cloud TPU the arguments are auto-detected from the metadata server;
    pass them explicitly elsewhere. Idempotent: a second call is a no-op."""
    import jax

    state = getattr(jax._src.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)


def make_multihost_mesh(
    data_axis: str = "data",
    devices: Optional[Sequence[Any]] = None,
    process_count: Optional[int] = None,
) -> Mesh:
    """Process-count-aware mesh over ALL global devices (call after
    `initialize_multihost`). The data axis is laid out process-major —
    device order from `jax.devices()` groups by process, so each host's
    batch shard rides ICI locally and only gradient all-reduce crosses DCN.

    `devices`/`process_count` are injectable for single-process testing."""
    devices = np.asarray(list(devices if devices is not None else jax.devices()))
    n_proc = process_count if process_count is not None else jax.process_count()
    assert len(devices) % n_proc == 0, (len(devices), n_proc)
    return Mesh(devices, (data_axis,))


def local_batch_slice(global_batch: int, process_id: Optional[int] = None,
                      process_count: Optional[int] = None) -> slice:
    """The half-open row range of the global batch this process feeds
    (multi-host data loading: each host materializes only its slice)."""
    n_proc = process_count if process_count is not None else jax.process_count()
    pid = process_id if process_id is not None else jax.process_index()
    assert global_batch % n_proc == 0, (global_batch, n_proc)
    per = global_batch // n_proc
    return slice(pid * per, (pid + 1) * per)


def batch_sharding(mesh: Mesh, data_axis: str = "data",
                   space_axis: Optional[str] = None) -> NamedSharding:
    """Batch on the data axis; optionally H on the space axis."""
    if space_axis is not None and space_axis in mesh.axis_names:
        return NamedSharding(mesh, P(data_axis, space_axis))
    return NamedSharding(mesh, P(data_axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# keys already warned about in shard_batch's replication fallback
_REPLICATION_WARNED: set = set()


def shard_batch(batch: Dict[str, Any], mesh: Optional[Mesh],
                data_axis: Optional[str] = None) -> Dict[str, Any]:
    """Device-put array values of a host batch, sharded on axis 0. Non-array
    values (filenames, groups) pass through untouched. ``data_axis`` defaults
    to the mesh's first axis (whatever Parallel.data_axis named it)."""
    out: Dict[str, Any] = {}
    if mesh is None:
        for k, v in batch.items():
            out[k] = jax.device_put(v) if isinstance(v, np.ndarray) else v
        return out
    axis = data_axis or mesh.axis_names[0]
    n_dev = int(mesh.shape[axis])
    sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1:
            if v.shape[0] % n_dev != 0:
                # train batches are pre-padded to a device multiple
                # (pad-and-mask); this fallback catches variable-size eval
                # batches on the host path — replicate rather than throw,
                # and say so ONCE per key (patient-grouped eval epochs would
                # otherwise emit hundreds of identical lines).
                if k not in _REPLICATION_WARNED:
                    _REPLICATION_WARNED.add(k)
                    print(f"WARNING: '{k}' batch dim {v.shape[0]} does not "
                          f"divide the {n_dev}-device '{axis}' axis — "
                          f"replicating this array (warned once per key).",
                          flush=True)
                out[k] = jax.device_put(v, replicated)
            else:
                out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out


def replicate_state(state, mesh: Optional[Mesh]):
    if mesh is None:
        return state
    return jax.device_put(state, replicate_sharding(mesh))


def prefetch_to_device(
    host_iter: Iterable[Dict[str, Any]],
    mesh: Optional[Mesh] = None,
    depth: int = 2,
) -> Iterator[Dict[str, Any]]:
    """Background-thread prefetch: host augmentation + H2D transfer overlap
    with device compute (replaces the reference's 4-process pinned-memory
    DataLoader workers)."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        try:
            for item in host_iter:
                if stop.is_set():
                    return
                q.put(shard_batch(item, mesh))
        finally:
            q.put(None)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            yield item
    finally:
        stop.set()
