"""A REAL multi-process `jax.distributed` run (VERDICT r2 item 4).

Two CPU processes (coordinator on 127.0.0.1, 4 virtual devices each) execute
`initialize_multihost` + `make_multihost_mesh` + a `local_batch_slice`-fed
sharded train step collectively, and the resulting loss must match the
single-process value — upgrading the multi-host tier (parallel/mesh.py:42-91)
from unit-mocked readiness to executed-with-process_count=2.

The reference has no distributed path at all (SURVEY §2.9); on TPU pods the
same code takes the Cloud-TPU auto-detected arguments.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_WORKER = r"""
import json, sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

pid, port, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from mi_based_regularized_semi_supervised_segmentation_tpu.parallel import (
    initialize_multihost, local_batch_slice, make_multihost_mesh,
)

initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mi_based_regularized_semi_supervised_segmentation_tpu.engine.optim import (
    build_optimizer,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.engine.state import (
    init_train_state,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.engine.steps import (
    build_train_step,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.models import UNet

mesh = make_multihost_mesh()
crop, C, B = 16, 3, 8

# deterministic global batch; each process materializes ONLY its local slice
rng = np.random.default_rng(0)
g = {
    "labeled_image": rng.random((B, crop, crop, 1)).astype(np.float32),
    "labeled_target": rng.integers(0, C, (B, crop, crop)).astype(np.int32),
    "unlabeled_image": rng.random((B, crop, crop, 1)).astype(np.float32),
}
sl = local_batch_slice(B)
sharding = NamedSharding(mesh, P("data"))
batch = {
    k: jax.make_array_from_process_local_data(sharding, v[sl])
    for k, v in g.items()
}

model = UNet(input_dim=1, num_classes=C)
tx = build_optimizer({"name": "Adam", "lr": 1e-3})
state = init_train_state(model, tx, (1, crop, crop, 1), seed=0)
state = jax.device_put(state, NamedSharding(mesh, P()))
step = build_train_step(model, tx, "uda", num_classes=C,
                        uda_criterion="mse", reg_weight=5.0)
state, metrics = step(state, batch)
out = {
    "process_id": pid,
    "sup_loss": float(jax.device_get(metrics["sup_loss"])),
    "total_loss": float(jax.device_get(metrics["total_loss"])),
    "process_count": jax.process_count(),
}
with open(out_path, "w") as f:
    json.dump(out, f)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_matches_single(tmp_path, rng):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = (str(Path(__file__).resolve().parents[1])
                         + os.pathsep + env.get("PYTHONPATH", ""))
    procs = []
    outs = [tmp_path / f"out{i}.json" for i in range(2)]
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(outs[pid])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    results = []
    for p, out in zip(procs, outs):
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, stderr.decode()[-3000:]
        results.append(json.loads(out.read_text()))
    assert all(r["process_count"] == 2 for r in results)
    # both processes observe the same (globally reduced) losses
    assert results[0]["sup_loss"] == pytest.approx(results[1]["sup_loss"])
    assert results[0]["total_loss"] == pytest.approx(results[1]["total_loss"])

    # ... and they match the single-process computation of the same batch
    import jax
    import jax.numpy as jnp

    from mi_based_regularized_semi_supervised_segmentation_tpu.engine.optim import (
        build_optimizer,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine.state import (
        init_train_state,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine.steps import (
        build_train_step,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.models import UNet

    crop, C, B = 16, 3, 8
    g_rng = np.random.default_rng(0)
    batch = {
        "labeled_image": g_rng.random((B, crop, crop, 1)).astype(np.float32),
        "labeled_target": g_rng.integers(0, C, (B, crop, crop)).astype(np.int32),
        "unlabeled_image": g_rng.random((B, crop, crop, 1)).astype(np.float32),
    }
    model = UNet(input_dim=1, num_classes=C)
    tx = build_optimizer({"name": "Adam", "lr": 1e-3})
    state = init_train_state(model, tx, (1, crop, crop, 1), seed=0)
    step = build_train_step(model, tx, "uda", num_classes=C,
                            uda_criterion="mse", reg_weight=5.0)
    _, metrics = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
    assert results[0]["sup_loss"] == pytest.approx(
        float(jax.device_get(metrics["sup_loss"])), rel=1e-4)
    assert results[0]["total_loss"] == pytest.approx(
        float(jax.device_get(metrics["total_loss"])), rel=1e-4)
