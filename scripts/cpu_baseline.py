"""Measured same-silicon throughput denominator (VERDICT r3 item 2).

The reference publishes no throughput numbers and its GPU is unspecified, so
every `vs_baseline` multiple in BENCH_r*.json has divided by an ESTIMATED 68
slices/s (BASELINE.md). torch (CPU) IS importable here, and so is our JAX
stack on the same CPU — this script times both frameworks' flagship udaiic
train step (B=24 at 224², fp32, Adam) on the same silicon and records the
hardware-controlled ratio:

  torch side: scripts/torch_oracle.py --time-step (the reference's
      epocher.py:137-188 step semantics on random tensors, subprocess so its
      compat shims never touch this interpreter)
  jax side:   bench.bench_step("float32") with the CPU backend forced and
      Kernel.backend=xla (the Pallas kernels are TPU-shaped)

Writes docs/study_r04/cpu_baseline.json; bench.py picks it up and reports
`baseline.measured_cpu_ratio` next to the estimated GPU anchor.

Run on a QUIET host (single CPU core here — concurrent jobs skew both sides).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "docs" / "study_r04" / "cpu_baseline.json"


def time_torch(steps: int) -> dict:
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "torch_oracle.py"),
         "--time-step", "--time-steps", str(steps), "--out", "/tmp/cpu_baseline"],
        capture_output=True, text=True, timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"torch timing failed:\n{proc.stderr[-2000:]}")
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    return {"slices_per_sec": rec["slices_per_sec"],
            "sec_per_step": rec["sec_per_step"], "steps": rec["steps"],
            "threads": rec["torch_threads"]}


def time_jax(steps: int) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["BENCH_BACKEND"] = "xla"
    os.environ["BENCH_STEPS"] = str(steps)
    sys.path.insert(0, str(REPO))
    import bench

    t0 = time.perf_counter()
    rate = bench.bench_step("float32")
    wall = time.perf_counter() - t0
    return {"slices_per_sec": round(rate, 3), "sec_per_step": round(24.0 / rate, 3),
            "steps": steps, "wall_incl_warmup": round(wall, 1)}


def main():
    steps = int(os.environ.get("CPU_BASELINE_STEPS", "5"))
    print(f"[cpu_baseline] timing torch reference step ({steps} steps)...",
          flush=True)
    torch_rec = time_torch(steps)
    print(f"[cpu_baseline] torch: {torch_rec}", flush=True)
    print(f"[cpu_baseline] timing JAX-CPU step ({steps} steps, compile first)...",
          flush=True)
    jax_rec = time_jax(steps)
    print(f"[cpu_baseline] jax: {jax_rec}", flush=True)
    record = {
        "host": "single-core CPU (same silicon both sides)",
        "workload": "udaiic train step, B=4+10+10 @ 1x224x224, fp32, Adam",
        "torch": torch_rec,
        "jax_cpu": jax_rec,
        "ratio_jax_over_torch": round(
            jax_rec["slices_per_sec"] / torch_rec["slices_per_sec"], 3),
    }
    OUT.parent.mkdir(parents=True, exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
