"""Multi-process (2-"host") witness-generation scaling efficiency.

The north star asks ">=80% 2-host scaling efficiency". Real multi-host TPU
hardware is unreachable from this image, so this measures the PROCESS
boundary — the DCN-shaped axis — on the CPU backend with core pinning:

  - 1 process  x DEV_PER_PROC virtual devices, pinned to DEV_PER_PROC cores
  - 2 processes x DEV_PER_PROC virtual devices each, pinned to disjoint
    core sets, sharing a global mesh via jax.distributed.initialize over a
    local GRPC coordinator (a genuine process boundary: separate runtimes,
    cross-process collectives, per-process addressable shards)

Both runs emit the SAME fixed global batch per step (weak scaling over
devices: the 2-process mesh has 2x the devices, so ideal speedup is 2x;
efficiency = speedup / 2). The workload is the sharded int_mul witness
step (parallel/mesh.py), the same data-parallel form the single-process
mesh-scaling table measures (scripts/scaling_cpu.py) — layout is static so
the only cross-process traffic is the psum digest, exactly like the
production sharding (BASELINE.md "Mesh scaling").

Usage:
    python scripts/multihost_scaling.py                 # both runs + table
    (internal) ... --nproc N --worker I --port P --tmp D
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEV_PER_PROC = 2
B = int(os.environ.get("MH_SCALE_BATCH", 16384))  # global batch, fixed
ITERS = int(os.environ.get("MH_SCALE_ITERS", 8))


def make_inputs(seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    b = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    a[:, -1] &= 0x1FFF
    b[:, -1] &= 0x1FFF
    return a, b


def worker(nproc: int, proc_id: int, port: int, tmpdir: str) -> None:
    # pin to a disjoint core set BEFORE the XLA thread pool spins up
    cores = set(range(proc_id * DEV_PER_PROC, (proc_id + 1) * DEV_PER_PROC))
    try:
        os.sched_setaffinity(0, cores)
    except OSError:
        pass
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc,
            process_id=proc_id,
        )
    import numpy as np

    from halo2ecc_s_tpu.parallel.mesh import make_mesh, sharded_int_mul_witness

    mesh = make_mesh(nproc * DEV_PER_PROC)
    step = sharded_int_mul_witness(mesh)

    a, b = make_inputs()
    # warmup/compile
    tables, digest = step(a, b)
    jax.block_until_ready(tables)

    t0 = time.perf_counter()
    for i in range(ITERS):
        tables, digest = step(a, b)
        jax.block_until_ready(tables)
    dt = time.perf_counter() - t0

    if proc_id == 0:
        with open(os.path.join(tmpdir, f"n{nproc}.json"), "w") as f:
            json.dump({"nproc": nproc, "secs": dt, "iters": ITERS}, f)
        print(f"  n={nproc}: {dt:.3f}s for {ITERS} iters", flush=True)
    if nproc > 1:
        jax.distributed.shutdown()


def run_config(nproc: int, tmpdir: str) -> float:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--nproc", str(nproc),
             "--worker", str(i), "--port", str(port), "--tmp", tmpdir],
            cwd=REPO, env=env,
        )
        for i in range(nproc)
    ]
    rcs = [p.wait(timeout=1200) for p in procs]
    assert rcs == [0] * nproc, f"worker exit codes {rcs}"
    with open(os.path.join(tmpdir, f"n{nproc}.json")) as f:
        return json.load(f)["secs"]


def parent() -> None:
    from halo2ecc_s_tpu.models.int_mul import int_mul_template

    # rows/instance from the template (63 for bn254 int_mul)
    import jax

    jax.config.update("jax_platforms", "cpu")
    rows_per = sum(int_mul_template().strides)

    tmpdir = tempfile.mkdtemp(prefix="mh_scale_")
    print(f"global batch {B}, {ITERS} timed iters, {DEV_PER_PROC} devices "
          f"(= pinned cores) per process")
    t1 = run_config(1, tmpdir)
    t2 = run_config(2, tmpdir)
    r1 = B * rows_per * ITERS / t1
    r2 = B * rows_per * ITERS / t2
    speedup = r2 / r1
    eff = speedup / 2
    print(f"1 process : {r1/1e6:8.2f}M rows/s")
    print(f"2 processes: {r2/1e6:8.2f}M rows/s  speedup {speedup:.2f}x  "
          f"efficiency {100*eff:.0f}%")
    print(json.dumps({
        "metric": "two_process_scaling_efficiency",
        "rows_per_sec_1proc": round(r1, 1),
        "rows_per_sec_2proc": round(r2, 1),
        "speedup": round(speedup, 3),
        "efficiency": round(eff, 3),
        "global_batch": B,
        "devices_per_proc": DEV_PER_PROC,
    }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--nproc", type=int, default=None)
    p.add_argument("--worker", type=int, default=None)
    p.add_argument("--port", type=int, default=None)
    p.add_argument("--tmp", type=str, default=None)
    args = p.parse_args()
    if args.worker is None:
        parent()
    else:
        worker(args.nproc, args.worker, args.port, args.tmp)
