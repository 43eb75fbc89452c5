"""CPU-mesh scaling measurement for the sharded witness step.

Multi-chip TPU hardware is not reachable from this image, so the scaling
behaviour of the mesh path (parallel/mesh.py sharded_template_witness — the
pure data-parallel form of the reference's rayon window parallelism,
ecc_chip.rs:150-204) is measured on the CPU backend with N virtual devices
pinned to N physical cores (taskset), one core per device. That makes the
devices axis a real resource axis: N devices == N cores, so parallel
efficiency is comparable to the reference's thread scaling.

The workload is the bench template (assign_w, assign_w, int_mul — 63 rows
per instance) at a FIXED global batch, sharded over the mesh's batch axis.
Row offsets are static, so the step has no collectives — measured scaling is
pure compute + XLA partitioning overhead.

Run: python scripts/scaling_cpu.py          (takes a few minutes; 4-core box)
Prints one JSON line per device count, then a markdown table for BASELINE.md.

MSM-pipeline mode (python scripts/scaling_cpu.py msm): scales the full
mesh-sharded MSM build (BatchMsm.build(mesh=...) — candidate replication,
GSPMD-sharded phase emitters over points/groups/windows, EC window-
accumulator all-gather; the communication pattern the north-star scaling
metric is about) at 1/2/4 devices == pinned cores. Times the WARM build
(cold build compiles + caches templates first), so the number includes the
pipeline's host-side layout bookkeeping — an end-to-end build-latency
scaling measurement, not a pure device-compute one.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_CORES = os.cpu_count() or 4
B = int(os.environ.get("SCALING_B", 8192))
ITERS = int(os.environ.get("SCALING_ITERS", 8))


def child(n_devices: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    import numpy as np

    from halo2ecc_s_tpu.batch.template import Template
    from halo2ecc_s_tpu.ops.integer_ops import IntegerContext
    from halo2ecc_s_tpu.parallel.mesh import make_mesh, sharded_template_witness
    from halo2ecc_s_tpu.utils.fields import BN254_FQ

    assert len(jax.devices()) == n_devices, (len(jax.devices()), n_devices)

    def build(ctx, ins):
        ictx = IntegerContext(ctx, BN254_FQ)
        a = ictx.assign_w(ins["a"])
        b = ictx.assign_w(ins["b"])
        return ictx.int_mul(a, b)

    tmpl = Template.trace(
        build, {"a": (254, 1234567890 % BN254_FQ), "b": (254, 987654321 % BN254_FQ)}
    )
    rows_per_instance = sum(tmpl.strides)

    mesh = make_mesh(n_devices)
    fn = sharded_template_witness(mesh, tmpl)

    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    b = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    a[:, -1] &= 0x1FFF
    b[:, -1] &= 0x1FFF
    ins = {"a": a, "b": b}

    out = fn(ins)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(ins)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "devices": n_devices,
        "rows_per_sec": round(B * rows_per_instance * ITERS / dt, 1),
        "batch": B,
        "iters": ITERS,
    }))


def child_msm(n_devices: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    # serialize dispatches: lazy compiles concurrent with in-flight CPU
    # collectives abort on XLA's rendezvous timeout (see batch/template.py)
    os.environ.setdefault("HALO2ECC_TPU_SYNC_DISPATCH", "1")

    from halo2ecc_s_tpu.batch.msm_batch import BatchMsm
    from halo2ecc_s_tpu.models.msm import random_msm_instance
    from halo2ecc_s_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == n_devices, (len(jax.devices()), n_devices)
    n_pts = int(os.environ.get("SCALING_MSM_POINTS", 10))
    warm_iters = int(os.environ.get("SCALING_MSM_ITERS", 2))

    points, scalars, _ = random_msm_instance(n_pts, seed=5)
    bm = BatchMsm()
    mesh = make_mesh(n_devices, axis="shard")

    t0 = time.perf_counter()
    bm.build(points, scalars, seed=77, mesh=mesh, write_tables=False)
    cold = time.perf_counter() - t0
    best = float("inf")
    for i in range(warm_iters):
        t0 = time.perf_counter()
        ecc, _ = bm.build(points, scalars, seed=78 + i, mesh=mesh,
                          write_tables=False)
        best = min(best, time.perf_counter() - t0)
    rows = sum(ecc.ctx.offsets())
    print(json.dumps({
        "devices": n_devices,
        "rows_per_sec": round(rows / best, 1),
        "build_secs": round(best, 2),
        "cold_secs": round(cold, 1),
        "points": n_pts,
        "rows_per_build": rows,
    }))


def main(mode: str = "template") -> None:
    results = []
    sub = "child_msm" if mode == "msm" else "child"
    for n in (1, 2, 4, 8):
        if mode == "msm" and n > N_CORES:
            continue
        cores = min(n, N_CORES)
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n} "
            + env.get("XLA_FLAGS", "")
        )
        cmd = [
            "taskset", "-c", f"0-{cores - 1}",
            sys.executable, os.path.abspath(__file__), sub, str(n),
        ]
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, cwd=REPO
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"# devices={n} FAILED:\n{out.stderr[-2000:]}", file=sys.stderr)
            continue
        r = json.loads(line[-1])
        r["cores"] = cores
        results.append(r)
        print(json.dumps(r))

    if results and results[0]["devices"] == 1:
        base = results[0]["rows_per_sec"]
        print("\n| devices (=cores) | rows/s | speedup | efficiency |")
        print("|---|---|---|---|")
        for r in results:
            sp = r["rows_per_sec"] / base
            eff = sp / r["cores"]
            over = " (4 cores oversubscribed)" if r["devices"] > r["cores"] else ""
            print(
                f"| {r['devices']}{over} | {r['rows_per_sec']/1e6:.2f}M "
                f"| {sp:.2f}x | {eff:.0%} |"
            )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(int(sys.argv[2]))
    elif len(sys.argv) > 1 and sys.argv[1] == "child_msm":
        child_msm(int(sys.argv[2]))
    elif len(sys.argv) > 1 and sys.argv[1] == "msm":
        main("msm")
    else:
        main()
