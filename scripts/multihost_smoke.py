"""Multi-host (multi-process) witness-generation smoke test.

Exercises the REAL multi-host path end to end on this one machine: two OS
processes, `jax.distributed.initialize` over a local GRPC coordinator, a
global mesh spanning both processes' devices (2 virtual CPU devices each =
4 global), and the sharded int_mul witness step (parallel/mesh.py
`sharded_int_mul_witness`) whose psum digest is a genuine cross-process
collective. Each process fetches only its addressable output shards; the
parent stitches them and asserts bit-exact equality with a single-process
emission of the same batch (the north-star requirement: 1 host and N hosts
produce identical witness tables).

This is the TPU-native analogue of the reference's single-host rayon row-slab
discipline (/root/reference/src/context.rs:326,420) scaled past one process:
row offsets are static so no communication is needed for layout; only the
digest reduction rides the collective.

Usage:
    python scripts/multihost_smoke.py            # parent: spawns 2 workers
    (internal) python scripts/multihost_smoke.py --worker I --port P --tmp D
"""

import argparse
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
DEV_PER_PROC = 2
B = 8  # global batch (2 instances per device)


def make_inputs():
    import numpy as np

    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    b = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    a[:, -1] &= 0x1FFF
    b[:, -1] &= 0x1FFF
    return a, b


def worker(proc_id: int, port: int, tmpdir: str) -> None:
    # CPU platform + per-process virtual devices BEFORE any backend init
    # (the image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon;
    # jax.config.update is the only override that still works — see conftest)
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=N_PROC,
        process_id=proc_id,
    )
    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC, jax.devices()

    import numpy as np

    from halo2ecc_s_tpu.parallel.mesh import make_mesh, sharded_int_mul_witness

    mesh = make_mesh(N_PROC * DEV_PER_PROC)
    step = sharded_int_mul_witness(mesh)

    a, b = make_inputs()
    tables, digest = step(a, b)
    # the psum digest is fully replicated -> addressable on every process
    digest = int(np.asarray(digest))

    # each process persists ONLY its addressable shards (+ global indices)
    shards = {}
    for ridx, arr in tables.items():
        for s in arr.addressable_shards:
            lo = s.index[0].start or 0
            shards[f"r{ridx}_lo{lo}"] = np.asarray(s.data)
    np.savez(
        os.path.join(tmpdir, f"proc{proc_id}.npz"), digest=digest, **shards
    )
    print(f"worker {proc_id}: {len(shards)} local shards, digest={digest}",
          flush=True)
    jax.distributed.shutdown()


def parent() -> None:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    tmpdir = tempfile.mkdtemp(prefix="mh_smoke_")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i),
             "--port", str(port), "--tmp", tmpdir],
            cwd=REPO,
        )
        for i in range(N_PROC)
    ]
    rcs = [p.wait(timeout=600) for p in procs]
    assert rcs == [0] * N_PROC, f"worker exit codes {rcs}"

    # single-process reference emission + expected digest
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from halo2ecc_s_tpu.models.int_mul import int_mul_template

    tmpl = int_mul_template()
    a, b = make_inputs()
    single = tmpl.device_emitter()({"a": a, "b": b})
    expect_digest = sum(
        int(np.sum(np.asarray(v), dtype=np.uint32)) for v in single.values()
    ) & 0xFFFFFFFF

    # stitch the workers' addressable shards and compare bit-exactly
    loaded = [
        np.load(os.path.join(tmpdir, f"proc{i}.npz")) for i in range(N_PROC)
    ]
    for z in loaded:
        assert int(z["digest"]) == expect_digest, (
            f"digest {int(z['digest'])} != single-process {expect_digest}"
        )
    for ridx, ref in single.items():
        got = np.zeros_like(np.asarray(ref))
        seen = np.zeros(got.shape[0], dtype=bool)
        for z in loaded:
            for k in z.files:
                if not k.startswith(f"r{ridx}_lo"):
                    continue
                lo = int(k.split("lo")[1])
                chunk = z[k]
                got[lo : lo + chunk.shape[0]] = chunk
                seen[lo : lo + chunk.shape[0]] = True
        assert seen.all(), f"region {ridx}: missing shard rows"
        np.testing.assert_array_equal(got, np.asarray(ref))
    print(
        f"multihost smoke ok: {N_PROC} processes x {DEV_PER_PROC} devices, "
        f"digest={expect_digest}, witness tables bit-exact vs single process"
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--worker", type=int, default=None)
    p.add_argument("--port", type=int, default=None)
    p.add_argument("--tmp", type=str, default=None)
    args = p.parse_args()
    if args.worker is None:
        parent()
    else:
        worker(args.worker, args.port, args.tmp)
