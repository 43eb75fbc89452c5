"""Witness-generation benchmark (runs on the real TPU chip).

Workload: batched IntegerChip witness generation for bn254-Fq-over-Fr
`assign_w(a); assign_w(b); int_mul(a,b)` templates — the inner loop of MSM
and pairing circuits (BASELINE config 2). The device computes all witness
values (limb products, Barrett div_rem hints, carries, range chunks); the
host scatters column blocks into the Records tables.

Metric: end-to-end witness rows/sec (device compute + table emission).
vs_baseline: ratio against the reference's estimated 64-core witness-gen
throughput. The reference publishes no numbers (BASELINE.md) and Rust is not
available in this image, so the baseline is an estimate: ~3us/row/core of
host bigint work in the Rust hot path => ~21M rows/s on 64 cores.

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_ROWS_PER_SEC = 21e6  # estimated 64-core reference throughput


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from halo2ecc_s_tpu.batch.integer_batch import get_engine
    from halo2ecc_s_tpu.core.context import Context
    from halo2ecc_s_tpu.utils.fields import BN254_FQ

    B = int(os.environ.get("BENCH_BATCH", 1 << 14))
    iters = int(os.environ.get("BENCH_ITERS", 4))

    engine = get_engine(BN254_FQ)
    rows_per_instance = sum(engine.strides())

    rng = np.random.default_rng(7)

    def gen():
        a = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
        b = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
        a[:, -1] &= 0x1FFF
        b[:, -1] &= 0x1FFF
        return a, b

    # warmup (compile)
    a, b = gen()
    wit = engine.compute(a, b)
    ctx = Context()
    engine.emit(ctx, wit, B)

    t_device = 0.0
    t_total = 0.0
    for _ in range(iters):
        a, b = gen()
        t0 = time.perf_counter()
        out = engine._wit(a, b)
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        wit = {k: np.asarray(v) for k, v in out.items()}
        ctx = Context()
        engine.emit(ctx, wit, B)
        t2 = time.perf_counter()
        t_device += t1 - t0
        t_total += t2 - t0

    total_rows = iters * B * rows_per_instance
    rows_per_sec = total_rows / t_total
    device_rows_per_sec = total_rows / t_device

    print(
        f"# device-only: {device_rows_per_sec/1e6:.1f}M rows/s; "
        f"end-to-end: {rows_per_sec/1e6:.1f}M rows/s; "
        f"B={B} iters={iters} rows/instance={rows_per_instance} "
        f"backend={jax.devices()[0].platform}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "witness_gen_rows_per_sec",
                "value": round(rows_per_sec, 1),
                "unit": "rows/s",
                "vs_baseline": round(rows_per_sec / REFERENCE_ROWS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
