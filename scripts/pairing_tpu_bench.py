"""Batched multi-pairing check on the real TPU (BASELINE.md row).

Runs the op-granular batched pairing context (batch/ops_batch.py) — B lanes
of e(a,b)·e(-a,b)==1, the proof-aggregation workload
(/root/reference/src/circuit/bn256_pairing_chip.rs:176-228) — on the chip,
and records cold/warm wall time and lanes/s. The op stream dispatches one
jitted template per op; JAX async dispatch pipelines them through the axon
tunnel, so wall time measures compute + tunnel throughput, not latency x
dispatch count, until a value fetch syncs.

Usage: python scripts/pairing_tpu_bench.py [B] [--runs N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import random

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from halo2ecc_s_tpu.batch.ops_batch import BatchedPairingOps
from halo2ecc_s_tpu.core.context import Context
from halo2ecc_s_tpu.utils.curves import G1, G2
from halo2ecc_s_tpu.utils.fields import bn254

B = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 2
RUNS = 2
CURVE = bn254()

print(f"platform={jax.devices()[0].platform} B={B}", flush=True)

rng = random.Random(0xB7)
g1h, g2h = G1(CURVE), G2(CURVE)


def run(seed):
    r = random.Random(seed)
    g1_pts = [g1h.random(r) for _ in range(B)]
    g2_pts = [g2h.random(r) for _ in range(B)]
    neg_pts = [g1h.neg(p) for p in g1_pts]
    ctx = Context()
    ctx.serving_mode = True  # slabs stay in HBM; no host Records writes
    bops = BatchedPairingOps(ctx, CURVE, B, device=True)
    p = bops.assign_g1([q[0] for q in g1_pts], [q[1] for q in g1_pts])
    pn = bops.assign_g1([q[0] for q in neg_pts], [q[1] for q in neg_pts])
    q = bops.assign_g2(g2_pts)
    t0 = time.perf_counter()
    bops.check_pairing([(p, q), (pn, q)])
    bops.drain(write=False)  # divergence-flag fetch = the pipeline sync
    dt = time.perf_counter() - t0
    rows = ctx.offsets()
    return dt, rows, len(bops._tmpl)


for i in range(RUNS):
    dt, rows, n_tmpl = run(100 + i)
    tag = "cold" if i == 0 else "warm"
    total = sum(rows)
    print(
        f"{tag}: {dt:.1f}s  B={B} lanes -> {B/dt:.3f} pairing-checks(x2 "
        f"terms)/s; rows={rows} total={total} ({total//B} rows/lane); "
        f"{n_tmpl} cached op templates",
        flush=True,
    )
