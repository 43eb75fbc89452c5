"""Reproduce / diagnose the phase-4 chain-scan failure on the axon TPU.

Usage: python scripts/scan_tpu_repro.py [--select] [--n N] [--chunk C]
Runs a small MSM twice (cold build caches templates; warm build engages the
phase-4 scan) with HALO2ECC_TPU_SCAN_P4=1.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ["HALO2ECC_TPU_SCAN_P4"] = "1"

p = argparse.ArgumentParser()
p.add_argument("--select", action="store_true")
p.add_argument("--n", type=int, default=26)
p.add_argument("--chunk", type=int, default=None)
p.add_argument("--smoke-windows", type=int, default=None,
               help="truncate accumulation to W windows (cuts phase-4 lane "
                    "count and phase-5 steps; exact for scalars < 2^W)")
args = p.parse_args()
if args.chunk is not None:
    os.environ["HALO2ECC_TPU_SCAN_CHUNK"] = str(args.chunk)
os.environ.setdefault("HALO2ECC_TPU_PROFILE", "1")

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
print("platform:", jax.devices()[0].platform, flush=True)

from halo2ecc_s_tpu.batch.msm_batch import BatchMsm
from halo2ecc_s_tpu.models.msm import random_msm_instance

points, scalars, expect = random_msm_instance(args.n, seed=17)
if args.smoke_windows:
    import random as _r
    _rr = _r.Random(17)
    scalars = [_rr.randrange(1 << args.smoke_windows) for _ in scalars]

bm = BatchMsm(with_select_chip=args.select)
kw = dict(device=True, write_tables=False)
if args.smoke_windows:
    kw["smoke_windows"] = args.smoke_windows

t0 = time.perf_counter()
bm.build(points, scalars, seed=31, **kw)
print(f"cold build: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
ecc, res = bm.build(points, scalars, seed=31, **kw)
print(f"warm build: {time.perf_counter()-t0:.1f}s", flush=True)
print("scan engaged:", any(k[0] == "p4" for k in bm._scan_jits), flush=True)

assert res.x.native.val is not None
print("result x native:", hex(res.x.native.val)[:20], flush=True)
if not args.smoke_windows:
    from halo2ecc_s_tpu.utils.curves import G1
    from halo2ecc_s_tpu.utils.fields import bn254

    g1 = G1(bn254())
    ecc.ecc_assert_equal(res, ecc.assign_point(expect))
    print("oracle equality constrained ok", flush=True)
