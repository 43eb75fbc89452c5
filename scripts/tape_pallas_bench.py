"""Measure the whole-template Pallas slab kernel vs the XLA emit path on
the real TPU, and cross-check one batch bit-exactly on device.

Usage: python scripts/tape_pallas_bench.py [B] [ITERS] [W]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from halo2ecc_s_tpu.kernels.tape_pallas import build_slab_kernel
from halo2ecc_s_tpu.models.int_mul import int_mul_template

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
W = int(sys.argv[3]) if len(sys.argv) > 3 else 128
REPEATS = int(os.environ.get("REPEATS", 3))

tmpl = int_mul_template()
rows_per_instance = sum(tmpl.strides)
pallas_call = build_slab_kernel(tmpl, W=W)
assert pallas_call is not None
xla_raw = tmpl.device_emitter_raw()


def gen_inputs_raw(key):
    ka, kb = jax.random.split(key)
    a = jax.random.bits(ka, (B, 16), jnp.uint32) & 0xFFFF
    b = jax.random.bits(kb, (B, 16), jnp.uint32) & 0xFFFF
    a = a.at[:, -1].set(a[:, -1] & 0x1FFF)
    b = b.at[:, -1].set(b[:, -1] & 0x1FFF)
    return a, b


def loop(body_out_fn):
    def step(i, carry):
        k, _ = carry
        k, sub = jax.random.split(k)
        return k, body_out_fn(sub)

    @jax.jit
    def run(k):
        k, sub = jax.random.split(k)
        init = body_out_fn(sub)
        k, out = jax.lax.fori_loop(0, ITERS - 1, step, (k, init))
        return out

    return run


def timeit(name, run):
    t0 = time.perf_counter()
    out = run(jax.random.PRNGKey(0))
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])
    print(f"{name}: warmup/compile {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for r in range(REPEATS):
        t0 = time.perf_counter()
        out = run(jax.random.PRNGKey(1 + r))
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    rows = ITERS * B * rows_per_instance
    print(f"{name:14s} best {best:7.3f}s  {rows/best/1e6:8.1f}M rows/s", flush=True)
    return best


print(f"B={B} iters={ITERS} W={W} backend={jax.devices()[0].platform}", flush=True)

# bit-exact device cross-check on one small batch
Bs = 8 * W
rng = np.random.default_rng(5)
av = rng.integers(0, 1 << 16, (Bs, 16), dtype=np.int64).astype(np.uint32)
bv = rng.integers(0, 1 << 16, (Bs, 16), dtype=np.int64).astype(np.uint32)
av[:, -1] &= 0x1FFF
bv[:, -1] &= 0x1FFF
got = jax.jit(pallas_call)({"a": av, "b": bv})
want = tmpl.device_emitter()({"a": av, "b": bv})
for ridx in want:
    g, w = np.asarray(got[ridx]), np.asarray(want[ridx])
    assert np.array_equal(g, w), f"region {ridx} mismatch on device"
print("device bit-exact cross-check ok", flush=True)

timeit("pallas", loop(lambda sub: pallas_call(dict(zip(("a", "b"), gen_inputs_raw(sub))))))
timeit("xla", loop(lambda sub: xla_raw(dict(zip(("a", "b"), gen_inputs_raw(sub))))))
