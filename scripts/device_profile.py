"""Bisect device time of the int_mul witness emitter on the real TPU.

Times three folded fori_loop programs (one dispatch each, hard-synced by a
device->host fetch, best-of-repeats):
  gen     — input generation only
  eval    — witness-value evaluator only (outs+bufs carried)
  emit    — full emitter (evaluator + advice-slab packing)
and prints a roofline estimate: bytes moved per row vs v5e HBM bandwidth.

Usage: python scripts/device_profile.py [B] [ITERS]
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

from halo2ecc_s_tpu.models.int_mul import int_mul_template

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
REPEATS = int(os.environ.get("REPEATS", 3))

tmpl = int_mul_template()
raw = tmpl.device_emitter_raw()
rows_per_instance = sum(tmpl.strides)


def gen_inputs_raw(key):
    ka, kb = jax.random.split(key)
    a = jax.random.bits(ka, (B, 16), jnp.uint32) & 0xFFFF
    b = jax.random.bits(kb, (B, 16), jnp.uint32) & 0xFFFF
    a = a.at[:, -1].set(a[:, -1] & 0x1FFF)
    b = b.at[:, -1].set(b[:, -1] & 0x1FFF)
    return a, b


from halo2ecc_s_tpu.batch.evaluator import build_evaluator_packed
from halo2ecc_s_tpu.batch.template import _lane_mode

roots = tuple(tmpl._roots())
LANE = _lane_mode(False)
ev, eslot = build_evaluator_packed(tmpl.tape, roots, lane_major=LANE)


def loop(body_out_fn):
    """Fold ITERS iterations of body_out_fn(key)->pytree into one program."""

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
    out = run(jax.random.PRNGKey(0))
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])
    best = float("inf")
    for r in range(REPEATS):
        t0 = time.perf_counter()
        out = run(jax.random.PRNGKey(1 + r))
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    rows = ITERS * B * rows_per_instance
    print(f"{name:8s} best {best:7.3f}s  {rows/best/1e6:8.1f}M rows/s")
    return best


def body_gen(sub):
    return gen_inputs_raw(sub)


def body_eval(sub):
    a, b = gen_inputs_raw(sub)
    outs, bufs = ev({"a": a, "b": b})
    return outs, bufs


def body_emit(sub):
    a, b = gen_inputs_raw(sub)
    return raw({"a": a, "b": b})


print(f"B={B} iters={ITERS} rows/inst={rows_per_instance} lane={LANE} "
      f"strides={tmpl.strides} backend={jax.devices()[0].platform}")

t_gen = timeit("gen", loop(body_gen))
t_eval = timeit("eval", loop(body_eval))
t_emit = timeit("emit", loop(body_emit))
print(f"-> eval-gen {t_eval-t_gen:.3f}s, pack(emit-eval) {t_emit-t_eval:.3f}s")

# roofline: bytes written per instance for the advice slabs
n_adv = {0: 5, 1: 3, 2: 2}
slab_bytes = sum(
    s * n_adv[r] * 8 * 4 for r, s in enumerate(tmpl.strides)
)
rows = ITERS * B * rows_per_instance
print(f"slab bytes/instance={slab_bytes} ({slab_bytes/rows_per_instance:.0f}/row)")
for name, t in (("eval", t_eval), ("emit", t_emit)):
    bw = ITERS * B * slab_bytes / t / 1e9
    print(f"{name}: slab-write-only bandwidth {bw:.1f} GB/s "
          f"(v5e HBM ~819 GB/s => {bw/819*100:.1f}% of SoL)")

# tape statistics
from collections import Counter
ops = Counter(tmpl.tape.nodes[n].op for n in range(len(tmpl.tape.nodes)))
print("tape ops:", dict(ops.most_common()))
