"""Measure the cost of the slab transpose in _assemble_tables_lane on TPU.

Times the emit loop with (a) the production emitter (batch-major slabs,
transpose at the end) and (b) a patched emitter returning lane-major
[S, 8, B] slabs (no transpose). Usage: python scripts/pack_layout_bench.py
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

from halo2ecc_s_tpu.batch.template import Template
from halo2ecc_s_tpu.models.int_mul import int_mul_template

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
ITERS = int(os.environ.get("ITERS", 8))
REPEATS = int(os.environ.get("REPEATS", 3))

tmpl = int_mul_template()
rows_per_instance = sum(tmpl.strides)


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
    print(f"{name:22s} best {best:7.3f}s  {rows/best/1e6:8.1f}M rows/s", flush=True)
    return best


def body(raw_fn):
    def f(sub):
        a, b = gen_inputs_raw(sub)
        return raw_fn({"a": a, "b": b})

    return f


# (a) production emitter
raw = tmpl.device_emitter_raw()
timeit("emit batch-major", loop(body(raw)))


# (b) lane-major, no transpose
def assemble_lane_notr(self, plans, take, bufs, B_):
    def pad16(v):
        if v.shape[-2] < 16:
            return jnp.concatenate(
                [v, jnp.zeros((16 - v.shape[-2],) + v.shape[-1:], jnp.uint32)],
                axis=-2,
            )
        return v[..., :16, :]

    slabs = {}
    for ridx, plan in enumerate(plans):
        if plan is None:
            continue
        stride, n_adv, const_flat, cell_src, is_cap, src_specs, ncap = plan
        parts = []
        for spec in src_specs:
            if spec[0] == "vec":
                _, L, idxs = spec
                parts.append(self._pack8_lane(bufs[L][idxs]))
            else:
                parts.append(
                    self._pack8_lane(
                        jnp.stack([pad16(take(n)) for n in spec[1]], axis=0)
                    )
                )
        cap_buf = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        gathered = cap_buf[jnp.asarray(cell_src)]  # [S, 8, B]
        tbl = jnp.where(
            jnp.asarray(is_cap)[:, None, None],
            gathered,
            jnp.asarray(const_flat)[:, :, None],
        )
        slabs[ridx] = tbl  # [S, 8, B], lane-major — no transpose
    return slabs


# fresh template object (int_mul_template() caches per process)
from halo2ecc_s_tpu.ops.integer_ops import IntegerContext
from halo2ecc_s_tpu.utils.fields import BN254_FQ


def build(ctx, ins):
    ictx = IntegerContext(ctx, BN254_FQ)
    a = ictx.assign_w(ins["a"])
    b = ictx.assign_w(ins["b"])
    return ictx.int_mul(a, b)


tmpl2 = Template.trace(
    build, {"a": (254, 1234567890 % BN254_FQ), "b": (254, 987654321 % BN254_FQ)}
)
Template._assemble_tables_lane_orig = Template._assemble_tables_lane
Template._assemble_tables_lane = assemble_lane_notr
try:
    raw2 = tmpl2.device_emitter_raw()
    timeit("emit lane-major slabs", loop(body(raw2)))
finally:
    Template._assemble_tables_lane = Template._assemble_tables_lane_orig
