"""Lane-major vs limb-minor mul_mod microbenchmark (run on TPU).

Chains N dependent mul_mods inside one fori_loop dispatch (hard-synced by a
device->host fetch, best-of-repeats) so the measurement is pure device time.

Usage: python scripts/lane_microbench.py [B] [N] [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from halo2ecc_s_tpu.kernels import ff_jax as ff
from halo2ecc_s_tpu.kernels import ff_lane as fl
from halo2ecc_s_tpu.utils.fields import BN254_FQ

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
N = int(sys.argv[2]) if len(sys.argv) > 2 else 64

f = ff.make_field(BN254_FQ)
ft = fl.make_field(BN254_FQ)
L = f.L

rng = np.random.default_rng(0)
vals = [int(rng.integers(0, 1 << 62)) * 12345 % BN254_FQ for _ in range(4)]
a_bl = np.stack([np.asarray(ff.int_to_limbs(v, L)) for v in vals])  # [4, L]
a_row = np.broadcast_to(a_bl[0], (B, L)).copy()
b_row = np.broadcast_to(a_bl[1], (B, L)).copy()

# correctness: lane-major == limb-minor == python int
want = vals[0] * vals[1] % BN254_FQ
got_row = ff.limbs_to_int(np.asarray(jax.jit(lambda x, y: ff.mul_mod(f, x, y))(a_row[:8], b_row[:8]))[0])
got_lane = np.asarray(jax.jit(lambda x, y: fl.mul_mod(ft, x, y))(
    fl.to_lane(a_row[:8]), fl.to_lane(b_row[:8])))
got_lane_int = ff.limbs_to_int(np.asarray(fl.from_lane(got_lane))[0])
assert got_row == want, (hex(got_row), hex(want))
assert got_lane_int == want, (hex(got_lane_int), hex(want))
print("correctness ok")


def timeit(name, run, arg):
    out = run(arg)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(arg)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    per = best / N
    print(f"{name:24s} {best:7.3f}s total  {per*1e3:7.3f} ms/mul_mod  "
          f"({B/per/1e6:7.1f}M muls/s)")
    return best


@jax.jit
def chain_row(x):
    def body(i, x):
        return ff.mul_mod(f, x, b_row_j)
    return jax.lax.fori_loop(0, N, body, x)


@jax.jit
def chain_lane(x):
    def body(i, x):
        return fl.mul_mod(ft, x, b_lane_j)
    return jax.lax.fori_loop(0, N, body, x)


b_row_j = jnp.asarray(b_row)
b_lane_j = jnp.asarray(np.ascontiguousarray(b_row.T))

timeit("mul_mod limb-minor", chain_row, jnp.asarray(a_row))
timeit("mul_mod lane-major", chain_lane, jnp.asarray(np.ascontiguousarray(a_row.T)))
