"""Multi-chip sharding of the witness workload.

The reference parallelises with rayon threads over one host's shared memory
(SURVEY §2 parallelism inventory); here the batch axis (MSM points / int_mul
instances / windows) shards over a jax.sharding.Mesh, witness values are
computed per-device by the ff_jax kernels, and cross-device aggregates
(bucket sums, digests, row accounting) ride XLA collectives (psum) over ICI.

Row offsets need NO communication: per-op row counts are static, so every
device knows its slab from its axis index alone — the TPU-native analogue of
the reference's offset-prediction trick (ecc_chip.rs:150-204).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels import ff_jax as ff
from ..utils.fields import BN254_FQ, BN254_FR


def make_mesh(n_devices: int | None = None, axis: str = "points") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def init_distributed() -> bool:
    """Multi-host entry point (env-gated). When HALO2ECC_TPU_DIST=1, calls
    jax.distributed.initialize() using the standard coordinator env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU-pod auto-detection). After this, jax.devices() spans the pod slice
    and the mesh paths below (and BatchMsm(mesh=...)) run multi-host: each
    process computes and writes only its addressable slab shards
    (template.finalize_deferred handles non-fully-addressable arrays).
    Returns True if distributed mode was initialized."""
    import os

    if not os.environ.get("HALO2ECC_TPU_DIST"):
        return False
    jax.distributed.initialize()
    return True


def sharded_msm_build(bm, points, scalars, mesh: Mesh | None = None, **kw):
    """Build a batched MSM witness with every phase's batch axis sharded over
    the mesh (GSPMD; see BatchMsm.build mesh docs). Convenience wrapper that
    defaults to a mesh over all devices."""
    mesh = mesh or make_mesh(axis="shard")
    return bm.build(points, scalars, mesh=mesh, **kw)


def sharded_int_mul_witness(mesh: Mesh, axis: str = "points"):
    """Returns a jitted fn(a16, b16) -> (tables, digest): the batched
    int_mul witness TEMPLATE's device emission (the same pipeline bench.py
    and the MSM phases run) with the batch sharded over `axis` — each device
    computes and materialises its own advice-slab shard — plus a psum'd
    global u32 digest of all slab words (row-accounting / integrity-check
    collective pattern).

    Outputs keep their shardings (each device holds its slab's rows), so the
    per-host emission path only touches local shards.
    """
    from ..models.int_mul import int_mul_template

    tmpl = int_mul_template()
    raw = tmpl.device_emitter_raw()
    table_specs = {
        ridx: P(axis, None, None, None)
        for ridx, s in enumerate(tmpl.strides)
        if s != 0
    }

    def step(a16, b16):
        tables = raw({"a": a16, "b": b16})
        # global digest: wrap-around u32 fold of every advice word, summed
        # across devices (row accounting / integrity check pattern)
        local = jnp.zeros((), dtype=jnp.uint32)
        for v in tables.values():
            local = local + jnp.sum(v, dtype=jnp.uint32)
        digest = jax.lax.psum(local, axis)

        return tables, digest

    in_spec = P(axis, None)
    sharded = jax.shard_map(
        step, mesh=mesh, in_specs=(in_spec, in_spec),
        out_specs=(table_specs, P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_template_witness(mesh: Mesh, template, axis: str = "points"):
    """Shard a witness template's device emission over the mesh: each device
    computes and materialises its own slab of instances' advice tables in its
    HBM shard. Row offsets are static per instance, so no communication at
    all — the pure data-parallel form of the reference's row-slab discipline.

    Returns a jitted fn(inputs) -> {region: u32[B, stride, n_adv, 8]} (packed
    16-bit limb pairs) with
    the batch axis sharded over `axis`.
    """
    raw = template.device_emitter_raw()

    def step(inputs):
        return raw(inputs)

    in_shape = {name: P(axis, None) for name, _ in _template_input_names(template)}
    out_spec = {
        ridx: P(axis, None, None, None)
        for ridx, stride in enumerate(template.strides)
        if stride != 0
    }
    sharded = jax.shard_map(
        step, mesh=mesh, in_specs=(in_shape,), out_specs=out_spec, check_vma=False
    )
    return jax.jit(sharded)


def _template_input_names(template):
    return [(name, bits) for (_, name, bits) in template.tape.inputs]


def sharded_field_sum(mesh: Mesh, axis: str = "points"):
    """Cross-device native-field sum: each device folds its local shard into
    a redundant limb accumulator, psums raw limb accumulators over ICI, and
    normalises once — one collective for the whole reduction. (The MSM
    pipeline's own cross-device aggregation is the EC window-accumulator
    all-gather inside BatchMsm.build(mesh=...); this helper is the simpler
    scalar-field collective pattern, used for row accounting / digests.)
    """
    fr = ff.make_field(BN254_FR)

    def step(scalars16):
        # local partial: plain limb-wise accumulation (values < p, B_local
        # terms => per-limb sums < B_local * 2^16; safe in u32 for B<2^16)
        local = jnp.sum(scalars16, axis=0, dtype=jnp.uint32)
        total = jax.lax.psum(local, axis)
        # normalise the redundant-limb accumulator back into canonical form
        red = ff.carry_norm(total, fr.L + 2)
        return ff.barrett_reduce(fr, ff.pad_limbs(red, 2 * fr.L))

    sharded = jax.shard_map(
        step, mesh=mesh, in_specs=(P(axis, None),), out_specs=P(), check_vma=False
    )
    return jax.jit(sharded)
