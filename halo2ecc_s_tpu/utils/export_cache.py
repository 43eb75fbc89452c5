"""Disk-backed jax.export artifact cache for template emitters.

The whole-template Pallas kernels (kernels/tape_pallas.py) trace to
~100k-operation jaxprs; the XLA persistent cache makes their COMPILES warm
across processes, but every fresh process still pays Python tracing +
StableHLO lowering — measured 40-875s PER PHASE on the MSM pipeline's warm
path (4-core host), which alone blows the driver's bench budget.

cached_jit() removes that: the first process to trace a function exports it
(jax.export) and writes the serialized StableHLO next to the XLA cache;
later processes deserialize (~no tracing) and compile, which hits the XLA
persistent cache. Keys combine the caller's semantic digest (template tape,
layout, flags), the argument shape/dtype specs, the backend, the jax
version, and a hash of the lowering source files — any code change
invalidates automatically.

Serialized modules only allow string dict keys, so pytrees are key-encoded
through a bijection (int keys -> "i:<n>", ("vec", i) -> "t:vec:<i>") and
decoded after the call; values are untouched.

Scope: accelerator backends only (the CPU test suite keeps plain jit — the
AOT path on this host's XLA:CPU has a history of miscompiles, see
tests/conftest.py). Disable with HALO2ECC_TPU_NO_EXPORT_CACHE=1.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import Callable, Tuple

import numpy as np

_SRC_HASH = None


def _source_hash() -> str:
    """Hash of the lowering-relevant source files (auto-invalidation)."""
    global _SRC_HASH
    if _SRC_HASH is None:
        base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for rel in (
            "kernels/tape_pallas.py",
            "kernels/ff_jax.py",
            "kernels/ff_lane.py",
            "batch/template.py",
            "batch/evaluator.py",
            "batch/symbolic.py",
            "batch/chain_scan.py",
        ):
            with open(os.path.join(base, rel), "rb") as f:
                h.update(f.read())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def cache_dir() -> str:
    d = os.environ.get("HALO2ECC_TPU_EXPORT_CACHE_DIR")
    if not d:
        base = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        d = os.path.join(base, ".jax_cache_export")
    os.makedirs(d, exist_ok=True)
    return d


def enabled() -> bool:
    import jax

    if os.environ.get("HALO2ECC_TPU_NO_EXPORT_CACHE"):
        return False
    if jax.default_backend() == "cpu":
        # opt-in on CPU (dryrun_multichip sets it: the dryrun re-traces
        # the same kernel bodies every driver round and SELF-VERIFIES its
        # results — digest cross-check + constraint verifier — so the
        # XLA:CPU caution from tests/conftest.py is contained)
        return bool(os.environ.get("HALO2ECC_TPU_EXPORT_CACHE_CPU"))
    return True


# ---------------------------------------------------------------------------
# pytree key encoding (export serialization allows string dict keys only)
# ---------------------------------------------------------------------------


def _enc_key(k) -> str:
    if isinstance(k, str):
        return "s:" + k
    if isinstance(k, (int, np.integer)):
        return "i:%d" % int(k)
    if (
        isinstance(k, tuple)
        and len(k) == 2
        and isinstance(k[0], str)
        and isinstance(k[1], (int, np.integer))
    ):
        return "t:%s:%d" % (k[0], int(k[1]))
    raise TypeError(f"unencodable pytree key {k!r}")


def _dec_key(k: str):
    tag, _, rest = k.partition(":")
    if tag == "s":
        return rest
    if tag == "i":
        return int(rest)
    if tag == "t":
        nm, _, i = rest.partition(":")
        return (nm, int(i))
    raise TypeError(f"undecodable pytree key {k!r}")


def enc_tree(t):
    if isinstance(t, dict):
        return {_enc_key(k): enc_tree(v) for k, v in t.items()}
    if isinstance(t, (list, tuple)):
        return [enc_tree(v) for v in t]
    return t


def dec_tree(t):
    if isinstance(t, dict):
        return {_dec_key(k): dec_tree(v) for k, v in t.items()}
    if isinstance(t, (list, tuple)):
        return [dec_tree(v) for v in t]
    return t


# ---------------------------------------------------------------------------


def _spec_of(a):
    import jax
    import jax.numpy as jnp

    return jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a))


def _spec_digest(specs) -> str:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(specs)
    s = repr(treedef) + "|" + "|".join(
        f"{tuple(l.shape)}:{l.dtype}" for l in leaves
    )
    return hashlib.sha256(s.encode()).hexdigest()[:16]


def cached_jit(fn: Callable, semantic_key: str, label: str = "fn") -> Callable:
    """jit(fn) with a cross-process export cache.

    fn must take positional pytree args and return a pytree whose dict keys
    are strings, ints, or ("name", int) tuples; list/tuple distinction in
    the RESULT is not preserved (both come back as lists — the emitter
    contracts here index, never type-check).

    The wrapper resolves to one of, at first call (keyed by arg specs):
      - a deserialized exported artifact (no tracing), or
      - a fresh jit traced+exported+persisted for the next process.
    """
    import jax

    if not enabled():
        return jax.jit(fn)

    enc_fn = lambda *a: enc_tree(fn(*a))
    state = {}

    def wrapper(*args):
        impl = state.get("impl")
        if impl is None:
            from jax import export as jexport

            specs = jax.tree_util.tree_map(_spec_of, args)
            key = hashlib.sha256(
                "|".join(
                    (
                        semantic_key,
                        _spec_digest(specs),
                        jax.default_backend(),
                        jax.__version__,
                        _source_hash(),
                    )
                ).encode()
            ).hexdigest()[:32]
            path = os.path.join(cache_dir(), f"{label}-{key}.jaxexp")
            exp = None
            if os.path.exists(path):
                try:
                    with open(path, "rb") as f:
                        exp = jexport.deserialize(bytearray(f.read()))
                except Exception as e:  # corrupt blob: re-export
                    import sys

                    print(
                        f"# export-cache: reload failed for {label} ({e!r}); "
                        "re-exporting", file=sys.stderr,
                    )
                    exp = None
            if exp is None:
                exp = jexport.export(jax.jit(enc_fn))(*specs)
                blob = exp.serialize()
                fd, tmp = tempfile.mkstemp(dir=cache_dir())
                with os.fdopen(fd, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)
            jcall = jax.jit(exp.call)
            impl = lambda *a: dec_tree(jcall(*a))
            state["impl"] = impl
        return impl(*args)

    return wrapper
