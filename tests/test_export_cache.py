"""utils/export_cache.py: key-encoding bijection and the cached_jit
round-trip (export -> serialize -> deserialize -> call) on CPU with the
gate forced open; bit-exactness vs the plain function."""

import os

import numpy as np
import pytest

from halo2ecc_s_tpu.utils import export_cache as ec


def test_key_encoding_bijection():
    keys = ["state", 0, 7, ("vec", 0), ("vec", 12)]
    enc = [ec._enc_key(k) for k in keys]
    assert len(set(enc)) == len(enc)
    assert [ec._dec_key(e) for e in enc] == keys
    tree = {"a": {3: 1, ("vec", 1): [2, {"z": 3}]}}
    assert ec.dec_tree(ec.enc_tree(tree)) == {"a": {3: 1, ("vec", 1): [2, {"z": 3}]}}


def test_cached_jit_roundtrip(tmp_path, monkeypatch):
    import jax.numpy as jnp

    monkeypatch.setenv("HALO2ECC_TPU_EXPORT_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(ec, "enabled", lambda: True)

    calls = {"n": 0}

    def fn(ins):
        calls["n"] += 1
        return {0: ins["x"] * 2, ("vec", 1): ins["x"] + 1}, {"flag": jnp.any(ins["x"] > 5)}

    x = np.arange(8, dtype=np.uint32)
    f1 = ec.cached_jit(fn, "unit-test", "ut")
    out1 = f1({"x": x})
    assert len(list(tmp_path.glob("ut-*.jaxexp"))) == 1

    # second wrapper (fresh-process stand-in): must load the artifact, not
    # re-trace fn
    calls["n"] = 0
    f2 = ec.cached_jit(fn, "unit-test", "ut")
    out2 = f2({"x": x})
    assert calls["n"] == 0, "artifact load must skip tracing"
    assert np.array_equal(np.asarray(out1[0][0]), np.asarray(out2[0][0]))
    assert np.array_equal(
        np.asarray(out1[0][("vec", 1)]), np.asarray(out2[0][("vec", 1)])
    )
    assert bool(np.asarray(out2[1]["flag"])) == bool(np.asarray(out1[1]["flag"]))
    # plain-fn equality
    assert np.array_equal(np.asarray(out2[0][0]), x * 2)

    # different semantic key -> different artifact
    f3 = ec.cached_jit(fn, "unit-test-2", "ut")
    f3({"x": x})
    assert len(list(tmp_path.glob("ut-*.jaxexp"))) == 2
