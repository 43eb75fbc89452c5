"""ctypes loader/builder for the C++ verification backend (native/fastverify.cpp).

Builds on demand with g++ (cached by source mtime); falls back cleanly when a
toolchain is unavailable (mock_prover keeps the numpy path as reference).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "fastverify.cpp")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_SO = os.path.join(_BUILD_DIR, "libfastverify.so")

_lib = None
_failed = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", _SO, _SRC, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None:
        return _lib
    if _failed or os.environ.get("HALO2ECC_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_SRC) or not _build():
        _failed = True
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _failed = True
        return None

    u64p = ctypes.POINTER(ctypes.c_uint64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)

    lib.check_base_gate.restype = ctypes.c_int64
    lib.check_base_gate.argtypes = [u64p, u64p, ctypes.c_int64, u64p, u64p]

    lib.check_range_region.restype = ctypes.c_int64
    lib.check_range_region.argtypes = [u64p, u64p, ctypes.c_int64, u64p, u64p, ctypes.c_int64]

    lib.check_permutations.restype = ctypes.c_int64
    lib.check_permutations.argtypes = [i64p] * 6 + [ctypes.c_int64] + [u64p, u8p, ctypes.c_int64] * 3

    lib.check_select_lookup.restype = ctypes.c_int64
    lib.check_select_lookup.argtypes = [u64p, u64p, ctypes.c_int64, u64p, u64p]

    _lib = lib
    return _lib


def _u64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def field_consts(p: int):
    p_limbs = np.array([(p >> (64 * i)) & ((1 << 64) - 1) for i in range(4)], dtype=np.uint64)
    mu = (1 << 512) // p
    mu_limbs = np.array([(mu >> (64 * i)) & ((1 << 64) - 1) for i in range(5)], dtype=np.uint64)
    return p_limbs, mu_limbs


def check_base_gate(lib, base_table, rows: int, p: int) -> int:
    p_limbs, mu_limbs = field_consts(p)
    base_table.ensure(rows + 1)
    adv = np.ascontiguousarray(base_table.adv_vals[: rows + 1])
    fix = np.ascontiguousarray(base_table.fix_vals[:rows])
    return int(lib.check_base_gate(_u64p(adv), _u64p(fix), rows, _u64p(p_limbs), _u64p(mu_limbs)))


def check_range_region(lib, range_table, rows: int, p: int, common_bits: int) -> int:
    p_limbs, mu_limbs = field_consts(p)
    range_table.ensure(rows + 2)
    adv = np.ascontiguousarray(range_table.adv_vals[: rows + 2])
    fix = np.ascontiguousarray(range_table.fix_vals[:rows])
    return int(
        lib.check_range_region(_u64p(adv), _u64p(fix), rows, _u64p(p_limbs), _u64p(mu_limbs), common_bits)
    )


def check_select_lookup(lib, select_table, rows: int, p: int) -> int:
    p_limbs, mu_limbs = field_consts(p)
    adv = np.ascontiguousarray(select_table.adv_vals[:rows])
    fix = np.ascontiguousarray(select_table.fix_vals[:rows])
    return int(lib.check_select_lookup(_u64p(adv), _u64p(fix), rows, _u64p(p_limbs), _u64p(mu_limbs)))


def check_permutations(lib, rec, rego_a, col_a, row_a, rego_b, col_b, row_b) -> int:
    n = len(rego_a)
    # keep numpy arrays alive for the duration of the call
    idx_arrays = [
        np.ascontiguousarray(arr, dtype=np.int64)
        for arr in (rego_a, col_a, row_a, rego_b, col_b, row_b)
    ]
    args = [_i64p(a) for a in idx_arrays]
    tbl_arrays = []
    tbl_args = []
    for t in (rec.base, rec.range, rec.select):
        adv = np.ascontiguousarray(t.adv_vals)
        st = np.ascontiguousarray(t.adv_set)
        tbl_arrays.append((adv, st))
        tbl_args.extend([_u64p(adv), _u8p(st), t.n_adv])
    return int(lib.check_permutations(*args, n, *tbl_args))
