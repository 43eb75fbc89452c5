"""Symbolic integer values for witness-template tracing.

Run ordinary chip code (Context / IntegerContext / Ecc ops) once with SymVal
inputs: every Python-int operation the chips perform is recorded on a tape
while an exact lane-0 value drives control flow identically to the scalar
path. The tape then lowers to one batched XLA program (evaluator.py) that
computes every witness value for B instances at once — the "witness-table
compiler" shape the reference's design implies (witness gen fully outside
synthesize, with statically predictable layouts; SURVEY §7).

Exactness model: every node's device representation equals
`true_value + pad` where `pad` is a trace-time-static non-negative integer,
always a multiple of the native modulus n. Subtraction injects pad so device
values never underflow; `% n` strips pad; `% m` for m != n, floor-div,
shifts, masks, and node*node products require pad == 0 (asserted at trace
time — any violation is a loud trace error, never silent corruption).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

MAX_BITS = 16 * 56  # sanity cap on any node width (wide enough for 381-bit fields)


@dataclass
class Node:
    op: str
    args: Tuple[int, ...] = ()
    const: object = None  # int modulus / shift / mask / tuple, op-specific
    bits: int = 0  # upper bound on device value (true + pad)
    pad: int = 0  # static pad (multiple of n); 0 means exact
    mod_tag: Optional[int] = None  # value is known canonical mod this modulus


class Tape:
    def __init__(self, n_modulus: int):
        self.n = n_modulus
        self.nodes: List[Node] = []
        self.inputs: List[Tuple[int, str, int]] = []  # (node_id, name, bits)
        # trace-time assumptions that must hold on EVERY lane; checked at
        # instantiation (UnsafeError retry protocol for divergence)
        self.assume_equal_const: List[Tuple[int, int]] = []  # (node, const)
        # width assumptions: (pre-truncation node, k) — instantiate() checks
        # every lane's pre-truncation value fits k bits (loud, never silent)
        self.assume_checks: List[Tuple[int, int]] = []
        self._cse: Dict[Tuple, int] = {}

    def push(self, node: Node) -> int:
        assert node.bits <= MAX_BITS, f"node too wide: {node.bits} bits ({node.op})"
        if node.op != "input":
            key = (node.op, node.args, node.const)
            hit = self._cse.get(key)
            if hit is not None:
                return hit
            self.nodes.append(node)
            nid = len(self.nodes) - 1
            self._cse[key] = nid
            return nid
        self.nodes.append(node)
        return len(self.nodes) - 1

    def input(self, name: str, v0: int, bits: int) -> "SymVal":
        assert 0 <= v0 < (1 << bits), (
            f"input '{name}' sample {v0.bit_length()} bits exceeds declared {bits}"
        )
        nid = self.push(Node("input", (), None, bits, 0))
        self.inputs.append((nid, name, bits))
        return SymVal(self, nid, v0)

    def input_vec(self, name: str, v0s, bits: int) -> List["SymVal"]:
        """One K-element vector input bound to a single u32[B, K, limbs]
        array at evaluation (keeps wide state vectors — e.g. keccak's 1600
        bits — as ONE evaluator argument instead of K). Returns K SymVals
        backed by 'pick' nodes."""
        K = len(v0s)
        for v0 in v0s:
            assert 0 <= v0 < (1 << bits)
        vec_nid = self.push(Node("input_vec", (), (K, bits), bits, 0))
        self.inputs.append((vec_nid, name, (K, bits)))
        out = []
        for k, v0 in enumerate(v0s):
            nid = self.push(Node("pick", (vec_nid,), k, bits, 0))
            out.append(SymVal(self, nid, v0))
        return out

    def const_node(self, v: int) -> int:
        assert v >= 0
        return self.push(Node("const", (), v, max(v.bit_length(), 1), 0))


def _bits(v: int) -> int:
    return max(int(v).bit_length(), 1)


class SymVal:
    """Arbitrary-precision integer value traced onto a Tape.

    v0 is the exact lane-0 value (may be negative transiently, exactly like
    the scalar path's Python ints); the device node is v0 + pad.
    """

    __slots__ = ("tape", "nid", "v0")

    def __init__(self, tape: Tape, nid: int, v0: int):
        self.tape = tape
        self.nid = nid
        self.v0 = v0

    # -- helpers --

    def _node(self) -> Node:
        return self.tape.nodes[self.nid]

    @property
    def pad(self) -> int:
        return self._node().pad

    @property
    def bits(self) -> int:
        return self._node().bits

    def _coerce(self, other) -> "SymVal":
        if isinstance(other, SymVal):
            assert other.tape is self.tape
            return other
        assert isinstance(other, int)
        assert other >= 0, "negative constants must come via subtraction"
        nid = self.tape.const_node(other)
        return SymVal(self.tape, nid, other)

    # -- arithmetic --

    def __add__(self, other):
        if isinstance(other, int):
            if other == 0:
                return self
            if other < 0:
                return self.__sub__(-other)
        o = self._coerce(other)
        n = self._node()
        on = o._node()
        nid = self.tape.push(
            Node("add", (self.nid, o.nid), None, max(n.bits, on.bits) + 1,
                 n.pad + on.pad)
        )
        return SymVal(self.tape, nid, self.v0 + o.v0)

    __radd__ = __add__

    def __sub__(self, other):
        o = self._coerce(other)
        n = self._node()
        on = o._node()
        # pad so the device value cannot underflow: smallest multiple of
        # n_modulus >= 2^bits(o)
        need = 1 << on.bits
        lift = ((need + self.tape.n - 1) // self.tape.n) * self.tape.n
        nid = self.tape.push(
            Node("sub", (self.nid, o.nid), lift,
                 max(n.bits, _bits(lift)) + 1, n.pad + lift - on.pad)
        )
        assert self.tape.nodes[nid].pad >= 0
        return SymVal(self.tape, nid, self.v0 - o.v0)

    def __rsub__(self, other):
        return self._coerce(other).__sub__(self)

    def __neg__(self):
        return self._coerce(0).__sub__(self)

    def __mul__(self, other):
        if isinstance(other, int):
            if other == 1:
                return self
            if other == 0:
                return self._coerce(0)
            if other < 0:
                return (self * (-other)).__neg__()
            n = self._node()
            nid = self.tape.push(
                Node("mulc", (self.nid,), other, n.bits + _bits(other), n.pad * other)
            )
            return SymVal(self.tape, nid, self.v0 * other)
        o = self._coerce(other)
        n = self._node()
        on = o._node()
        assert n.pad == 0 and on.pad == 0, "node*node requires exact operands"
        nid = self.tape.push(Node("mul", (self.nid, o.nid), None, n.bits + on.bits, 0))
        return SymVal(self.tape, nid, self.v0 * o.v0)

    __rmul__ = __mul__

    def __mod__(self, m: int):
        assert isinstance(m, int) and m > 1
        n = self._node()
        # already canonical mod m -> identity (kills redundant Barrett divs)
        if n.mod_tag == m and n.pad == 0:
            return self
        # value provably < m (and exact, non-negative possible only if pad
        # covers the whole range... pad==0 and bits small) -> identity
        if n.pad == 0 and (1 << n.bits) <= m and self.v0 >= 0:
            out = SymVal(self.tape, self.nid, self.v0)
            n.mod_tag = m if n.mod_tag is None else n.mod_tag
            return out
        if m == self.tape.n:
            assert n.pad % m == 0, "pad must be a multiple of n for mod-n"
        else:
            assert n.pad == 0, "mod by non-native modulus requires exact value"
        if m & (m - 1) == 0:
            assert n.pad == 0
            nid = self.tape.push(Node("andmask", (self.nid,), m - 1, _bits(m - 1), 0))
        else:
            nid = self.tape.push(
                Node("mod", (self.nid,), m, _bits(m - 1), 0, mod_tag=m)
            )
        return SymVal(self.tape, nid, self.v0 % m)

    def __floordiv__(self, m: int):
        assert isinstance(m, int) and m > 0
        n = self._node()
        assert n.pad == 0, "floor-div requires exact value"
        assert self.v0 >= 0, "floor-div of negative value unsupported"
        if m & (m - 1) == 0:
            return self.__rshift__(m.bit_length() - 1)
        nid = self.tape.push(Node("div", (self.nid,), m, n.bits, 0))
        return SymVal(self.tape, nid, self.v0 // m)

    def __divmod__(self, m: int):
        return self.__floordiv__(m), self.__mod__(m)

    def __rshift__(self, k):
        k = int(k)
        n = self._node()
        assert n.pad == 0, "shift requires exact value"
        nid = self.tape.push(Node("shr", (self.nid,), k, max(n.bits - k, 1), 0))
        return SymVal(self.tape, nid, self.v0 >> k)

    def __and__(self, mask):
        mask = int(mask)
        assert mask >= 0 and (mask + 1) & mask == 0, "only 2^k-1 masks"
        n = self._node()
        assert n.pad == 0, "mask requires exact value"
        nid = self.tape.push(Node("andmask", (self.nid,), mask, _bits(mask), 0))
        return SymVal(self.tape, nid, self.v0 & mask)

    def __lshift__(self, k):
        return self.__mul__(1 << int(k))

    def __pow__(self, e, m=None):
        assert m is not None and isinstance(m, int), "pow requires a modulus"
        n = self._node()
        assert n.pad == 0
        if e == -1:
            # Fermat inverse (0 -> 0), matching utils.fields.inv_mod semantics
            nid = self.tape.push(Node("inv", (self.nid,), m, _bits(m - 1), 0, mod_tag=m))
            from ..utils.fields import inv_mod as _inv

            return SymVal(self.tape, nid, _inv(self.v0, m))
        assert e >= 0
        nid = self.tape.push(Node("powm", (self.nid,), (e, m), _bits(m - 1), 0))
        return SymVal(self.tape, nid, pow(self.v0, e, m))

    # -- comparisons / control flow (lane-0 drives the trace) --

    def __eq__(self, other):
        ov = other.v0 if isinstance(other, SymVal) else other
        return self.v0 == ov

    def __ne__(self, other):
        return not self.__eq__(other)

    def __lt__(self, other):
        ov = other.v0 if isinstance(other, SymVal) else other
        return self.v0 < ov

    def __le__(self, other):
        ov = other.v0 if isinstance(other, SymVal) else other
        return self.v0 <= ov

    def __gt__(self, other):
        ov = other.v0 if isinstance(other, SymVal) else other
        return self.v0 > ov

    def __ge__(self, other):
        ov = other.v0 if isinstance(other, SymVal) else other
        return self.v0 >= ov

    def __hash__(self):
        return id(self)

    def __bool__(self):
        return bool(self.v0)

    def __int__(self):
        raise TypeError(
            "SymVal -> int would silently freeze lane-0 for all lanes; "
            "use an explicit gather hook instead"
        )

    __index__ = __int__

    def __repr__(self):
        return f"SymVal(n{self.nid}, v0={self.v0})"


def exact_sub(a, b):
    """a - b where the result is mathematically guaranteed non-negative
    (witness-hint arithmetic like d = (b*c - a)/w). Stays pad-free so the
    result can feed exact division/shifts."""
    if isinstance(a, int) and isinstance(b, int):
        assert a >= b, "exact_sub underflow"
        return a - b
    sa = a if isinstance(a, SymVal) else b._coerce(a)
    sb = b if isinstance(b, SymVal) else a._coerce(b)
    na, nb = sa._node(), sb._node()
    assert na.pad == 0 and nb.pad == 0, "exact_sub requires exact operands"
    assert sa.v0 >= sb.v0, "exact_sub underflow on lane 0"
    nid = sa.tape.push(Node("sub", (sa.nid, sb.nid), 0, na.bits + 1, 0))
    return SymVal(sa.tape, nid, sa.v0 - sb.v0)


def assume_bits(v, k: int):
    """Tighten a value's width bound (honest-prover invariant, e.g. range-
    constrained limbs are < 2^(limb_bits + log2(times))). For ints: checked.
    For SymVal: a truncation node — sound for witness generation because the
    verifier independently checks the emitted tables."""
    if isinstance(v, int):
        assert 0 <= v < (1 << k)
        return v
    node = v._node()
    assert node.pad == 0, "width assumption requires exact value"
    assert 0 <= v.v0 < (1 << k)
    if node.bits <= k:
        return v
    v.tape.assume_checks.append((v.nid, k))
    nid = v.tape.push(Node("assume", (v.nid,), k, k, 0))
    return SymVal(v.tape, nid, v.v0)


def gather(values: List[SymVal], index: SymVal, v0_index: int) -> SymVal:
    """values[index] per lane (all values + index are nodes)."""
    tape = index.tape
    args = tuple(v.nid for v in values) + (index.nid,)
    bits = max(v._node().bits for v in values)
    assert all(v._node().pad == 0 for v in values)
    assert index._node().pad == 0
    nid = tape.push(Node("gather", args, None, bits, 0))
    return SymVal(tape, nid, values[v0_index].v0)
