"""The int_mul witness template — the framework's flagship inner loop.

One instance = `assign_w(a); assign_w(b); int_mul(a, b)` for bn254-Fq-over-Fr
(the hot path of every MSM/pairing circuit, integer_chip.rs:466-483). The
traced Template batches B instances into one XLA program; bench.py,
__graft_entry__ and parallel/mesh.py all share this single definition.
"""

from __future__ import annotations

from ..batch.template import Template
from ..ops.integer_ops import IntegerContext
from ..utils.fields import BN254_FQ

_TEMPLATE = None


def int_mul_template() -> Template:
    """Trace (once per process) the batched int_mul witness template."""
    global _TEMPLATE
    if _TEMPLATE is None:

        def build(ctx, ins):
            ictx = IntegerContext(ctx, BN254_FQ)
            a = ictx.assign_w(ins["a"])
            b = ictx.assign_w(ins["b"])
            return ictx.int_mul(a, b)

        _TEMPLATE = Template.trace(
            build,
            {"a": (254, 1234567890 % BN254_FQ), "b": (254, 987654321 % BN254_FQ)},
        )
    return _TEMPLATE
