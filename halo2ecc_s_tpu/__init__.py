"""halo2ecc-s-tpu: TPU-native halo2 ECC circuit witness framework.

See README.md for the architecture and PARITY.md for the component inventory
vs the DelphinusLab/halo2ecc-s reference.
"""

__version__ = "0.1.0"

from .core.context import Context  # noqa: F401
from .ops.integer_ops import IntegerContext  # noqa: F401


def native_scalar_ecc_context(*args, **kwargs):
    from .ops.ecc_ops import NativeScalarEccContext

    return NativeScalarEccContext(*args, **kwargs)


def general_scalar_ecc_context(*args, **kwargs):
    from .ops.ecc_ops import GeneralScalarEccContext

    return GeneralScalarEccContext(*args, **kwargs)
