"""Columnar type system: tensor / nested / quantized Arrow columns.

Capability parity with the reference's experimental ``fenix.ex.arrow``
layer (SURVEY.md §1 L1) — but importable (JSON metadata, no undeclared
deps) and registered so the types round-trip through IPC files and the
Flight wire.
"""

from fenix_tpu.types import nested, quint8, tensor
from fenix_tpu.types.nested import NestedTensorArray, NestedTensorType
from fenix_tpu.types.quint8 import QUInt8NDArray, QUInt8TensorArray, QUInt8TensorType
from fenix_tpu.types.tensor import TensorArray, TensorType


def register_all() -> None:
    tensor.register()
    nested.register()
    quint8.register()


__all__ = [
    "tensor",
    "nested",
    "quint8",
    "TensorArray",
    "TensorType",
    "NestedTensorArray",
    "NestedTensorType",
    "QUInt8NDArray",
    "QUInt8TensorArray",
    "QUInt8TensorType",
    "register_all",
]
