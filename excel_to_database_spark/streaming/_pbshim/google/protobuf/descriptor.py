"""Descriptor types re-exported from the minimal runtime.
``_USE_C_DESCRIPTORS`` is False — generated modules then assign
``_serialized_start``/``_serialized_end`` attributes, which the plain
Python descriptor objects accept."""

from google.protobuf.internal.runtime_min import (  # noqa: F401
    Descriptor,
    EnumDescriptor,
    FieldDescriptor,
    FileDescriptor,
)

_USE_C_DESCRIPTORS = False
