"""Message base + DecodeError, re-exported from the minimal runtime."""

from google.protobuf.internal.runtime_min import Message  # noqa: F401


class DecodeError(Exception):
    pass


class EncodeError(Exception):
    pass
