"""Gencode/runtime version gate — the shim accepts any gencode version
(it implements the stable wire format, which is version-independent)."""

from enum import Enum


class Domain(Enum):
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


class VersionError(Exception):
    pass


def ValidateProtobufRuntimeVersion(  # noqa: N802 (protobuf API casing)
    domain, major, minor, patch, suffix, location
):
    return None
