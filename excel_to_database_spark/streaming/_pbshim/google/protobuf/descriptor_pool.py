"""Descriptor pool: parses the serialized FileDescriptorProto blob the
generated module registers (public descriptor.proto schema — see
internal/runtime_min.py)."""

from google.protobuf.internal.runtime_min import parse_file_descriptor


class DescriptorPool:
    def __init__(self):
        self._files = {}

    def AddSerializedFile(self, blob):  # noqa: N802
        fd = parse_file_descriptor(bytes(blob))
        self._files[fd.name] = fd
        return fd

    def FindFileByName(self, name):  # noqa: N802
        return self._files[name]


_DEFAULT = DescriptorPool()


def Default():  # noqa: N802
    return _DEFAULT
