"""The two hooks protoc-generated modules call after registering their
serialized file descriptor."""

from google.protobuf.internal.runtime_min import (
    build_descriptor_globals,
    build_message_classes,
)


def BuildMessageAndEnumDescriptors(file_descriptor, target_globals):  # noqa: N802
    build_descriptor_globals(file_descriptor, target_globals)


def BuildTopDescriptorsAndMessages(  # noqa: N802
    file_descriptor, module_name, target_globals
):
    build_message_classes(file_descriptor, target_globals)
