"""Namespace shell for the minimal protobuf shim (see
``google/protobuf/internal/runtime_min.py`` for scope and rationale).
Declared as a pkgutil-style namespace package so a real ``google.*``
distribution appearing later on sys.path still wins for its own
subpackages."""

__path__ = __import__("pkgutil").extend_path(__path__, __name__)
