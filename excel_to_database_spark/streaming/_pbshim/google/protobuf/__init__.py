"""Minimal ``google.protobuf`` runtime shim — ONLY active when the
real protobuf distribution is absent (see streaming.tws.ensure_protobuf,
which appends this directory to sys.path after a failed import). The
implementation lives in ``internal/runtime_min.py``; this package
mirrors the module layout protoc-generated code imports."""

__version__ = "0.0.0+etds-shim"
