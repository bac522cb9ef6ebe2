"""Shim: the timing utilities live in the package now (akaze_tpu.profiling)
so the CLI and external users get the same honest protocol."""

from akaze_tpu.profiling import scan_time, report  # noqa: F401
