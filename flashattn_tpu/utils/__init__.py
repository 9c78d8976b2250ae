"""Utilities: platform detection, timing/benchmark harness, testing helpers."""
