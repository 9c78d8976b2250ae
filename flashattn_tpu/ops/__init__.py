"""Compute ops: Pallas kernels, golden models, and the public attention API."""
