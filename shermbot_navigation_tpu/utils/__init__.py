"""Utilities: robot description, tracing/benchmark harness, structured logs."""
