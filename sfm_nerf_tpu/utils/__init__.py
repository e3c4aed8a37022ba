"""Metrics, profiling and logging utilities."""
