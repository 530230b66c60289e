"""Utilities: score statistics, logging, profiling helpers."""
