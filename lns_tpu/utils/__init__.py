"""Utilities: torch checkpoint import, profiling, debug helpers."""
