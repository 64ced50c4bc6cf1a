"""Structured Streaming surfaces: incremental index maintenance."""
