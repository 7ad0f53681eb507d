"""Streaming execution of the extraction pipeline."""

from .stream import extract_stream, run_stream_once  # noqa: F401
