"""Structured Streaming replay wrapper."""

from .stream import replay_available, start_replay  # noqa: F401
