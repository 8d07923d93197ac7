"""Structured Streaming replay wrapper."""

from .rollup import IncrementalRollup  # noqa: F401
from .stream import replay_available, start_replay  # noqa: F401
