"""Round-4 catalog entries: composite-key CDC replay and measured skew
evidence. Filled in as the underlying LakeTable composite-key support
lands (see sources/laketable.py ``key`` handling)."""

from __future__ import annotations
