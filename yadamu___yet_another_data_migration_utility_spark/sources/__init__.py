"""Table formats and changelog sources."""

from .laketable import LakeTable  # noqa: F401
