"""Host-side utilities: WAV I/O and small helpers."""

from . import wavio  # noqa: F401
