"""Synthesis models: the oscillator patch spec, its device lowering, and the
batched voice-bank render engine (the framework's flagship model)."""

from . import spec  # noqa: F401
