"""Multi-device scaling: voice-axis sharding over a jax Mesh."""

from .mesh import voice_mesh, render_song_sharded  # noqa: F401
