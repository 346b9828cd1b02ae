"""jukebox — playlist music player demo (reference's jukebox/ app)."""
