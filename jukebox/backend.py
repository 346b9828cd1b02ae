"""Music-library backend: sqlite track index + search.

Rebuild of the reference jukebox's library backend (SURVEY.md §3.1 row 10:
"music-library indexing backend (sqlite)").  Scans directories for audio
files, stores (path, title, duration, format) rows, and serves searches for
the player UI.  Runs in-process (the upstream history's separate RPC'd
process is unnecessary complexity at this scale).
"""

from __future__ import annotations

import os
import sqlite3
import wave


def _probe(path):
    """(duration_seconds, rate, nch) from the container HEADERS only —
    no PCM is decoded (indexing directories of long files stays O(1)
    per file)."""
    from synthesizer_tpu.utils.decoders import probe_audio_file
    nframes, rate, nch = probe_audio_file(path)
    return (nframes / rate if rate else 0.0), rate, nch
from typing import List, NamedTuple, Optional

AUDIO_EXTENSIONS = (".wav", ".wave", ".aif", ".aiff", ".aifc", ".au",
                    ".snd", ".mp3", ".mp2", ".ogg", ".oga", ".opus",
                    ".flac", ".m4a", ".aac", ".wma", ".mka", ".webm",
                    ".mod", ".xm", ".it", ".s3m", ".mptm")


class Track(NamedTuple):
    track_id: int
    path: str
    title: str
    duration: float
    samplerate: int
    nchannels: int


class MusicLibrary:
    """sqlite-backed track index."""

    def __init__(self, db_path: str = ":memory:"):
        self.db = sqlite3.connect(db_path)
        self.db.execute(
            """CREATE TABLE IF NOT EXISTS tracks (
                   id INTEGER PRIMARY KEY,
                   path TEXT UNIQUE NOT NULL,
                   title TEXT NOT NULL,
                   duration REAL NOT NULL DEFAULT 0,
                   samplerate INTEGER NOT NULL DEFAULT 0,
                   nchannels INTEGER NOT NULL DEFAULT 0)""")
        self.db.commit()

    def scan(self, directory: str) -> int:
        """Index every audio file under a directory; returns #added."""
        added = 0
        for root, _dirs, files in os.walk(directory):
            for fn in sorted(files):
                if not fn.lower().endswith(AUDIO_EXTENSIONS):
                    continue
                path = os.path.join(root, fn)
                if self._probe_and_insert(path):
                    added += 1
        self.db.commit()
        return added

    def _probe_and_insert(self, path: str) -> bool:
        title = os.path.splitext(os.path.basename(path))[0]
        if path.lower().endswith((".mod", ".xm", ".it", ".s3m", ".mptm")):
            # tracker modules carry an embedded song title
            try:
                from synthesizer_tpu.utils.modules import module_title
                title = module_title(path) or title
            except Exception:
                pass
        duration, rate, nch = 0.0, 0, 0
        if path.lower().endswith((".wav", ".wave")):
            try:
                with wave.open(path, "rb") as w:
                    rate = w.getframerate()
                    nch = w.getnchannels()
                    duration = w.getnframes() / rate
            except Exception:
                # compressed WAV: header-only in-process probe
                try:
                    duration, rate, nch = _probe(path)
                except Exception:
                    return False
        elif path.lower().endswith((".aif", ".aiff", ".aifc", ".au",
                                    ".snd", ".flac", ".mp3", ".mp2",
                                    ".ogg", ".oga", ".opus", ".mod",
                                    ".xm", ".it", ".s3m", ".mptm",
                                    ".m4a", ".aac", ".mp4", ".wma",
                                    ".mka", ".webm")):
            # in-process formats (round 3): full duration metadata with
            # no external binary — mp3/ogg via the system codec library
            # bindings, m4a/aac/wma/mka via the libav catch-all shim
            # when present, headers only.  A file the probe
            # cannot parse still gets indexed with zero duration (an
            # ffmpeg-equipped deck may play it anyway)
            try:
                duration, rate, nch = _probe(path)
            except Exception:
                pass
        try:
            self.db.execute(
                "INSERT OR IGNORE INTO tracks(path, title, duration, samplerate, nchannels) "
                "VALUES (?, ?, ?, ?, ?)", (path, title, duration, rate, nch))
            return True
        except sqlite3.Error:
            return False

    def search(self, query: str = "") -> List[Track]:
        cur = self.db.execute(
            "SELECT id, path, title, duration, samplerate, nchannels FROM tracks "
            "WHERE title LIKE ? ORDER BY title", (f"%{query}%",))
        return [Track(*row) for row in cur.fetchall()]

    def get(self, track_id: int) -> Optional[Track]:
        cur = self.db.execute(
            "SELECT id, path, title, duration, samplerate, nchannels FROM tracks "
            "WHERE id = ?", (track_id,))
        row = cur.fetchone()
        return Track(*row) if row else None

    def close(self) -> None:
        self.db.close()
