"""Pattern sequencer: .ini song model -> batched device mixdown.

Rebuild of the reference's ``trackmixer.py`` song layer (SURVEY.md §3.1
row 8, §4.2).  Song files use the same schema:

    [song]
    bpm = 128
    ticks = 4
    patterns = pat1 pat2 pat1
    [paths]                      ; optional
    samples = samples/
    [instruments]
    kick = kick.wav
    [pattern.pat1]
    kick  = x... x... x... x...
    snare = .... x... .... x...

Where the reference mixes offline with a Python loop of per-hit
``Sample.mix_at`` calls (audioop.add per hit — the §4.2 hot loop), this
implementation compiles the whole song to **one batched device render**:
instrument samples are padded into a bank array, every hit becomes a row of
a gather, and a single scatter-add over the widened int32 output buffer
places all hits at once (BASELINE.json: "single batched render over all
tracks and patterns").  Streaming playback renders fixed-size chunks on
device from the same hit schedule (host control / device chunks).
"""

from __future__ import annotations

import configparser
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import params
from .sample import Sample

__all__ = ["Song", "HitSchedule"]


class HitSchedule:
    """A flat schedule of (instrument index, start frame) hits plus the
    padded instrument bank — the device-side song representation."""

    def __init__(self, bank: np.ndarray, lengths: np.ndarray,
                 instruments: Sequence[str], hits: np.ndarray,
                 samplerate: int, nchannels: int):
        self.bank = bank              # [S, Lmax, C] int32 (unscaled values)
        self.lengths = lengths        # [S] valid frames per instrument
        self.instruments = list(instruments)
        self.hits = hits              # [H, 2] (instrument_idx, start_frame)
        self.samplerate = samplerate
        self.nchannels = nchannels

    @property
    def total_frames(self) -> int:
        if len(self.hits) == 0:
            return 0
        ends = self.hits[:, 1] + self.lengths[self.hits[:, 0]]
        return int(ends.max())


def _mixdown_kernel(bank: jax.Array, hits_inst: jax.Array,
                    hits_start: jax.Array, total: int) -> jax.Array:
    """All hits -> one scatter-add into the widened int32 song buffer.

    bank: [S, Lmax, C] int32; hits: [H].  Builds [H, Lmax] frame indices
    (clipped rows drop via mode='drop') and scatter-adds the gathered
    waveforms in one XLA op.
    """
    H = hits_inst.shape[0]
    Lmax = bank.shape[1]
    C = bank.shape[2]
    vals = bank[hits_inst]                                    # [H, Lmax, C]
    idx = hits_start[:, None] + jnp.arange(Lmax, dtype=jnp.int32)[None, :]
    out = jnp.zeros((total, C), jnp.int32)
    return out.at[idx.reshape(-1)].add(vals.reshape(-1, C), mode="drop")


class Song:
    """Sample-based pattern song (the trackmixer model)."""

    def __init__(self):
        self.bpm = 128
        self.ticks = 4
        self.pattern_sequence: List[str] = []
        self.patterns: Dict[str, Dict[str, str]] = {}
        self.instruments: Dict[str, Sample] = {}
        self.samplerate = params.norm_samplerate
        self.nchannels = params.norm_nchannels

    # -- loading ----------------------------------------------------------

    @classmethod
    def from_ini(cls, ini_file: str, sample_dir: Optional[str] = None) -> "Song":
        song = cls()
        song.read(ini_file, sample_dir)
        return song

    def read(self, ini_file: str, sample_dir: Optional[str] = None) -> None:
        cp = configparser.ConfigParser(inline_comment_prefixes=(";", "#"))
        with open(ini_file) as f:
            cp.read_file(f)
        self.bpm = cp.getint("song", "bpm")
        self.ticks = cp.getint("song", "ticks")
        self.pattern_sequence = cp.get("song", "patterns").split()
        base = sample_dir
        if base is None:
            base = cp.get("paths", "samples", fallback="")
            if not os.path.isabs(base):
                base = os.path.join(os.path.dirname(os.path.abspath(ini_file)), base)
        for name, filename in cp.items("instruments"):
            smp = Sample(wave_file=os.path.join(base, filename), name=name)
            smp.normalize()
            self.instruments[name] = smp
            self.samplerate = smp.samplerate
            self.nchannels = smp.nchannels
        for section in cp.sections():
            if section.startswith("pattern."):
                pname = section[len("pattern."):]
                self.patterns[pname] = {inst: pat.replace(" ", "")
                                        for inst, pat in cp.items(section)}

    def add_instrument(self, name: str, sample: Sample) -> None:
        sample = sample.copy().normalize()
        self.instruments[name] = sample
        self.samplerate = sample.samplerate
        self.nchannels = sample.nchannels

    def add_pattern(self, name: str, tracks: Dict[str, str]) -> None:
        self.patterns[name] = {k: v.replace(" ", "") for k, v in tracks.items()}

    # -- schedule compilation ----------------------------------------------

    @property
    def tick_duration(self) -> float:
        return 60.0 / self.bpm / self.ticks

    def pattern_ticks(self, pattern: Dict[str, str]) -> int:
        return max((len(p) for p in pattern.values()), default=0)

    def compile_schedule(self) -> HitSchedule:
        """Song -> flat hit schedule + padded device instrument bank."""
        names = sorted(self.instruments)
        index = {n: i for i, n in enumerate(names)}
        arrays = [self.instruments[n].get_frame_array().astype(np.int32)
                  for n in names]
        lmax = max((len(a) for a in arrays), default=1)
        C = self.nchannels
        bank = np.zeros((max(len(arrays), 1), lmax, C), np.int32)
        lengths = np.zeros(max(len(arrays), 1), np.int64)
        for i, a in enumerate(arrays):
            bank[i, :len(a)] = a
            lengths[i] = len(a)

        hits: List[Tuple[int, int]] = []
        tickf = self.tick_duration * self.samplerate
        bar_start_ticks = 0
        for pname in self.pattern_sequence:
            pattern = self.patterns[pname]
            nticks = self.pattern_ticks(pattern)
            for inst, patstr in pattern.items():
                if inst not in index:
                    raise KeyError(f"pattern {pname} uses unknown instrument {inst}")
                for t, ch in enumerate(patstr):
                    if ch not in ". ":
                        start = int((bar_start_ticks + t) * tickf)
                        hits.append((index[inst], start))
            bar_start_ticks += nticks
        hits_arr = np.asarray(hits, np.int64).reshape(-1, 2)
        return HitSchedule(bank, lengths, names, hits_arr,
                           self.samplerate, C)

    # -- offline mixdown ------------------------------------------------------

    def mix(self, normalize: bool = True, tail_seconds: float = 0.3) -> Sample:
        """Offline song mixdown as one batched device render.

        Sums all hits in a widened int32 buffer (overflow-free headroom, the
        reference's make_32bit trick), then narrows: with ``normalize`` the
        peak is amplified to full scale first (make_16bit semantics),
        otherwise values saturate at int16.
        """
        sched = self.compile_schedule()
        total = sched.total_frames + int(tail_seconds * self.samplerate)
        if len(sched.hits) == 0:
            return Sample.from_raw_frames(b"", 2, self.samplerate, self.nchannels)
        out32 = _mixdown_kernel(
            jnp.asarray(sched.bank),
            jnp.asarray(sched.hits[:, 0].astype(np.int32)),
            jnp.asarray(sched.hits[:, 1].astype(np.int32)),
            total)
        if normalize:
            mixed = Sample.from_jax(out32, self.samplerate, 4, name="mixdown")
            return mixed.make_16bit(maximize_amplitude=True)
        out16 = jnp.clip(out32, -32768, 32767).astype(jnp.int16)
        return Sample.from_jax(out16, self.samplerate, 2, name="mixdown")

    # -- streaming mixdown ------------------------------------------------------

    def mix_generator(self, chunk_frames: Optional[int] = None) -> Iterator[Sample]:
        """Stream the song as fixed-size chunks rendered on device.

        Host control flow walks the hit schedule; each chunk is one device
        gather+sum over the (bounded) set of hits overlapping the chunk.
        Output is bit-identical to ``mix(normalize=False)``, sliced (the
        streaming path saturates at int16; it cannot normalize because the
        global peak is not known until the song ends).
        """
        sched = self.compile_schedule()
        cf = chunk_frames or params.norm_frames_per_chunk
        total = sched.total_frames
        if total == 0:
            return
        lmax = sched.bank.shape[1]
        C = sched.nchannels
        bank = jnp.asarray(sched.bank)
        starts = sched.hits[:, 1]
        insts = sched.hits[:, 0]

        # static bound on concurrently-sounding hits per chunk
        max_active = 1
        for c0 in range(0, total, cf):
            act = ((starts < c0 + cf) & (starts + sched.lengths[insts] > c0)).sum()
            max_active = max(max_active, int(act))

        @jax.jit
        def chunk_fn(inst_k, start_k, valid_k, c0):
            # rows: [K, cf] sample positions inside each hit's waveform
            pos = (c0 + jnp.arange(cf, dtype=jnp.int32))[None, :] - start_k[:, None]
            inrange = (pos >= 0) & (pos < lmax) & valid_k[:, None]
            pos_c = jnp.clip(pos, 0, lmax - 1)
            vals = bank[inst_k[:, None], pos_c]          # [K, cf, C]
            vals = jnp.where(inrange[:, :, None], vals, 0)
            acc = vals.sum(axis=0)                        # int32 [cf, C]
            v = jnp.clip(acc, -32768, 32767).astype(jnp.int16)
            return v

        K = max_active
        for c0 in range(0, total, cf):
            sel = (starts < c0 + cf) & (starts + sched.lengths[insts] > c0)
            ii = insts[sel][:K]
            ss = starts[sel][:K]
            pad = K - len(ii)
            inst_k = jnp.asarray(np.concatenate([ii, np.zeros(pad, np.int64)]).astype(np.int32))
            start_k = jnp.asarray(np.concatenate([ss, np.zeros(pad, np.int64)]).astype(np.int32))
            valid_k = jnp.asarray(np.concatenate([np.ones(len(ii), bool),
                                                  np.zeros(pad, bool)]))
            chunk = chunk_fn(inst_k, start_k, valid_k, jnp.int32(c0))
            n = min(cf, total - c0)
            yield Sample.from_jax(chunk[:n], self.samplerate, 2, name=f"chunk@{c0}")
