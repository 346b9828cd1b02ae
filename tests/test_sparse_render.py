"""VoiceBank.render_song_sparse: per-chunk active-voice bucketing.

The sparse path renders each chunk over K = max-concurrent gathered
voice rows instead of all V (the bank analog of the pitched sampler's
hit bucketing).  Contract: output == the flat render within 1 LSB at
int16 — the only difference is the [K, 2] vs [V, 2] pan matmul's f32
reduction tree (same class as render_song_grouped / the mesh psum
path); silent chunks are EXACT zeros.
"""

import numpy as np
import pytest

from synthesizer_tpu.models.voicebank import (Voice, VoiceBank,
                                              pack_voices)

SR = 44100


def _sparse_voices(nnotes=60, seed=0, waves=("sine", "sawtooth_bl",
                                             "harmonics", "triangle")):
    """A long sparse song: nnotes short notes spread over ~nnotes/2 s,
    a few sounding at once, crossing many chunk boundaries."""
    rng = np.random.default_rng(seed)
    voices = []
    t = 0.0
    for i in range(nnotes):
        t += float(rng.uniform(0.02, 0.5))
        w = waves[i % len(waves)]
        voices.append(Voice(
            wave=w, frequency=float(rng.uniform(80, 2000)),
            amplitude=float(rng.uniform(0.05, 0.25)),
            pan=float(rng.uniform(-1, 1)), start=round(t, 3),
            duration=float(rng.uniform(0.05, 0.6)),
            attack=0.005, decay=0.05, sustain_level=0.7, release=0.1,
            harmonics=(1.0, 0.5, 0.25) if w == "harmonics" else (),
            fm_frequency=5.0 if i % 5 == 0 else 0.0,
            fm_depth=0.01 if i % 5 == 0 else 0.0))
    return voices


def _bank_and_vp(voices, chunk=8192):
    vp, layout = pack_voices(voices, SR, num_harmonics=8,
                             sort_by_wave=True)
    bank = VoiceBank.for_voices(voices, SR, num_harmonics=8,
                                chunk_frames=chunk, layout=layout,
                                nvoices=layout.nvoices)
    return bank, vp


def _total(voices):
    return max(int((v.start + v.attack + v.decay
                    + max(v.duration - v.attack - v.decay, 0.0)
                    + v.release) * SR) + 1 for v in voices) + SR // 10


def test_sparse_matches_flat_within_1lsb():
    voices = _sparse_voices()
    bank, vp = _bank_and_vp(voices)
    total = _total(voices)
    assert bank.sparse_plan(vp, total) is not None
    flat = np.asarray(bank.to_int16(bank.render_song(vp, total)))
    sparse = np.asarray(bank.to_int16(bank.render_song_sparse(vp, total)))
    assert flat.shape == sparse.shape
    diff = np.abs(flat.astype(np.int32) - sparse.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    # and it must actually be the bucketed program, not the fallback
    assert np.abs(flat).max() > 1000


def test_sparse_matches_flat_with_curves():
    """Bend chirp + amp + FM-depth curve segments gather with their
    voices (the [V, S] fields take the same row indices)."""
    voices = _sparse_voices(40, seed=3)
    voices[5] = Voice(wave="sine", frequency=440.0, amplitude=0.2,
                      start=voices[5].start, duration=1.5,
                      attack=0.01, decay=0.05, sustain_level=0.8,
                      release=0.3,
                      pitch_curve=((0.0, 1.0), (0.5, 1.0), (1.0, 1.06)),
                      amp_curve=((0.0, 1.0), (0.8, 1.0), (1.4, 0.2)))
    voices[11] = Voice(wave="triangle", frequency=330.0, amplitude=0.2,
                       start=voices[11].start, duration=1.2,
                       attack=0.01, decay=0.05, sustain_level=0.8,
                       release=0.2, fm_frequency=5.5,
                       fm_depth_curve=((0.0, 0.0), (0.4, 0.0),
                                       (1.0, 0.012)))
    bank, vp = _bank_and_vp(voices)
    assert bank.use_bend and bank.use_amp and bank.use_dmod
    total = _total(voices)
    assert bank.sparse_plan(vp, total) is not None
    flat = np.asarray(bank.to_int16(bank.render_song(vp, total)))
    sparse = np.asarray(bank.to_int16(bank.render_song_sparse(vp, total)))
    diff = np.abs(flat.astype(np.int32) - sparse.astype(np.int32))
    assert diff.max() <= 1, diff.max()


def test_sparse_silent_gap_is_exact_zero():
    """A chunk with no active voices renders EXACT zeros (every pad
    slot reads the sentinel row)."""
    voices = [Voice(wave="sine", frequency=440.0, amplitude=0.3,
                    start=0.0, duration=0.1, release=0.05),
              Voice(wave="sine", frequency=550.0, amplitude=0.3,
                    start=5.0, duration=0.1, release=0.05)]
    # force the bucketed path past the cost heuristic with pad voices
    voices += [Voice(amplitude=0.0, frequency=0.0, duration=0.0)] * 30
    bank, vp = _bank_and_vp(voices, chunk=4096)
    total = int(5.5 * SR)
    out = np.asarray(bank.render_song_sparse(vp, total))
    gap = out[SR:4 * SR]                       # 1 s .. 4 s: nothing sounds
    assert np.all(gap == 0.0)
    assert np.abs(out[: SR // 2]).max() > 0.0
    assert np.abs(out[int(5.0 * SR):int(5.2 * SR)]).max() > 0.0


def test_sparse_dense_bank_falls_back():
    """A dense bank (all voices sounding together) keeps the flat
    grouped render — same object, bit-identical output."""
    voices = [Voice(wave="sine", frequency=220.0 * (1 + 0.1 * i),
                    amplitude=0.05, start=0.0, duration=1.0)
              for i in range(16)]
    bank, vp = _bank_and_vp(voices)
    total = int(1.2 * SR)
    a = np.asarray(bank.render_song(vp, total))
    b = np.asarray(bank.render_song_sparse(vp, total))
    np.testing.assert_array_equal(a, b)


def test_sparse_chunk_boundary_continuity():
    """A note spanning a chunk boundary renders identically to the flat
    path on both sides (the bucket range includes every chunk the
    note's ADSR touches, +2 frames of slack)."""
    chunk = 2048
    voices = _sparse_voices(50, seed=7)
    bank, vp = _bank_and_vp(voices, chunk=chunk)
    total = _total(voices)
    assert bank.sparse_plan(vp, total) is not None
    flat = np.asarray(bank.to_int16(bank.render_song(vp, total)))
    sparse = np.asarray(bank.to_int16(bank.render_song_sparse(vp, total)))
    diff = np.abs(flat.astype(np.int32) - sparse.astype(np.int32))
    assert diff.max() <= 1, diff.max()


def test_render_midi_routes_sparse(monkeypatch):
    """A long sparse MIDI file routes through render_song_sparse's
    bucketed program; a short dense one falls back to render_song."""
    from synthesizer_tpu import midi as M
    from synthesizer_tpu.models import voicebank as vb
    calls = []
    orig = vb._bank_bucketed_fn

    def spy(*a, **k):
        calls.append(a)
        return orig(*a, **k)

    monkeypatch.setattr(vb, "_bank_bucketed_fn", spy)
    notes = [M.MidiNote(0.4 * i, 0.2, 60 + (i % 12), 100, 0)
             for i in range(64)]
    s = M.render_notes(notes, {0: M.SynthDef(wave="sine",
                                             amplitude=0.3)})
    assert calls and np.abs(s.get_frame_array()).max() > 1000
    # a dense chord cluster must FALL BACK to the flat grouped render
    calls.clear()
    dense = [M.MidiNote(0.0, 1.0, 48 + i, 100, 0) for i in range(12)]
    s2 = M.render_notes(dense, {0: M.SynthDef(wave="sine",
                                              amplitude=0.1)})
    assert not calls and np.abs(s2.get_frame_array()).max() > 1000
    # and sparse=False forces the flat render even for sparse files
    calls.clear()
    s3 = M.render_notes(notes, {0: M.SynthDef(wave="sine",
                                              amplitude=0.3)},
                        sparse=False)
    assert not calls and np.abs(s3.get_frame_array()).max() > 1000


def test_sparse_short_gate_long_attack_not_truncated():
    """_adsr runs to max(gate, attack+decay) + release — a short-gate
    voice with a long attack must stay bucketed through its whole
    envelope, not just gate+release."""
    voices = [Voice(wave="sine", frequency=440.0, amplitude=0.3,
                    start=0.5, duration=0.05,       # gate 0.05 s …
                    attack=0.8, decay=0.2,          # … but A+D = 1.0 s
                    sustain_level=0.7, release=0.3)]
    voices += [Voice(wave="sine", frequency=200.0 + i, amplitude=0.05,
                     start=3.0 + 0.2 * i, duration=0.1, release=0.05)
               for i in range(40)]
    bank, vp = _bank_and_vp(voices, chunk=2048)
    total = int(12.0 * SR)
    assert bank.sparse_plan(vp, total) is not None
    flat = np.asarray(bank.to_int16(bank.render_song(vp, total)))
    sparse = np.asarray(bank.to_int16(bank.render_song_sparse(vp, total)))
    diff = np.abs(flat.astype(np.int32) - sparse.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    # the long-attack voice audibly rings well past gate+release
    seg = flat[int(1.3 * SR):int(1.5 * SR)]
    assert np.abs(seg).max() > 500
