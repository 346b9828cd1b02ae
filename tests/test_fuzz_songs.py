"""Randomized song fuzzing: batched mixdown vs the oracle per-hit loop and
streaming == offline, over random patterns/instruments/synth tracks."""

import numpy as np
import pytest

import goldref.sample as gs
from synthesizer_tpu import Sample, WaveSynth
from synthesizer_tpu.sequencer import Song, SynthDef

SR = 44100
NOTES = ["C2", "E2", "G2", "C3", "E3", "G3", "C4", "E4"]
WAVES = ["sine", "triangle", "square_bl", "sawtooth_bl", "harmonics"]


def rand_song(rng):
    song = Song()
    song.bpm = int(rng.integers(120, 300))
    song.ticks = int(rng.choice([2, 4]))
    synth = WaveSynth(samplerate=SR, samplewidth=2)
    ninst = int(rng.integers(1, 4))
    for i in range(ninst):
        dur = float(rng.uniform(0.02, 0.15))
        freq = float(rng.uniform(50, 400))
        s = synth.sine(freq, dur, amplitude=float(rng.uniform(0.2, 0.7)))
        s.fadeout(dur / 2).stereo()
        song.add_instrument(f"inst{i}", s)
    nsynth = int(rng.integers(0, 3))
    for i in range(nsynth):
        kw = {}
        wave = WAVES[rng.integers(len(WAVES))]
        if wave == "harmonics":
            kw["harmonics"] = (1.0, 0.5, 0.25)
        song.add_synth(f"syn{i}", SynthDef(
            wave=wave, amplitude=float(rng.uniform(0.1, 0.4)),
            attack=float(rng.uniform(0, 0.02)),
            decay=float(rng.uniform(0, 0.05)),
            sustain_level=float(rng.uniform(0.3, 0.9)),
            release=float(rng.uniform(0.01, 0.1)),
            pan=float(rng.uniform(-0.8, 0.8)), **kw))
    npat = int(rng.integers(1, 3))
    for p in range(npat):
        nticks = int(rng.choice([8, 16]))
        tracks = {}
        for i in range(ninst):
            if rng.random() < 0.8:
                tracks[f"inst{i}"] = "".join(
                    "x" if rng.random() < 0.3 else "." for _ in range(nticks))
        for i in range(nsynth):
            if rng.random() < 0.8:
                toks = []
                for _ in range(nticks):
                    r = rng.random()
                    if r < 0.25:
                        toks.append(NOTES[rng.integers(len(NOTES))])
                    elif r < 0.45 and toks and toks[-1] not in (".",):
                        toks.append("-")
                    else:
                        toks.append(".")
                tracks[f"syn{i}"] = " ".join(toks)
        if tracks:
            song.add_pattern(f"p{p}", tracks)
    song.pattern_sequence = [f"p{i}" for i in
                             rng.integers(0, npat, size=int(rng.integers(1, 4)))
                             if f"p{i}" in song.patterns]
    if not song.pattern_sequence and song.patterns:
        song.pattern_sequence = [next(iter(song.patterns))]
    return song


def oracle_drum_mix(song: Song, total_frames: int) -> np.ndarray:
    out = gs.Sample(np.zeros((total_frames, 2), np.int32), SR, 4, 2)
    sched = song.compile_schedule()
    for inst_i, start in sched.hits:
        arr = song.instruments[sched.instruments[inst_i]].get_frame_array()
        g = gs.Sample(arr.astype(np.int32), SR, 4, 2)
        out.mix_at(start / SR, g, pad_shortest=False)
    return out.frames


@pytest.mark.parametrize("seed", range(8))
def test_random_song(seed):
    rng = np.random.default_rng(seed + 5000)
    song = rand_song(rng)
    if not song.pattern_sequence:
        pytest.skip("empty song")
    offline = song.mix(normalize=False)
    if offline.nframes == 0:
        return
    # streaming == offline
    chunks = [c.get_frame_array() for c in song.mix_generator(chunk_frames=977)]
    if chunks:
        got = np.concatenate(chunks)
        np.testing.assert_array_equal(got, offline.get_frame_array()[:len(got)],
                                      err_msg=f"seed {seed}")
    # drum part matches the oracle per-hit loop (subtract the synth part)
    voices = song.compile_synth_voices()
    if not voices:
        want32 = oracle_drum_mix(song, offline.nframes)
        want = np.clip(want32, -32768, 32767).astype(np.int16)
        np.testing.assert_array_equal(offline.get_frame_array(), want,
                                      err_msg=f"seed {seed}")
