"""WaveSynth / oscillator API tests, including benchmark configs 1 & 2.

Config 1 (BASELINE.json): 2 s 440 Hz sine -> 44.1 kHz 16-bit mono WAV,
compared to the oracle within 1 LSB.
Config 2: 8-voice FM + harmonics additive bank with ADSR -> stereo WAV.
"""

import io

import numpy as np
import pytest

import goldref.osc as go
from synthesizer_tpu import Sample, WaveSynth, key_freq, note_freq
from synthesizer_tpu import oscillators as osc
from synthesizer_tpu.models import spec as S

SR = 44100


def test_key_and_note_freq():
    assert key_freq(49) == pytest.approx(440.0)
    assert key_freq(40) == pytest.approx(261.6255653)  # middle C
    assert note_freq("A", 4) == pytest.approx(440.0)
    assert note_freq("A4") == pytest.approx(440.0)
    assert note_freq("C#5") == pytest.approx(554.3652620)
    assert note_freq("Eb2") == pytest.approx(77.7817459)


def test_config1_sine_440_vs_oracle(tmp_path):
    synth = WaveSynth(samplerate=SR, samplewidth=2)
    s = synth.sine(440.0, 2.0)
    assert s.nframes == 2 * SR and s.nchannels == 1 and s.samplewidth == 2
    want = go.to_int_samples(
        go.render_oracle(S.Osc("sine", 440.0, 0.9999), 2 * SR, SR), 2)
    got = s.get_frame_array()[:, 0]
    assert np.abs(got.astype(np.int64) - want.astype(np.int64)).max() <= 1
    # WAV round trip is bit-stable
    p = str(tmp_path / "c1.wav")
    s.write_wav(p)
    assert Sample(wave_file=p) == s


def test_config2_fm_harmonics_adsr_bank(tmp_path):
    """8 voices: 4 FM sines + 4 harmonics stacks, ADSR, mixed to stereo."""
    synth = WaveSynth(samplerate=SR, samplewidth=2)
    dur = 0.5
    total = Sample.from_raw_frames(b"", 2, SR, 2)
    for v in range(8):
        freq = key_freq(40 + 3 * v)
        if v % 2 == 0:
            vib = osc.Sine(5 + v, amplitude=0.01, samplerate=SR)
            voice = osc.Sine(freq, amplitude=0.2, fm_lfo=vib, samplerate=SR)
        else:
            voice = osc.Harmonics(freq, [(1, 0.5), (2, 0.25), (3, 0.12), (4, 0.06)],
                                  amplitude=0.4, samplerate=SR)
        voice = osc.EnvelopeFilter(voice, 0.02, 0.05, dur - 0.17, 0.6, 0.1)
        s = synth.render_oscillator(voice, dur).stereo()
        total.mix(s)
    assert total.nframes == int(dur * SR) and total.nchannels == 2
    peak = np.abs(total.get_frame_array()).max()
    assert 0 < peak <= 32767
    total.write_wav(str(tmp_path / "c2.wav"))


def test_gen_variants_match_eager():
    synth = WaveSynth(samplerate=SR, samplewidth=2)
    gen = synth.sine_gen(440.0)
    chunks = [next(gen) for _ in range(4)]
    got = np.concatenate([c.get_frame_array() for c in chunks])[:, 0]
    want = synth.sine(440.0, (len(got) + 1) / SR).get_frame_array()[:len(got), 0]
    np.testing.assert_array_equal(got, want)


def test_oscillator_blocks_api():
    o = osc.Triangle(220.0, amplitude=0.5, samplerate=SR)
    blocks = []
    for i, b in enumerate(o.blocks(512)):
        blocks.append(b)
        if i == 3:
            break
    v = np.concatenate(blocks)
    assert v.dtype == np.float32 and len(v) == 4 * 512
    assert np.abs(v).max() <= 0.5 + 1e-6


def test_envelope_stop_at_end():
    o = osc.EnvelopeFilter(osc.Sine(440.0, samplerate=SR),
                           0.01, 0.01, 0.05, 0.5, 0.01, stop_at_end=True)
    n = sum(len(b) for b in o.blocks(512))
    expected_end = int((0.01 + 0.01 + 0.05 + 0.01) * SR)
    assert expected_end <= n <= expected_end + 2 * 512
    assert o.duration == pytest.approx(0.08)


def test_filters_compose():
    a = osc.Sine(440.0, amplitude=0.3, samplerate=SR)
    b = osc.Square(110.0, amplitude=0.2, samplerate=SR)
    patch = osc.EchoFilter(
        osc.ClipFilter(osc.MixingFilter(a, b, osc.AbsFilter(a))),
        after=0.05, amount=2, delay=0.02, decay=0.4)
    v = np.asarray(patch.render(4096))
    assert v.shape == (4096,) and np.isfinite(v).all()


def test_white_noise_deterministic_and_seeded():
    s1 = WaveSynth(SR, 2).white_noise(duration=0.05, seed=7)
    s2 = WaveSynth(SR, 2).white_noise(duration=0.05, seed=7)
    s3 = WaveSynth(SR, 2).white_noise(duration=0.05, seed=8)
    assert s1 == s2
    assert not (s1 == s3)


def test_modulate_amp_with_oscillator(rng):
    tremolo = osc.Sine(4.0, amplitude=0.3, bias=0.7, samplerate=SR)
    s = WaveSynth(SR, 2).sine(440.0, 0.2)
    s2 = WaveSynth(SR, 2).sine(440.0, 0.2).modulate_amp(tremolo)
    a, b = s.get_frame_array(), s2.get_frame_array()
    assert np.abs(b).max() < np.abs(a).max()


def test_fast_aliases():
    assert osc.FastSine is osc.Sine
    assert osc.FastPulse is osc.Pulse
