"""Pallas fused voice-bank kernel vs the XLA engine.

On CPU the kernel runs in interpret mode (same program, no Mosaic); the
driver's bench exercises the compiled TPU path.  Integer-comparison
waveforms are bit-identical; continuous waveforms may differ by the
int32-vs-uint32 f32 phase conversion (<= 2^-24 turn), well under 1 LSB.
"""

import numpy as np
import pytest

from synthesizer_tpu.models.voicebank import Voice, VoiceBank, pack_voices
from synthesizer_tpu.ops.kernels import render_stereo_pallas

SR = 44100

VOICES = [
    Voice("sine", 440.0, amplitude=0.3, pan=-0.5, duration=0.1),
    Voice("sine", 880.0, amplitude=0.3, fm_frequency=6.0, fm_depth=0.02,
          duration=0.1),
    Voice("triangle", 220.0, amplitude=0.25, pan=0.5, duration=0.1, phase=0.2),
    Voice("square", 110.0, amplitude=0.2, duration=0.1),
    Voice("sawtooth", 330.0, amplitude=0.2, duration=0.1, pan=0.3),
    Voice("pulse", 165.0, amplitude=0.2, pulse_width=0.3, duration=0.1),
    Voice("semicircle", 550.0, amplitude=0.2, duration=0.08),
    Voice("pointy", 660.0, amplitude=0.2, duration=0.08, pan=-0.2),
    Voice("harmonics", 110.0, amplitude=0.3, harmonics=[1.0, 0.5, 0.25, 0.125],
          duration=0.1),
    Voice("white_noise", 0.0, amplitude=0.15, duration=0.08, seed=9),
    Voice("sawtooth_bl", 2000.0, amplitude=0.2, duration=0.09),
    Voice("square_bl", 1500.0, amplitude=0.2, duration=0.09, pan=0.4),
]


@pytest.fixture(scope="module")
def packed():
    return pack_voices(VOICES, SR, num_harmonics=8, sort_by_wave=True)


def test_pallas_matches_xla_engine(packed):
    vp, layout = packed
    n = 4096
    bank = VoiceBank.for_voices(VOICES, SR, chunk_frames=1024, num_harmonics=8,
                                layout=layout, nvoices=layout.nvoices)
    want = np.asarray(bank.render_song(vp, n))
    got = np.asarray(render_stereo_pallas(vp, 0, nframes=n, samplerate=SR,
                                          layout=layout, tile=1024))
    # Quantized to int16 the engines agree within 1 LSB except at the
    # semicircle's vertical edges, where the sqrt has unbounded slope and the
    # int32-vs-uint32 f32 phase rounding (<=2^-24 turn) can show up as a few
    # LSB on isolated samples.
    w16 = np.clip(np.rint(want * 32767), -32768, 32767)
    g16 = np.clip(np.rint(got * 32767), -32768, 32767)
    d = np.abs(g16 - w16)
    assert d.max() <= 16
    assert (d > 1).mean() < 1e-3


def test_pallas_offset_and_padding(packed):
    vp, layout = packed
    whole = np.asarray(render_stereo_pallas(vp, 0, nframes=3000, samplerate=SR,
                                            layout=layout, tile=1024))
    part = np.asarray(render_stereo_pallas(vp, 1024, nframes=1000, samplerate=SR,
                                           layout=layout, tile=1024))
    np.testing.assert_array_equal(part, whole[1024:2024])


def test_pallas_hybrid_renders_wavetable():
    """Wavetable banks work through engine='pallas' since round 3: table
    groups evaluate on the XLA side of the SAME jitted program (the
    Mosaic backend cannot compile the per-voice gather — documented by
    the battery's pallas/wavetable_gather_probe); everything else stays
    in the kernel.  Result matches the pure-XLA engine."""
    rng = np.random.default_rng(13)
    voices = [
        Voice("wavetable", 220.0 * (i + 1), amplitude=0.2,
              pan=(i - 1.5) / 2, duration=0.08,
              table=tuple(float(x) for x in rng.uniform(-1, 1, 48)))
        for i in range(3)
    ] + [
        Voice("sine", 440.0, amplitude=0.3, duration=0.08),
        Voice("square", 110.0, amplitude=0.2, duration=0.08, pan=0.5),
    ]
    vp, layout = pack_voices(voices, SR, num_harmonics=4, sort_by_wave=True)
    bank = VoiceBank.for_voices(voices, SR, chunk_frames=1024,
                                num_harmonics=4, layout=layout,
                                nvoices=layout.nvoices)
    n = 3000
    xla = np.asarray(bank.render_song(vp, n))
    hyb = np.asarray(bank.render_song(vp, n, engine="pallas"))
    assert np.abs(xla - hyb).max() < 1e-4
    # chunk path too
    xc = np.asarray(bank.render_chunk(vp, 1024))
    hc = np.asarray(bank.render_chunk(vp, 1024, engine="pallas"))
    assert np.abs(xc - hc).max() < 1e-4
