"""Device patch lowering vs the oracle evaluator.

Contract: given identical phase sequences, integer-comparison waveforms
(square/pulse) are bit-exact; transcendental/float paths agree to within
1 LSB at 16-bit after quantization.  Results must be block-size invariant.
"""

import numpy as np
import pytest

import goldref.osc as go
from synthesizer_tpu.models import spec as S
from synthesizer_tpu.models import graph as G

SR = 44100
N = SR // 4


def assert_1lsb(node, n=N, sr=SR, blocksize=1024):
    want = go.to_int_samples(go.render_oracle(node, n, sr), 2)
    got = np.asarray(G.to_int_device(G.render_patch(node, n, sr, blocksize), 2))
    d = np.abs(got.astype(np.int64) - want.astype(np.int64))
    assert d.max() <= 1, f"max diff {d.max()} at {np.argmax(d)}"


@pytest.mark.parametrize("kind", ["sine", "triangle", "square", "sawtooth",
                                  "pulse", "semicircle", "pointy"])
def test_basic_waveforms(kind):
    assert_1lsb(S.Osc(kind, 440.0, amplitude=0.9, phase=0.1, bias=0.01))


@pytest.mark.parametrize("kind", ["square_h", "sawtooth_h"])
def test_additive_waveforms(kind):
    assert_1lsb(S.Osc(kind, 220.0, amplitude=0.3, num_harmonics=12))


def test_harmonics():
    node = S.Osc("harmonics", 110.0, amplitude=0.4,
                 harmonics=((1, 1.0), (2, 0.5), (3.5, 0.25), (5, 0.125)))
    assert_1lsb(node)


def test_white_noise_exact():
    node = S.Osc("white_noise", 5000.0, amplitude=0.8, seed=42)
    want = go.render_oracle(node, N, SR)
    got = np.asarray(G.render_patch(node, N, SR))
    np.testing.assert_array_equal(got, want)  # pure integer hash + f32 scale


def test_fm_modulation():
    vib = S.Osc("sine", 6.0, amplitude=0.01)
    assert_1lsb(S.Osc("sine", 440.0, amplitude=0.9, fm_lfo=vib))


def test_pwm_modulation():
    lfo = S.Osc("sine", 2.0, amplitude=0.4, bias=0.5)
    assert_1lsb(S.Osc("pulse", 220.0, amplitude=0.9, pwm_lfo=lfo))


def test_envelope_filter():
    src = S.Osc("sawtooth", 330.0, amplitude=0.8)
    assert_1lsb(S.Envelope(src, 0.02, 0.03, 0.1, 0.6, 0.05))


def test_mix_ampmod_clip_abs():
    a = S.Osc("sine", 440.0, amplitude=0.5)
    b = S.Osc("triangle", 220.0, amplitude=0.4)
    assert_1lsb(S.Mix((a, b)))
    assert_1lsb(S.AmpMod(a, S.Osc("sine", 3.0, amplitude=0.5, bias=0.5)))
    assert_1lsb(S.Clip(S.Mix((a, a, a)), -1.0, 1.0))
    assert_1lsb(S.Abs(a))
    assert_1lsb(S.Null(a))


def test_delay_and_echo():
    a = S.Osc("sine", 440.0, amplitude=0.5)
    assert_1lsb(S.Delay(a, 0.0371))     # non-multiple of blocksize
    assert_1lsb(S.Echo(S.Envelope(a, 0.0, 0.0, 0.05, 1.0, 0.02),
                       after=0.03, amount=4, delay=0.017, decay=0.6))


def test_linear_and_const():
    assert_1lsb(S.Linear(0.0, 1e-5, min_value=0.0, max_value=0.9))
    assert_1lsb(S.AmpMod(S.Osc("sine", 440.0), S.Const(0.5)))


def test_blocksize_invariance():
    patch = S.Echo(
        S.Envelope(S.Osc("sine", 440.0, amplitude=0.8,
                         fm_lfo=S.Osc("sine", 5.0, amplitude=0.02)),
                   0.01, 0.02, 0.1, 0.7, 0.05),
        after=0.02, amount=3, delay=0.013, decay=0.5)
    ref = np.asarray(G.render_patch(patch, N, SR, blocksize=N))
    for bs in (256, 1024, 4096, 1000):
        got = np.asarray(G.render_patch(patch, N, SR, blocksize=bs))
        np.testing.assert_array_equal(got, ref, err_msg=f"blocksize {bs}")


def test_block_stream_matches_render():
    patch = S.Osc("sine", 440.0, amplitude=0.9,
                  fm_lfo=S.Osc("sine", 5.0, amplitude=0.02))
    stream = G.block_stream(patch, SR, blocksize=512)
    blocks = [next(stream) for _ in range(8)]
    got = np.concatenate(blocks)
    want = np.asarray(G.render_patch(patch, 8 * 512, SR, blocksize=512))
    np.testing.assert_array_equal(got, want)


def test_fm_long_render_stays_within_tolerance():
    # 2 s with FM: integer phase carry must not drift
    vib = S.Osc("triangle", 6.0, amplitude=0.05)
    assert_1lsb(S.Osc("sine", 1000.0, amplitude=0.9, fm_lfo=vib), n=2 * SR)


@pytest.mark.parametrize("kind", ["sawtooth_bl", "square_bl"])
def test_bandlimited_waveforms_match_oracle(kind):
    assert_1lsb(S.Osc(kind, 2000.0, amplitude=0.8))


@pytest.mark.parametrize("kind,naive", [("sawtooth_bl", "sawtooth"),
                                        ("square_bl", "square")])
def test_bandlimited_suppresses_aliasing(kind, naive):
    """High-frequency naive waves alias badly; polyBLEP must reduce the
    energy that folds below the fundamental."""
    f0 = 5000.0
    n = 1 << 15
    bl = go.render_oracle(S.Osc(kind, f0, amplitude=0.8), n, SR)
    nv = go.render_oracle(S.Osc(naive, f0, amplitude=0.8), n, SR)
    win = np.hanning(n)
    spec_bl = np.abs(np.fft.rfft(bl * win))
    spec_nv = np.abs(np.fft.rfft(nv * win))
    freqs = np.fft.rfftfreq(n, 1 / SR)
    # energy in the non-harmonic band below the fundamental = pure aliasing
    band = (freqs > 200) & (freqs < f0 - 500)
    assert spec_bl[band].sum() < 0.35 * spec_nv[band].sum()
    # fundamental survives
    fund = np.argmin(np.abs(freqs - f0))
    assert spec_bl[fund] > 0.7 * spec_nv[fund]


def test_wavetable_matches_oracle():
    """Beyond-reference wavetable oscillator: linear-interp table gather,
    device == oracle <= 1 LSB, FM and envelope compose."""
    rng = np.random.default_rng(77)
    table = tuple(float(x) for x in rng.uniform(-1, 1, 64))
    assert_1lsb(S.Osc("wavetable", 440.0, amplitude=0.9, phase=0.1,
                      table=table))
    assert_1lsb(S.Osc("wavetable", 220.0, amplitude=0.7, table=table,
                      fm_lfo=S.Osc("sine", 5.0, 0.01)))
    assert_1lsb(S.Envelope(S.Osc("wavetable", 110.0, 0.8, table=table),
                           0.01, 0.02, 0.05, 0.6, 0.03))


def test_wavetable_closed_form_anchor():
    """A table sampled from sin reproduces a sine up to interpolation
    error (bounded by (pi*f_table_step)^2/8), and a 2-point ramp table
    linearly interpolates between its endpoints."""
    T = 1024
    table = tuple(np.sin(2 * np.pi * np.arange(T) / T))
    got = np.asarray(G.render_patch(
        S.Osc("wavetable", 440.0, amplitude=1.0, table=table), 4096, SR))
    t = np.arange(4096, dtype=np.float64)
    from goldref.spec import phase_increment
    inc = phase_increment(440.0, SR)
    ideal = np.sin(2 * np.pi * ((t * inc) % 2**32) / 2**32)
    # max linear-interp error for sin over a step h=2pi/T: h^2/8
    bound = (2 * np.pi / T) ** 2 / 8 + 1e-5
    assert np.abs(got - ideal).max() < bound
    two = np.asarray(G.render_patch(
        S.Osc("wavetable", 1.0, amplitude=1.0, table=(0.0, 1.0)),
        SR, SR))
    # phase 0..0.5 ramps 0->1 (interp to table[1]); 0.5..1 ramps back
    i = SR // 4
    assert abs(two[i] - 0.5) < 2e-3 and abs(two[SR // 2] - 1.0) < 2e-3


def test_wavetable_user_surfaces():
    from synthesizer_tpu import WaveSynth, oscillators as osc
    table = [0.0, 1.0, 0.0, -1.0]
    s = WaveSynth(samplerate=SR, samplewidth=2).wavetable(440.0, 0.05, table)
    assert s.nframes == int(0.05 * SR)
    assert np.abs(s.get_frame_array()).max() > 20000
    w = osc.Wavetable(220.0, table, amplitude=0.5, samplerate=SR)
    block = next(w.blocks(512))
    assert block.shape == (512,) and np.abs(block).max() <= 0.5 + 1e-6
    import pytest as _pytest
    with _pytest.raises(ValueError, match="table"):
        S.Osc("wavetable", 440.0, table=(1.0,))
