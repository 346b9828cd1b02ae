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
