"""Biquad filters (beyond-reference): RBJ lowpass/highpass/bandpass as a
parallel affine scan vs the oracle's sequential f64 recurrence, plus
spectral behavior and the documented approximate block-size invariance."""

import numpy as np
import pytest

import goldref.osc as go
from synthesizer_tpu.models import graph as G
from synthesizer_tpu.models import spec as S

SR = 44100
SRC = S.Osc("sawtooth", 330.0, 0.8)


def lsb_diff(node, n=SR // 2, blocksize=2048):
    want = go.render_oracle(node, n, SR)
    got = np.asarray(G.render_patch(node, n, SR, blocksize))
    g = np.clip(np.rint(got.astype(np.float64) * 32767), -32768, 32767)
    w = np.clip(np.rint(want.astype(np.float64) * 32767), -32768, 32767)
    return np.abs(g - w)


@pytest.mark.parametrize("kind,fc,q,tol", [
    ("lowpass", 1000.0, 0.7071, 2),
    ("lowpass", 3000.0, 2.0, 3),
    ("lowpass", 500.0, 8.0, 16),         # strong resonance: wider budget
    ("highpass", 2000.0, 1.0, 2),
    ("highpass", 300.0, 0.7071, 16),     # poles near the unit circle
    ("bandpass", 800.0, 4.0, 3),
])
def test_biquad_matches_sequential_oracle(kind, fc, q, tol):
    d = lsb_diff(S.Biquad(SRC, kind, fc, q))
    assert d.max() <= tol, f"max {d.max()} LSB"


def test_biquad_spectral_behavior():
    """The filters actually filter: stopband energy drops hard."""
    n = SR
    def spectrum(node):
        v = np.asarray(G.render_patch(node, n, SR, 8192), np.float64)
        return np.abs(np.fft.rfft(v * np.hanning(n)))
    freqs = np.fft.rfftfreq(n, 1 / SR)
    raw = spectrum(SRC)
    lp = spectrum(S.Biquad(SRC, "lowpass", 600.0, 0.7071))
    hp = spectrum(S.Biquad(SRC, "highpass", 3000.0, 0.7071))
    hi = freqs > 5000
    lo = (freqs > 200) & (freqs < 500)
    assert lp[hi].sum() < 0.02 * raw[hi].sum()     # lowpass kills highs
    assert hp[lo].sum() < 0.05 * raw[lo].sum()     # highpass kills lows
    assert lp[lo].sum() > 0.5 * raw[lo].sum()      # passband survives
    # resonance peaks at the cutoff
    res = spectrum(S.Biquad(SRC, "lowpass", 990.0, 8.0))
    band = (freqs > 900) & (freqs < 1100)
    assert res[band].max() > 3.0 * raw[band].max()


def test_biquad_blocksize_near_invariance():
    """IIR via parallel scan: block-size invariance holds to a few LSB
    (the documented exception to the bit-exact rule)."""
    node = S.Biquad(SRC, "lowpass", 700.0, 2.0)
    a = np.asarray(G.render_patch(node, 30000, SR, 512))
    b = np.asarray(G.render_patch(node, 30000, SR, 8192))
    assert np.abs(a - b).max() < 3.0 / 32767


def test_filter_oscillator_classes_and_server_json():
    from synthesizer_tpu import oscillators as osc
    from synthesizer_tpu.server import spec_from_json
    f = osc.LowpassFilter(osc.Sawtooth(220.0, samplerate=SR), 900.0, q=2.0)
    assert isinstance(f.spec, S.Biquad) and f.spec.cutoff == 900.0
    block = next(f.blocks(512))
    assert block.shape == (512,) and np.isfinite(block).all()
    node = spec_from_json({"node": "lowpass", "cutoff": 800,
                           "source": {"node": "osc", "kind": "square",
                                      "frequency": 110}})
    assert isinstance(node, S.Biquad) and node.kind == "lowpass"
    with pytest.raises(ValueError):
        S.Biquad(SRC, "notch", 500.0)
    with pytest.raises(ValueError):
        S.Biquad(SRC, "lowpass", -1.0)


def test_swept_cutoff_matches_oracle():
    """cutoff_lfo sweeps the cutoff in octaves (time-varying companion
    matrices in the same parallel scan); parity vs the per-sample-coeff
    sequential f64 oracle."""
    sweep = S.Osc("sine", 0.5, amplitude=2.0)       # +-2 octaves
    for q, tol in [(0.7071, 3), (4.0, 6)]:
        node = S.Biquad(S.Osc("sawtooth", 110.0, 0.8), "lowpass", 800.0, q,
                        cutoff_lfo=sweep)
        d = lsb_diff(node)
        assert d.max() <= tol, f"q={q}: max {d.max()} LSB"


def test_swept_cutoff_moves_the_spectrum():
    """The sweep is audible: the bright half (cutoff up) carries far more
    high-frequency energy than the dark half."""
    n = SR
    sweep = S.Osc("sine", 0.5, amplitude=2.0, phase=0.25)  # cos: starts high
    node = S.Biquad(S.Osc("sawtooth", 110.0, 0.8), "lowpass", 700.0, 1.0,
                    cutoff_lfo=sweep)
    v = np.asarray(G.render_patch(node, n, SR, 8192), np.float64)
    bright, dark = v[: n // 4], v[n // 2: 3 * n // 4]
    def hf(seg):
        s = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        f = np.fft.rfftfreq(len(seg), 1 / SR)
        return s[f > 2000].sum()
    assert hf(bright) > 10.0 * hf(dark)


def test_sweepable_filter_class():
    from synthesizer_tpu import oscillators as osc
    f = osc.LowpassFilter(osc.Sawtooth(110.0, samplerate=SR), 800.0, q=1.0,
                          cutoff_lfo=osc.Sine(0.5, amplitude=2.0,
                                              samplerate=SR))
    assert f.spec.cutoff_lfo is not None
    block = next(f.blocks(512))
    assert np.isfinite(block).all()
