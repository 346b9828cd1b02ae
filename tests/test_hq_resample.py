"""High-quality polyphase resampler: device twin vs the f64 oracle.

``Sample.resample(quality='hq')`` / ``speed(quality='hq')`` run ONE
strided f32 convolution on device (ops.resample.hq_resample); the spec —
filter design, phase algebra, output-length rule, quantization — is
goldref.effects.hq_resample (sequential f64).  Device budget: <= 1 LSB at
width 2 (the per-output dot is a <= taps-long f32 reduction of a unit-DC
kernel against |s| <= 1).
"""

import math

import numpy as np
import pytest

import goldref.effects as gfx
import goldref.sample as gs
import goldref.spec as gspec
from synthesizer_tpu import Sample
from synthesizer_tpu.ops import coeffs as dcoeffs
from synthesizer_tpu.ops import resample as dresample

SR = 44100

RATE_PAIRS = [
    (44100, 48000), (48000, 44100),       # the classic 160/147 pair
    (22050, 44100), (44100, 22050),       # pure 2x up / down
    (8000, 44100), (44100, 8000),         # deep ratio (441/80), long filter
    (44100, 96000), (96000, 44100),       # 320/147
    (11025, 48000),                       # 640/147
]


def test_filter_conformance():
    """The product and oracle copies of the prototype filter are the same
    f64 array for every reduced ratio the tests use."""
    for inr, outr in RATE_PAIRS:
        g = math.gcd(inr, outr)
        L, M = outr // g, inr // g
        np.testing.assert_array_equal(dcoeffs.hq_resample_filter(L, M),
                                      gspec.hq_resample_filter(L, M))


@pytest.mark.parametrize("inr,outr", RATE_PAIRS)
@pytest.mark.parametrize("nch", [1, 2])
def test_device_vs_oracle(inr, outr, nch):
    rng = np.random.default_rng(inr * 7 + outr + nch)
    x = rng.integers(-28000, 28000, (4000, nch)).astype(np.int16)
    dev = Sample.from_raw_frames(x.tobytes(), 2, inr, nch) \
        .resample(outr, quality="hq")
    gold = gs.Sample(x.copy(), inr, 2, nch).resample(outr, quality="hq")
    got, want = dev.get_frame_array(), gold.frames
    assert got.shape == want.shape
    assert dev.samplerate == outr
    d = np.abs(got.astype(np.int64) - want.astype(np.int64)).max()
    assert d <= 1, f"{inr}->{outr} ch{nch}: {d} LSB"


def test_width1_device_vs_oracle():
    rng = np.random.default_rng(9)
    x = rng.integers(-120, 120, (3000, 2)).astype(np.int8)
    dev = Sample.from_raw_frames(x.tobytes(), 1, 44100, 2) \
        .resample(48000, quality="hq")
    gold = gs.Sample(x.copy(), 44100, 1, 2).resample(48000, quality="hq")
    d = np.abs(dev.get_frame_array().astype(np.int64)
               - gold.frames.astype(np.int64)).max()
    assert d <= 1


def test_length_matches_linear_path():
    """Swapping quality never changes the output frame count (the hq spec
    reuses nframes_out, so downstream chunk code is quality-agnostic)."""
    rng = np.random.default_rng(3)
    for inr, outr in RATE_PAIRS:
        for n in (1, 2, 147, 1000, 4001):
            x = rng.integers(-1000, 1000, (n, 1)).astype(np.int16)
            lin = Sample.from_raw_frames(x.tobytes(), 2, inr, 1) \
                .resample(outr)
            hq = Sample.from_raw_frames(x.tobytes(), 2, inr, 1) \
                .resample(outr, quality="hq")
            assert lin.nframes == hq.nframes, (inr, outr, n)


def test_dc_exactness():
    """Per-leg unit-DC normalization: a constant signal resamples to the
    SAME constant away from the filter edges (both paths)."""
    c = np.full((6000, 2), 12345, np.int16)
    for inr, outr in [(44100, 48000), (48000, 44100), (44100, 8000)]:
        g = math.gcd(inr, outr)
        L, M = outr // g, inr // g
        dev = Sample.from_raw_frames(c.tobytes(), 2, inr, 2) \
            .resample(outr, quality="hq")
        # per-side filter span in OUTPUT samples: half the prototype
        # length (upsampled domain) over the decimation stride
        edge = len(dcoeffs.hq_resample_filter(L, M)) // (2 * M) + 4
        mid = dev.get_frame_array()[edge:-edge]
        assert mid.size and (mid == 12345).all(), (inr, outr)


def _tone(freq, sr, seconds=0.25, amp=20000):
    t = np.arange(int(seconds * sr), dtype=np.float64) / sr
    x = np.rint(amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)
    return np.repeat(x[:, None], 1, axis=1)


def _band_rms(x, sr, lo, hi):
    """RMS of the signal's energy inside [lo, hi] Hz (rFFT bins)."""
    n = len(x)
    X = np.fft.rfft(x.astype(np.float64) * np.hanning(n))
    f = np.fft.rfftfreq(n, 1.0 / sr)
    sel = (f >= lo) & (f <= hi)
    return np.sqrt(np.mean(np.abs(X[sel]) ** 2)) if sel.any() else 0.0


def test_alias_rejection_beats_linear():
    """Downsampling an 18 kHz tone 44100 -> 22050 (target Nyquist
    11.025 kHz): the hq decimator must crush the alias (folds to 4.05 kHz)
    that linear interpolation lets through.  Measured: hq keeps the alias
    > 60 dB below linear's."""
    x = _tone(18000.0, 44100)
    lin = Sample.from_raw_frames(x.tobytes(), 2, 44100, 1) \
        .resample(22050).get_frame_array()[:, 0][200:-200]
    hq = Sample.from_raw_frames(x.tobytes(), 2, 44100, 1) \
        .resample(22050, quality="hq").get_frame_array()[:, 0][200:-200]
    alias = 22050 - 18000   # 4050 Hz image after folding
    a_lin = _band_rms(lin, 22050, alias - 150, alias + 150)
    a_hq = _band_rms(hq, 22050, alias - 150, alias + 150)
    assert a_hq < a_lin / 1000.0, (a_lin, a_hq)   # > 60 dB better


def _tone_amp(x, sr, freq):
    """Amplitude of the ``freq`` component: projection onto the complex
    exponential (exact for a windowed steady tone, no FFT binning)."""
    n = len(x)
    t = np.arange(n, dtype=np.float64) / sr
    return 2.0 * abs(np.mean(x.astype(np.float64)
                             * np.exp(-2j * np.pi * freq * t)))


def test_passband_flatness():
    """A 1 kHz tone survives 44100 -> 48000 with < 0.1 dB level change
    (linear interpolation already sags more at higher frequencies)."""
    x = _tone(1000.0, 44100)
    y = Sample.from_raw_frames(x.tobytes(), 2, 44100, 1) \
        .resample(48000, quality="hq").get_frame_array()[:, 0]
    a_in = _tone_amp(x[:, 0][200:-200], 44100, 1000.0)
    a_out = _tone_amp(y[220:-220], 48000, 1000.0)
    assert abs(20 * np.log10(a_out / a_in)) < 0.1, (a_in, a_out)


def test_image_rejection_upsample():
    """Upsampling a 9 kHz tone 22050 -> 44100: the zero-stuff image at
    22050 - 9000 = 13050 Hz must be strongly suppressed (> 55 dB below
    the tone) — the audible failure of naive/linear upsampling."""
    x = _tone(9000.0, 22050)
    y = Sample.from_raw_frames(x.tobytes(), 2, 22050, 1) \
        .resample(44100, quality="hq").get_frame_array()[:, 0][400:-400]
    tone = _band_rms(y, 44100, 8850, 9150)
    image = _band_rms(y, 44100, 12900, 13200)
    assert image < tone / 560.0, (tone, image)    # > 55 dB


def test_same_rate_noop_and_empty():
    x = np.zeros((100, 2), np.int16)
    s = Sample.from_raw_frames(x.tobytes(), 2, SR, 2)
    assert s.resample(SR, quality="hq") is s
    e = Sample.from_raw_frames(b"", 2, SR, 2).resample(48000, quality="hq")
    assert e.nframes == 0 and e.samplerate == 48000
    assert e.get_frame_array().shape[0] == 0


def test_errors():
    x = np.zeros((100, 2), np.int16)
    with pytest.raises(ValueError, match="quality"):
        Sample.from_raw_frames(x.tobytes(), 2, SR, 2) \
            .resample(48000, quality="best")
    with pytest.raises(ValueError, match="hq"):
        Sample.from_raw_frames(x.tobytes(), 2, SR, 2) \
            .resample(SR + 1, quality="hq")
    with pytest.raises(ValueError, match="quality"):
        gs.Sample(x.copy(), SR, 2, 2).resample(48000, quality="best")


def test_speed_hq_vs_oracle():
    rng = np.random.default_rng(11)
    x = rng.integers(-20000, 20000, (4000, 2)).astype(np.int16)
    dev = Sample.from_raw_frames(x.tobytes(), 2, SR, 2) \
        .speed(1.5, quality="hq")
    gold = gs.Sample(x.copy(), SR, 2, 2).speed(1.5, quality="hq")
    assert dev.samplerate == SR          # speed keeps the samplerate meta
    d = np.abs(dev.get_frame_array().astype(np.int64)
               - gold.frames.astype(np.int64)).max()
    assert d <= 1


def test_bounded_ratio_terms_and_error():
    """speed(quality='hq') ratio snapping: both terms <= HQ_MAX_FACTOR and
    the relative error stays below 1/(M*limit) for arbitrary real speeds
    (semitones, golden ratio, extreme but sane stretches)."""
    for speed in (2.0 ** (1 / 12.0), 2.0 ** (-7 / 12.0), 1.6180339887,
                  0.013, 77.7):
        inr = int(SR * speed)
        L, M = dresample.bounded_ratio(SR, inr)
        assert 1 <= L <= dresample.HQ_MAX_FACTOR
        assert 1 <= M <= dresample.HQ_MAX_FACTOR
        rel = abs(L / M - SR / inr) / (SR / inr)
        # in the musical range (within +-1 octave) both terms can use the
        # full bank, so the convergent error is micro-cents; extreme
        # stretches (77x) bound one term at maxterm/ratio and still land
        # far inside any audible threshold
        assert rel < (1e-6 if 0.5 <= speed <= 2.0 else 1e-4)
    with pytest.raises(ValueError, match="beyond"):
        dresample.bounded_ratio(SR, SR * 5000)


def test_speed_hq_semitone_vs_oracle():
    """A one-semitone hq speed change used to raise (the 46723/44100
    ratio never reduces below the bank cap); it now snaps to the
    bounded best approximation — identically on device and oracle."""
    rng = np.random.default_rng(12)
    x = rng.integers(-20000, 20000, (4000, 2)).astype(np.int16)
    r = 2.0 ** (1 / 12.0)
    dev = Sample.from_raw_frames(x.tobytes(), 2, SR, 2).speed(r, quality="hq")
    gold = gs.Sample(x.copy(), SR, 2, 2).speed(r, quality="hq")
    assert dev.samplerate == SR
    assert dev.nframes == gold.frames.shape[0]
    d = np.abs(dev.get_frame_array().astype(np.int64)
               - gold.frames.astype(np.int64)).max()
    assert d <= 1


@pytest.mark.parametrize("semitones", [1.0, -3.0, 7.0])
def test_pitch_shift_hq_any_semitone(semitones):
    """pitch_shift(quality='hq') must work for every semitone value, not
    only octaves (the snapped speed leg); duration is preserved within
    the stretch grid's hop quantization."""
    rng = np.random.default_rng(13)
    n = 8000
    x = rng.integers(-20000, 20000, (n, 2)).astype(np.int16)
    out = Sample.from_raw_frames(x.tobytes(), 2, SR, 2) \
        .pitch_shift(semitones, quality="hq")
    assert abs(out.nframes - n) <= 2048 + 512  # frame+hop grid slack


def test_oracle_spec_properties():
    """The oracle itself: output-length rule and phase algebra hold for
    awkward n (n < taps, n == 1)."""
    for inr, outr in [(44100, 48000), (44100, 8000)]:
        g = math.gcd(inr, outr)
        L, M = outr // g, inr // g
        for n in (1, 5, 20):
            x = np.ones((n, 1), np.int16) * 100
            y = gfx.hq_resample(x, 2, inr, outr)
            assert y.shape[0] == (n - 1) * L // M + 1
