"""StreamingHQResampler — the chunked twin of the windowed-sinc hq
resample (ops.resample.hq_resample).

Contract (docstring of ops.resample._hq_stream_kernel): every streaming
output is the SAME conv-kernel row applied to the SAME Kw-wide input
window as the offline op, and blocks are padded to HQ_STREAM_BLOCK
strides so the conv never enters the tiny-spatial regime where XLA
regroups the window reduction — streaming output is therefore
BIT-IDENTICAL to the offline op at every chunk size (the repo-wide
"streaming == offline" invariant, restored for this twin in round 5),
and both sit within the offline op's own <= 1 LSB (width 2) budget of
the f64 oracle (goldref.effects.hq_resample).
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

import goldref.effects as ge
from synthesizer_tpu.ops import resample as dresample
from synthesizer_tpu.sample import Sample

RATE_PAIRS = [(44100, 48000), (48000, 8000), (8000, 48000),
              (44100, 22050), (22050, 44100), (48000, 44100)]


def _stream_out(x, inrate, outrate, chunk, nch, dtype=jnp.int16,
                flush=True):
    rs = dresample.StreamingHQResampler(inrate, outrate, nchannels=nch,
                                        dtype=dtype)
    xd = jnp.asarray(x)
    outs = []
    for i in range(0, x.shape[0], chunk):
        y, c = rs.push(xd[i:i + chunk])
        if c:
            assert y.shape[0] == c
            outs.append(np.asarray(y))
    if flush:
        y, c = rs.flush()
        if c:
            outs.append(np.asarray(y))
    return (np.concatenate(outs) if outs
            else np.zeros((0, nch), np.asarray(xd).dtype)), rs


@pytest.mark.parametrize("inrate,outrate", RATE_PAIRS)
@pytest.mark.parametrize("chunk", [1, 7, 160, 997])
def test_stream_matches_oracle_any_chunking(inrate, outrate, chunk):
    rng = np.random.default_rng(inrate + outrate + chunk)
    n = 1501
    x = rng.integers(-32768, 32768, size=(n, 2), dtype=np.int16)
    gold = ge.hq_resample(x, 2, inrate, outrate).astype(np.int64)
    got, _ = _stream_out(x, inrate, outrate, chunk, 2)
    assert got.shape == gold.shape
    assert np.abs(got.astype(np.int64) - gold).max() <= 1


@pytest.mark.parametrize("inrate,outrate", RATE_PAIRS)
@pytest.mark.parametrize("chunk", [1, 7, 1470, 65536])
def test_stream_bit_identical_to_offline_device_op(inrate, outrate, chunk):
    """Streaming == offline BIT-EXACTLY at every chunk size (round-5
    block padding; was <= 1 LSB oracle-ball before)."""
    rng = np.random.default_rng(7)
    n = 1201 if chunk < 1470 else 3001
    x = rng.integers(-32768, 32768, size=(n, 2), dtype=np.int16)
    g = math.gcd(inrate, outrate)
    M, L = inrate // g, outrate // g
    off = np.asarray(dresample.hq_resample(
        jnp.asarray(x), L, M, dresample.nframes_out(n, M, L)))
    got, _ = _stream_out(x, inrate, outrate, chunk, 2)
    assert got.shape == off.shape
    assert np.array_equal(got, off)


def test_total_row_count_matches_nframes_out_rule():
    """Tail flush makes the total row count equal the offline rule, so
    quality='hq' streaming never changes a pipeline's frame budget."""
    for inrate, outrate in RATE_PAIRS:
        for n in (1, 2, 160, 441):
            x = np.zeros((n, 1), np.int16)
            got, rs = _stream_out(x, inrate, outrate, 37, 1)
            g = math.gcd(inrate, outrate)
            want = dresample.nframes_out(n, inrate // g, outrate // g)
            assert got.shape[0] == want == rs.total_out(n)


def test_flush_is_idempotent_and_push_after_start_of_silence():
    rs = dresample.StreamingHQResampler(44100, 48000, nchannels=1)
    y, c = rs.push(jnp.zeros((100, 1), jnp.int16))
    y, c = rs.flush()
    y2, c2 = rs.flush()
    assert c2 == 0 and y2.shape[0] == 0


@pytest.mark.parametrize("dtype,width", [(jnp.int8, 1), (jnp.int32, 4)])
def test_other_widths(dtype, width):
    rng = np.random.default_rng(width)
    lim = 1 << (8 * width - 1)
    n = 700
    x = rng.integers(-lim, lim, size=(n, 2)).astype(
        {1: np.int8, 4: np.int32}[width])
    gold = ge.hq_resample(x, width, 22050, 44100).astype(np.int64)
    got, rs = _stream_out(x, 22050, 44100, 123, 2, dtype=dtype)
    assert got.shape == gold.shape
    if width == 1:
        tol = 1
    else:
        # width 4's LSB is far below the f32 mantissa: the budget is the
        # T-tap f32 dot-rounding model (T+2)*eps/2 * sum|h*s| * maxval,
        # with the per-leg L1 norm of the unit-DC kernel <= ~1.2
        eps = float(np.finfo(np.float32).eps)
        tol = int((rs._t + 2) * eps / 2 * 1.2 * (2 ** 31)) + 1
    assert np.abs(got.astype(np.int64) - gold).max() <= tol


def test_max_factor_rejected():
    with pytest.raises(ValueError, match="hq"):
        dresample.StreamingHQResampler(44100, 44101)


def test_rate_convert_filter_hq(tmp_path):
    """RateConvertFilter(quality='hq') == Sample.resample(quality='hq')
    within 1 LSB, including the flushed tail (same frame count)."""
    from synthesizer_tpu.streaming import RateConvertFilter, SampleStream
    from synthesizer_tpu.synth import WaveSynth
    s = WaveSynth(samplerate=44100, samplewidth=2).sine(
        440, 0.1, amplitude=0.6).stereo()
    p = str(tmp_path / "rc.wav")
    s.write_wav(p)
    conv = RateConvertFilter(SampleStream(p, 700), 32000, quality="hq")
    chunks = list(conv)
    assert all(c.samplerate == 32000 for c in chunks)
    assert all(c.nframes > 0 for c in chunks)
    got = np.concatenate([np.asarray(c.jax_frames) for c in chunks])
    want = np.asarray(
        Sample(wave_file=p).resample(32000, quality="hq").jax_frames)
    assert got.shape == want.shape
    assert np.abs(got.astype(np.int64) - want.astype(np.int64)).max() <= 1


def test_rate_convert_filter_quality_validation():
    from synthesizer_tpu.streaming import RateConvertFilter
    with pytest.raises(ValueError, match="quality"):
        RateConvertFilter(iter(()), 48000, quality="best")


def test_rate_convert_filter_dtype_validation():
    with pytest.raises(ValueError, match="int8/int16/int32"):
        dresample.StreamingHQResampler(44100, 48000, dtype=jnp.float32)


@pytest.mark.parametrize("quality", ["hq", "linear"])
def test_rate_convert_filter_mixed_rate_flushes_before_passthrough(quality):
    """A mid-stream chunk already at the target rate must come out AFTER
    the active resampler's buffered tail (temporal order), and the
    resampler restarts fresh for a later rate change."""
    from synthesizer_tpu.streaming import RateConvertFilter
    rng = np.random.default_rng(5)
    seg1 = rng.integers(-2000, 2000, size=(441, 2), dtype=np.int16)
    seg2 = rng.integers(-2000, 2000, size=(320, 2), dtype=np.int16)
    seg3 = rng.integers(-2000, 2000, size=(441, 2), dtype=np.int16)
    src = []
    for off in range(0, 441, 147):       # segment 1: 22050 -> 32000
        src.append(Sample.from_raw_frames(
            seg1[off:off + 147].tobytes(), 2, 22050, 2))
    src.append(Sample.from_raw_frames(seg2.tobytes(), 2, 32000, 2))
    for off in range(0, 441, 147):       # segment 3: fresh resampler
        src.append(Sample.from_raw_frames(
            seg3[off:off + 147].tobytes(), 2, 22050, 2))
    out = list(RateConvertFilter(iter(src), 32000, quality=quality))
    assert all(c.samplerate == 32000 for c in out)
    got = np.concatenate([np.asarray(c.jax_frames) for c in out])
    if quality == "hq":
        n1 = dresample.nframes_out(441, 22050 // 50, 32000 // 50)
        conv1 = np.asarray(Sample.from_raw_frames(
            seg1.tobytes(), 2, 22050, 2).resample(
                32000, quality="hq").jax_frames)
        conv3 = np.asarray(Sample.from_raw_frames(
            seg3.tobytes(), 2, 22050, 2).resample(
                32000, quality="hq").jax_frames)
        assert got.shape[0] == n1 + 320 + n1
        # segment 1's rows (incl. the flushed tail) precede the
        # passthrough chunk; segment 3 restarted from clean state
        assert np.abs(got[:n1].astype(np.int64)
                      - conv1.astype(np.int64)).max() <= 1
        assert np.array_equal(got[n1:n1 + 320], seg2)
        assert np.abs(got[n1 + 320:].astype(np.int64)
                      - conv3.astype(np.int64)).max() <= 1
    else:
        # linear withholds no rows; passthrough lands between segments
        n1 = dresample.nframes_out(441, 22050 // 50, 32000 // 50)
        assert got.shape[0] == n1 + 320 + n1
        assert np.array_equal(got[n1:n1 + 320], seg2)


@pytest.mark.parametrize("quality", ["hq", "linear"])
def test_rate_convert_filter_rate_change_between_source_rates(quality):
    """A mid-stream change between two NON-target source rates must
    retire the old resampler (flushing its tail) and build a fresh one
    for the new rate — pushing 48 kHz frames through a 22050->32000 L/M
    would play them at the wrong pitch."""
    from synthesizer_tpu.streaming import RateConvertFilter
    rng = np.random.default_rng(6)
    seg1 = rng.integers(-2000, 2000, size=(441, 2), dtype=np.int16)
    seg2 = rng.integers(-2000, 2000, size=(480, 2), dtype=np.int16)
    src = []
    for off in range(0, 441, 147):       # segment 1 @ 22050
        src.append(Sample.from_raw_frames(
            seg1[off:off + 147].tobytes(), 2, 22050, 2))
    for off in range(0, 480, 160):       # segment 2 @ 48000
        src.append(Sample.from_raw_frames(
            seg2[off:off + 160].tobytes(), 2, 48000, 2))
    out = list(RateConvertFilter(iter(src), 32000, quality=quality))
    assert all(c.samplerate == 32000 for c in out)
    got = np.concatenate([np.asarray(c.jax_frames) for c in out])
    conv1 = np.asarray(Sample.from_raw_frames(
        seg1.tobytes(), 2, 22050, 2).resample(
            32000, quality=quality).jax_frames)
    conv2 = np.asarray(Sample.from_raw_frames(
        seg2.tobytes(), 2, 48000, 2).resample(
            32000, quality=quality).jax_frames)
    n1 = conv1.shape[0]
    assert got.shape[0] == n1 + conv2.shape[0]
    tol = 1 if quality == "hq" else 0    # whole-signal twin budgets
    assert np.abs(got[:n1].astype(np.int64)
                  - conv1.astype(np.int64)).max() <= tol
    assert np.abs(got[n1:].astype(np.int64)
                  - conv2.astype(np.int64)).max() <= tol


def test_host_decoder_hq_fallback_without_soxr(tmp_path, monkeypatch):
    """A lossy source on a host with no libsoxr takes OUR windowed-sinc
    device resampler (not the -6 dB/oct linear ratecv)."""
    from synthesizer_tpu import streaming as st
    from synthesizer_tpu.utils import codecs, soxr
    if not (codecs.have_lame() and codecs.have_mpg123()):
        pytest.skip("no mp3 codec libs")
    sig = (np.sin(2 * np.pi * 1000 * np.arange(44100 // 4) / 44100)
           * 12000).astype(np.int16).reshape(-1, 1)
    p = str(tmp_path / "t.mp3")
    codecs.write_mp3(p, np.repeat(sig, 2, axis=1), 44100, 2)
    monkeypatch.setattr(soxr, "have_soxr", lambda: False)
    with st.AudiofileToWavStream(p, samplerate=48000, nchannels=2,
                                 samplewidth=2) as ws:
        data = ws.read(1 << 24)
    frames = np.frombuffer(data, np.int16).reshape(-1, 2)
    # spectral check: the image band linear interpolation leaves around
    # 1 kHz's 44.1 kHz images must be gone (windowed-sinc stopband)
    seg = frames[4096:4096 + 16384, 0].astype(np.float64)
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    freqs = np.fft.rfftfreq(len(seg), 1 / 48000)
    tone_band = spec[(freqs > 900) & (freqs < 1100)].max()
    stop_band = spec[freqs > 21000].max()
    assert 20 * np.log10(tone_band / max(stop_band, 1e-12)) > 60.0
