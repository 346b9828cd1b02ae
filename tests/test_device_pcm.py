"""Device PCM ops vs the golden oracle.

Integer ops must be bit-exact to audioop semantics (via goldref); float-
factor ops must be bit-exact to the goldref float32 spec and within 1 LSB
of audioop's float64 path.
"""

import numpy as np
import pytest

import goldref.pcm as gp

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from synthesizer_tpu.ops import pcm as dp  # noqa: E402
from synthesizer_tpu.ops import resample as dr  # noqa: E402

WIDTHS = [1, 2, 4]
NPD = {1: np.int8, 2: np.int16, 4: np.int32}


def rand_arr(rng, n, width, nch=1):
    lo, hi = gp._MINVAL[width], gp._MAXVAL[width]
    a = rng.integers(lo, hi + 1, size=(n, nch), dtype=np.int64)
    if n >= 8:
        a[:4, 0] = [lo, hi, 0, -1]
    return a.astype(NPD[width])


@pytest.mark.parametrize("width", WIDTHS)
def test_sat_add(rng, width):
    a, b = rand_arr(rng, 400, width), rand_arr(rng, 400, width)
    got = np.asarray(dp.sat_add(jnp.asarray(a), jnp.asarray(b)))
    want = gp.frombytes(gp.add(gp.tobytes(a.ravel(), width),
                               gp.tobytes(b.ravel(), width), width), width)
    np.testing.assert_array_equal(got.ravel(), want)


def test_sat_add_i32_extremes():
    a = np.array([2**31 - 1, -(2**31), 2**31 - 1, -(2**31), 0], np.int32)
    b = np.array([1, -1, 2**31 - 1, -(2**31), 0], np.int32)
    got = np.asarray(dp.sat_add(jnp.asarray(a), jnp.asarray(b)))
    want = gp.frombytes(gp.add(gp.tobytes(a, 4), gp.tobytes(b, 4), 4), 4)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("width", WIDTHS)
@pytest.mark.parametrize("b", [1, -1, 1000, -70000])
def test_bias_wrap(rng, width, b):
    a = rand_arr(rng, 200, width)
    got = np.asarray(dp.bias_wrap(jnp.asarray(a), np.array(b).astype(NPD[width])))
    want = gp.frombytes(gp.bias(gp.tobytes(a.ravel(), width), width, b), width)
    np.testing.assert_array_equal(got.ravel(), want)


@pytest.mark.parametrize("w1", WIDTHS)
@pytest.mark.parametrize("w2", WIDTHS)
def test_lin2lin(rng, w1, w2):
    a = rand_arr(rng, 200, w1)
    got = np.asarray(dp.lin2lin(jnp.asarray(a), w2))
    want = gp.frombytes(gp.lin2lin(gp.tobytes(a.ravel(), w1), w1, w2), w2)
    np.testing.assert_array_equal(got.ravel(), want)


@pytest.mark.parametrize("width", WIDTHS)
@pytest.mark.parametrize("factor", [0.0, 0.5, -0.5, 1.0, 0.1, 1.5, -2.0])
def test_mul_floor_matches_f32_spec(rng, width, factor):
    a = rand_arr(rng, 300, width)
    got = np.asarray(dp.mul_floor(jnp.asarray(a), jnp.float32(factor)))
    want = gp.frombytes(gp.mul_f32(gp.tobytes(a.ravel(), width), width, factor), width)
    np.testing.assert_array_equal(got.ravel(), want)


@pytest.mark.parametrize("factor", [0.1, 0.5, 0.9999, 1.5, -0.3])
def test_mul_floor_within_1lsb_of_audioop_w2(rng, factor):
    a = rand_arr(rng, 300, 2)
    got = np.asarray(dp.mul_floor(jnp.asarray(a), jnp.float32(factor))).ravel().astype(np.int64)
    want = gp.frombytes(gp.mul(gp.tobytes(a.ravel(), 2), 2, factor), 2).astype(np.int64)
    assert np.abs(got - want).max() <= 1


@pytest.mark.parametrize("width", [1, 2, 4])
@pytest.mark.parametrize("lf,rf", [(1.0, 1.0), (0.5, 0.5), (1.0, 0.0), (-0.3, 0.8)])
def test_mono_stereo(rng, width, lf, rf):
    # to_mono is a multiply-add: the backend may contract to FMA, so the
    # contract is <=1 LSB (in the 16-bit sense; the f32 ulp bound for w=4).
    st = rand_arr(rng, 150, width, nch=2)
    got = np.asarray(dp.to_mono(jnp.asarray(st), jnp.float32(lf), jnp.float32(rf))).astype(np.int64)
    want = gp.frombytes(gp.tomono_f32(gp.tobytes(st.ravel(), width), width, lf, rf), width).astype(np.int64)
    tol = 1 if width <= 2 else 512
    assert np.abs(got.ravel() - want).max() <= tol

    # to_stereo is two independent single products: bit-exact.
    mono = rand_arr(rng, 150, width, nch=1)
    got = np.asarray(dp.to_stereo(jnp.asarray(mono), jnp.float32(lf), jnp.float32(rf)))
    want = gp.frombytes(gp.tostereo_f32(gp.tobytes(mono.ravel(), width), width, lf, rf), width)
    np.testing.assert_array_equal(got.ravel(), want)


@pytest.mark.parametrize("width", [1, 2])
def test_peak(rng, width):
    a = rand_arr(rng, 333, width)
    got = int(dp.peak(jnp.asarray(a)))
    assert got == gp.max_(gp.tobytes(a.ravel(), width), width)


RATE_PAIRS = [
    (44100, 44100), (44100, 22050), (22050, 44100), (44100, 48000),
    (48000, 44100), (44100, 8000), (8000, 44100), (44100, 32000),
    (3, 7), (7, 3), (1, 4), (4, 1), (44100, 11025), (44101, 48000),
]


@pytest.mark.parametrize("width", [1, 2, 4])
@pytest.mark.parametrize("nch", [1, 2])
@pytest.mark.parametrize("inrate,outrate", RATE_PAIRS)
def test_resample_matches_audioop(rng, width, nch, inrate, outrate):
    x = rand_arr(rng, 400, width, nch=nch)
    y, st = dr.resample(x, inrate, outrate)
    want_b, want_st = gp.ratecv(gp.tobytes(x.ravel(), width), width, nch,
                                inrate, outrate, None)
    want = gp.frombytes(want_b, width).reshape(-1, nch)
    np.testing.assert_array_equal(y, want)
    assert st.to_audioop(width) == want_st


#: reduced outrates past every fast-path bound (width-1 2^8, width-2 2^16,
#: width-4 2^15) — the general sign-magnitude limb path (round 3)
WIDE_RATE_PAIRS = [
    (44100, 96001),            # coprime, outr 96001
    (12345, 2**20 + 7),        # outr ~1M
    (2**28 + 1, 2**28 - 1),    # both near 2^28, coprime
    (96001, 44100),            # big INrate (downsample through wide d0)
]


@pytest.mark.parametrize("width", [1, 2, 4])
@pytest.mark.parametrize("inrate,outrate", WIDE_RATE_PAIRS)
def test_resample_pathological_rates_exact(rng, width, inrate, outrate):
    """The wide device path (no host fallback remains): bit-exact vs the
    int64 oracle at full-range values for ANY reduced rate pair."""
    x = rand_arr(rng, 300, width, nch=2)
    info = np.iinfo(x.dtype)
    x[0] = info.min
    x[1] = info.max
    x[2] = (info.min, info.max)
    y, st = dr.resample(x, inrate, outrate)
    want_b, want_st = gp.ratecv(gp.tobytes(x.ravel(), width), width, 2,
                                inrate, outrate, None)
    want = gp.frombytes(want_b, width).reshape(-1, 2)
    np.testing.assert_array_equal(y, want)
    assert st.to_audioop(width) == want_st


def test_resample_pathological_chunked_matches_whole(rng):
    x = rand_arr(rng, 800, 4, nch=2)
    whole, _ = dr.resample(x, 44100, 96001)
    st = None
    parts = []
    for i in range(0, 800, 123):
        y, st = dr.resample(x[i:i + 123], 44100, 96001, state=st)
        parts.append(y)
    np.testing.assert_array_equal(np.concatenate(parts), whole)


def test_streaming_resampler_wide_path(rng):
    """StreamingResampler accepts pathological reduced rates since round 3
    (the ctor guard is gone) and stays exact."""
    x = rand_arr(rng, 600, 2, nch=2)
    rs = dr.StreamingResampler(44100, 96001, nchannels=2)
    outs = []
    for i in range(0, 600, 200):
        y, n = rs.push(jnp.asarray(x[i:i + 200]))
        outs.append(np.asarray(y)[:n])
    got = np.concatenate(outs)
    want_b, _ = gp.ratecv(gp.tobytes(x.ravel(), 2), 2, 2, 44100, 96001,
                          None)
    want = gp.frombytes(want_b, 2).reshape(-1, 2)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("inrate,outrate", [(44100, 48000), (44100, 22050), (3, 7)])
def test_resample_chunked_matches_whole(rng, inrate, outrate):
    x = rand_arr(rng, 1000, 2, nch=2)
    whole, _ = dr.resample(x, inrate, outrate)
    st = None
    parts = []
    for i in range(0, 1000, 37):
        y, st = dr.resample(x[i:i + 37], inrate, outrate, state=st)
        parts.append(y)
    np.testing.assert_array_equal(np.concatenate(parts), whole)


def test_resample_jax_on_device(rng):
    x = rand_arr(rng, 500, 2, nch=2)
    y = np.asarray(dr.resample_jax(jnp.asarray(x), 44100, 32000))
    want, _ = dr.resample(x, 44100, 32000)
    np.testing.assert_array_equal(y, want)


def test_resample_empty(rng):
    x = np.zeros((0, 1), np.int16)
    y, st = dr.resample(x, 44100, 48000)
    assert y.shape == (0, 1)
    out, st2 = dr.resample(rand_arr(rng, 50, 2), 44100, 48000, state=st)
    wout, _ = dr.resample(rand_arr(rng, 0, 2), 44100, 48000)  # noqa: F841
    assert len(out) == dr.nframes_out(50, 44100, 48000)


@pytest.mark.parametrize("inrate,outrate", [(44100, 48000), (48000, 44100),
                                            (44100, 22050), (3, 7)])
def test_streaming_resampler_device_resident(rng, inrate, outrate):
    """StreamingResampler: chunked, device-resident, bit-exact to audioop,
    one compile per chunk size (traced d carry)."""
    x = rand_arr(rng, 1000, 2, nch=2)
    want_b, _ = gp.ratecv(gp.tobytes(x.ravel(), 2), 2, 2, inrate, outrate, None)
    want = gp.frombytes(want_b, 2).reshape(-1, 2)
    rs = dr.StreamingResampler(inrate, outrate, nchannels=2)
    outs = []
    for i in range(0, 1000, 125):
        y, n = rs.push(jnp.asarray(x[i:i + 125]))
        outs.append(np.asarray(y)[:n])
    got = np.concatenate(outs)
    np.testing.assert_array_equal(got, want)


def test_streaming_resampler_max_out_bound(rng):
    rs = dr.StreamingResampler(44100, 48000, nchannels=1)
    x = rand_arr(rng, 4000, 2, nch=1)
    worst = 0
    for i in range(0, 4000, 160):
        y, n = rs.push(jnp.asarray(x[i:i + 160]))
        assert n <= rs.max_out(160)
        worst = max(worst, n)
    assert worst >= 160  # upsampling produces more than it consumes
