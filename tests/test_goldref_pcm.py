"""Pin goldref.pcm bit-exactly to CPython's C audioop.

These tests make goldref the trustworthy arbiter for the device ops: every
primitive is fuzzed against the local C audioop (Python 3.12) over random
fragments, widths, channel counts and rate pairs.  If audioop disappears
(Python 3.13+), the suite skips and goldref itself remains the spec.
"""

import math

import numpy as np
import pytest

import goldref.pcm as gp

audioop = pytest.importorskip("audioop")

WIDTHS = [1, 2, 4]


def rand_frag(rng, n, width, nch=1):
    lo, hi = gp._MINVAL[width], gp._MAXVAL[width]
    a = rng.integers(lo, hi + 1, size=n * nch, dtype=np.int64)
    # sprinkle extremes
    if n >= 8:
        a[:4] = [lo, hi, 0, -1]
    return gp.tobytes(a, width)


@pytest.mark.parametrize("width", WIDTHS)
def test_add(rng, width):
    for n in (0, 1, 7, 256):
        f1, f2 = rand_frag(rng, n, width), rand_frag(rng, n, width)
        assert gp.add(f1, f2, width) == audioop.add(f1, f2, width)


@pytest.mark.parametrize("width", WIDTHS)
@pytest.mark.parametrize("factor", [0.0, 0.5, -0.5, 1.0, -1.0, 2.0, 0.1, -3.7, 1e-9, 1e6])
def test_mul(rng, width, factor):
    f = rand_frag(rng, 300, width)
    assert gp.mul(f, width, factor) == audioop.mul(f, width, factor)


@pytest.mark.parametrize("width", WIDTHS)
def test_mul_f32_within_1lsb(rng, width):
    f = rand_frag(rng, 300, width)
    for factor in (0.1, 0.5, 0.9999, 1.5, -0.3):
        a = gp.frombytes(gp.mul_f32(f, width, factor), width).astype(np.int64)
        b = gp.frombytes(audioop.mul(f, width, factor), width).astype(np.int64)
        tol = 1 if width <= 2 else 256  # f32 mantissa < 32-bit width
        assert np.abs(a - b).max() <= tol


@pytest.mark.parametrize("width", WIDTHS)
@pytest.mark.parametrize("b", [0, 1, -1, 100, -32768, 70000])
def test_bias(rng, width, b):
    f = rand_frag(rng, 200, width)
    assert gp.bias(f, width, b) == audioop.bias(f, width, b)


@pytest.mark.parametrize("w1", WIDTHS)
@pytest.mark.parametrize("w2", WIDTHS)
def test_lin2lin(rng, w1, w2):
    f = rand_frag(rng, 200, w1)
    assert gp.lin2lin(f, w1, w2) == audioop.lin2lin(f, w1, w2)


@pytest.mark.parametrize("width", WIDTHS)
@pytest.mark.parametrize("lf,rf", [(1.0, 1.0), (0.5, 0.5), (1.0, 0.0), (-0.3, 0.8), (1.7, 0.2)])
def test_tomono_tostereo(rng, width, lf, rf):
    f = rand_frag(rng, 100, width, nch=2)
    assert gp.tomono(f, width, lf, rf) == audioop.tomono(f, width, lf, rf)
    m = rand_frag(rng, 100, width)
    assert gp.tostereo(m, width, lf, rf) == audioop.tostereo(m, width, lf, rf)


@pytest.mark.parametrize("width", WIDTHS)
def test_reverse_and_meters(rng, width):
    f = rand_frag(rng, 333, width)
    assert gp.reverse(f, width) == audioop.reverse(f, width)
    assert gp.max_(f, width) == audioop.max(f, width)
    assert gp.minmax(f, width) == audioop.minmax(f, width)
    assert gp.avg(f, width) == audioop.avg(f, width)
    assert gp.rms(f, width) == audioop.rms(f, width)
    assert gp.cross(f, width) == audioop.cross(f, width)
    assert gp.maxpp(f, width) == audioop.maxpp(f, width)
    assert gp.avgpp(f, width) == audioop.avgpp(f, width)


def test_meters_smooth_signal():
    t = np.arange(2000)
    a = (10000 * np.sin(t * 0.05)).astype(np.int64)
    f = gp.tobytes(a, 2)
    assert gp.maxpp(f, 2) == audioop.maxpp(f, 2)
    assert gp.avgpp(f, 2) == audioop.avgpp(f, 2)
    assert gp.cross(f, 2) == audioop.cross(f, 2)


RATE_PAIRS = [
    (44100, 44100), (44100, 22050), (22050, 44100), (44100, 48000),
    (48000, 44100), (44100, 8000), (8000, 44100), (44100, 32000),
    (44101, 48000), (3, 7), (7, 3), (1, 4), (4, 1), (44100, 11025),
]


@pytest.mark.parametrize("width", [1, 2, 4])
@pytest.mark.parametrize("nch", [1, 2])
@pytest.mark.parametrize("inrate,outrate", RATE_PAIRS)
def test_ratecv_whole(rng, width, nch, inrate, outrate):
    f = rand_frag(rng, 500, width, nch=nch)
    ours, st_ours = gp.ratecv(f, width, nch, inrate, outrate, None)
    ref, st_ref = audioop.ratecv(f, width, nch, inrate, outrate, None)
    assert ours == ref
    assert st_ours == st_ref


@pytest.mark.parametrize("inrate,outrate", [(44100, 48000), (44100, 22050), (3, 7)])
def test_ratecv_chunked_matches_whole(rng, inrate, outrate):
    f = rand_frag(rng, 1000, 2, nch=2)
    whole, _ = gp.ratecv(f, 2, 2, inrate, outrate, None)
    st = None
    parts = []
    data = gp.frombytes(f, 2)
    for i in range(0, 1000, 37):
        chunk = gp.tobytes(data[i * 2:(i + 37) * 2], 2)
        out, st = gp.ratecv(chunk, 2, 2, inrate, outrate, st)
        parts.append(out)
    assert b"".join(parts) == whole
    # and the audioop state format round-trips both ways
    st_a = None
    parts_a = []
    for i in range(0, 1000, 37):
        chunk = gp.tobytes(data[i * 2:(i + 37) * 2], 2)
        out, st_a = audioop.ratecv(chunk, 2, 2, inrate, outrate, st_a)
        parts_a.append(out)
    assert b"".join(parts) == b"".join(parts_a)


def test_ratecv_nframes_out(rng):
    for inrate, outrate in RATE_PAIRS:
        f = rand_frag(rng, 123, 2)
        out, _ = gp.ratecv(f, 2, 1, inrate, outrate, None)
        assert len(out) // 2 == gp.ratecv_nframes_out(123, inrate, outrate)


def test_ratecv_empty_and_tiny(rng):
    for n in (0, 1, 2):
        f = rand_frag(rng, n, 2)
        ours, st_o = gp.ratecv(f, 2, 1, 44100, 48000, None)
        ref, st_r = audioop.ratecv(f, 2, 1, 44100, 48000, None)
        assert ours == ref and st_o == st_r
