"""Native pcmops C library vs the golden oracle (and its numpy fallback)."""

import numpy as np
import pytest

import goldref.pcm as gp
from synthesizer_tpu.utils import native


def test_builds_and_loads():
    # the toolchain is baked into this image; the library must build
    assert native.available()


def test_sat_add_matches_goldref(rng):
    a = rng.integers(-32768, 32768, 5000).astype(np.int16)
    b = rng.integers(-32768, 32768, 5000).astype(np.int16)
    got = native.sat_add_i16(a, b)
    want = gp.frombytes(gp.add(gp.tobytes(a, 2), gp.tobytes(b, 2), 2), 2)
    np.testing.assert_array_equal(got, want)


def test_mix_k_matches_widened_sum(rng):
    bufs = [rng.integers(-20000, 20000, 3000).astype(np.int16) for _ in range(7)]
    got = native.mix_k_i16(bufs)
    want = np.clip(np.sum([b.astype(np.int32) for b in bufs], axis=0),
                   -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(got, want)


def test_mul_floor_matches_f32_spec(rng):
    a = rng.integers(-32768, 32768, 3000).astype(np.int16)
    for factor in (0.5, -0.3, 1.7, 0.12345):
        got = native.mul_floor_i16(a, factor)
        want = gp.frombytes(gp.mul_f32(gp.tobytes(a, 2), 2, factor), 2)
        np.testing.assert_array_equal(got, want)


def test_vu(rng):
    st = rng.integers(-30000, 30000, (4410, 2)).astype(np.int16)
    pl_, pr_, ml, mr = native.vu_i16(st)
    assert pl_ == np.abs(st[:, 0].astype(np.int64)).max()
    assert pr_ == np.abs(st[:, 1].astype(np.int64)).max()
    assert ml == pytest.approx(float((st[:, 0].astype(np.float64) ** 2).mean()))
    assert mr == pytest.approx(float((st[:, 1].astype(np.float64) ** 2).mean()))
