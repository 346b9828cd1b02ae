"""Device Sample vs the golden-oracle Sample.

Tolerance classes (see goldref.sample module docstring):
  exact  — integer/arrangement ops and single-product scaling ops
  1 LSB  — gain-ramp / multiply-add ops (backend FMA contraction allowed)
"""

import io

import numpy as np
import pytest

import goldref.sample as gs
from synthesizer_tpu.sample import Sample, LevelMeter
from synthesizer_tpu.utils import wavio

SR = 44100


def make_pair(rng, n=5000, width=2, nch=2, sr=SR):
    lo, hi = gs.MINVAL[width], gs.MAXVAL[width]
    a = rng.integers(lo // 2, hi // 2, size=(n, nch)).astype(gs._DTYPES[width])
    gold = gs.Sample(a.copy(), sr, width, nch)
    dev = Sample.from_raw_frames(a.tobytes(), width, sr, nch)
    return gold, dev


def check_exact(gold, dev):
    assert gold.samplewidth == dev.samplewidth
    assert gold.nchannels == dev.nchannels
    assert gold.samplerate == dev.samplerate
    np.testing.assert_array_equal(dev.get_frame_array(), gold.frames)


def check_1lsb(gold, dev):
    assert gold.frames.shape == dev.get_frame_array().shape
    d = dev.get_frame_array().astype(np.int64) - gold.frames.astype(np.int64)
    assert np.abs(d).max() <= 1


@pytest.mark.parametrize("factor", [0.5, -0.5, 1.5, 0.123, 0.0])
def test_amplify(rng, factor):
    gold, dev = make_pair(rng)
    check_exact(gold.amplify(factor), dev.amplify(factor))


def test_amplify_max_and_invert(rng):
    gold, dev = make_pair(rng)
    check_exact(gold.amplify_max(), dev.amplify_max())
    gold, dev = make_pair(rng)
    check_exact(gold.invert(), dev.invert())


def test_bias(rng):
    gold, dev = make_pair(rng)
    check_exact(gold.bias(1234), dev.bias(1234))


def test_arrangement_ops(rng):
    gold, dev = make_pair(rng)
    check_exact(gold.clip(0.01, 0.05), dev.clip(0.01, 0.05))
    gold, dev = make_pair(rng)
    check_exact(gold.cut(0.02, 0.04), dev.cut(0.02, 0.04))
    gold, dev = make_pair(rng)
    gtail = gold.split(0.05)
    dtail = dev.split(0.05)
    check_exact(gold, dev)
    check_exact(gtail, dtail)
    gold, dev = make_pair(rng)
    check_exact(gold.add_silence(0.01), dev.add_silence(0.01))
    gold, dev = make_pair(rng)
    check_exact(gold.add_silence(0.01, at_start=True), dev.add_silence(0.01, at_start=True))
    g2, d2 = make_pair(rng, n=777)
    check_exact(gold.join(g2), dev.join(d2))
    gold, dev = make_pair(rng)
    check_exact(gold.reverse(), dev.reverse())
    for sec, keep in [(0.01, False), (0.01, True), (-0.01, False), (-0.01, True)]:
        gold, dev = make_pair(rng)
        check_exact(gold.delay(sec, keep), dev.delay(sec, keep))


def test_fades(rng):
    gold, dev = make_pair(rng)
    check_1lsb(gold.fadein(0.05), dev.fadein(0.05))
    gold, dev = make_pair(rng)
    check_1lsb(gold.fadeout(0.05, 0.1), dev.fadeout(0.05, 0.1))
    gold, dev = make_pair(rng)
    check_1lsb(gold.fadein(99.0, 0.2), dev.fadein(99.0, 0.2))  # longer than sample


def test_envelope(rng):
    gold, dev = make_pair(rng, n=SR // 2)
    gold.envelope(0.05, 0.1, 0.6, 0.1)
    dev.envelope(0.05, 0.1, 0.6, 0.1)
    check_1lsb(gold, dev)


def test_modulate_amp_array(rng):
    gold, dev = make_pair(rng, n=3000)
    g = (0.5 + 0.5 * np.sin(np.arange(3000) * 0.01)).astype(np.float32)
    check_exact(gold.modulate_amp(g), dev.modulate_amp(g))


def test_modulate_amp_sample(rng):
    gold, dev = make_pair(rng, n=3000)
    modg, modd = make_pair(rng, n=3000, nch=1)
    check_exact(gold.modulate_amp(modg), dev.modulate_amp(modd))


def test_mix_and_mix_at(rng):
    gold, dev = make_pair(rng)
    g2, d2 = make_pair(rng, n=3000)
    check_exact(gold.mix(g2), dev.mix(d2))
    gold, dev = make_pair(rng, n=3000)
    g2, d2 = make_pair(rng, n=3000)
    check_exact(gold.mix_at(0.04, g2), dev.mix_at(0.04, d2))   # extends
    gold, dev = make_pair(rng, n=3000)
    g2, d2 = make_pair(rng, n=3000)
    check_exact(gold.mix_at(0.04, g2, pad_shortest=False),
                dev.mix_at(0.04, d2, pad_shortest=False))
    gold, dev = make_pair(rng, n=3000)
    g2, d2 = make_pair(rng, n=3000)
    check_exact(gold.mix(g2, other_seconds=0.02), dev.mix(d2, other_seconds=0.02))


def test_echo(rng):
    gold, dev = make_pair(rng, n=4000)
    gold.echo(0.2, 3, 0.03, 0.5)
    dev.echo(0.2, 3, 0.03, 0.5)
    check_exact(gold, dev)


def test_width_conversions(rng):
    for scale in (True, False):
        gold, dev = make_pair(rng)
        check_exact(gold.make_32bit(scale), dev.make_32bit(scale))
    gold, dev = make_pair(rng, width=4)
    check_exact(gold.make_16bit(maximize_amplitude=False),
                dev.make_16bit(maximize_amplitude=False))
    gold, dev = make_pair(rng, width=4)
    check_exact(gold.make_16bit(True), dev.make_16bit(True))


def test_resample_and_speed(rng):
    gold, dev = make_pair(rng, n=8000)
    check_exact(gold.resample(22050), dev.resample(22050))
    gold, dev = make_pair(rng, n=8000)
    check_exact(gold.speed(1.5), dev.speed(1.5))
    gold, dev = make_pair(rng, n=8000)
    check_exact(gold.speed(0.75), dev.speed(0.75))


def test_mono_stereo_ops(rng):
    gold, dev = make_pair(rng)
    gold.mono(0.5, 0.5)
    dev.mono(0.5, 0.5)
    check_1lsb(gold, dev)
    gold, dev = make_pair(rng, nch=1)
    check_exact(gold.stereo(0.7, 0.3), dev.stereo(0.7, 0.3))


def test_stereo_mix(rng):
    gold, dev = make_pair(rng)
    g2, d2 = make_pair(rng, nch=1)
    check_exact(gold.stereo_mix(g2, "L", 0.5), dev.stereo_mix(d2, "L", 0.5))
    gold, dev = make_pair(rng)
    g2, d2 = make_pair(rng, nch=1)
    check_exact(gold.stereo_mix(g2, "R"), dev.stereo_mix(d2, "R"))


def test_pan_static_and_lfo(rng):
    gold, dev = make_pair(rng)
    check_exact(gold.pan(0.5), dev.pan(0.5))
    gold, dev = make_pair(rng)
    lfo = np.sin(np.arange(gold.nframes) * 0.001).astype(np.float32)
    gold.pan(lfo=lfo)
    dev.pan(lfo=lfo)
    check_exact(gold, dev)
    # mono input becomes stereo
    gold, dev = make_pair(rng, nch=1)
    check_exact(gold.pan(-0.25), dev.pan(-0.25))


def test_pan_and_modulate_with_oscillator_lfo_vs_oracle(rng):
    """pan(lfo=Oscillator) / modulate_amp(Oscillator) stage the patch
    render as IR nodes (pan_patch / modulate_patch): values must equal
    goldref applied with the ORACLE-rendered gains, in one fused program."""
    import goldref.osc as go
    import goldref.spec as gS
    from synthesizer_tpu import oscillators as osc
    from synthesizer_tpu.utils import profiling

    for which in ("pan", "modulate"):
        gold, dev = make_pair(rng)
        n = gold.nframes
        lfo = osc.Sine(1.5, amplitude=0.6, samplerate=SR)
        gains = go.render_oracle(gS.Osc("sine", 1.5, 0.6), n, SR)
        with profiling.count_program_launches() as cnt:
            if which == "pan":
                dev.pan(lfo=lfo)
            else:
                dev.modulate_amp(lfo)
            dev.get_frame_array()
        assert cnt[0] == 1, (which, cnt[0])
        if which == "pan":
            gold.pan(lfo=gains)
        else:
            gold.modulate_amp(gains)
        d = np.abs(dev.get_frame_array().astype(np.int64)
                   - gold.frames.astype(np.int64))
        assert d.max() <= 1, (which, d.max())   # trig-parity budget


def test_pan_sample_lfo_fuses(rng):
    """pan(lfo=Sample): the LFO sample's own staged chain fuses in as a
    sub-program (no separate materialization) and matches goldref's
    per-frame amounts."""
    from synthesizer_tpu.utils import profiling
    gold, dev = make_pair(rng)
    n = gold.nframes
    lfo_i16 = (np.sin(np.arange(n) * 0.002) * 32767).astype(np.int16)
    glfo_amt = lfo_i16.astype(np.float32) / np.float32(32767.0)
    dlfo = Sample.from_raw_frames(lfo_i16.tobytes(), 2, SR, 1)
    dlfo.amplify(1.0)                    # keep a pending op: must fuse in
    with profiling.count_program_launches() as cnt:
        dev.pan(lfo=dlfo)
        dev.get_frame_array()
    assert cnt[0] == 1, f"pan(lfo=Sample) launched {cnt[0]} programs"
    glfo = np.floor(glfo_amt.astype(np.float32) * np.float32(1.0)).astype(np.float32)
    # goldref twin: amplify(1.0) floors the product (audioop.mul spec)
    import goldref.sample as gsm
    gl = gsm.Sample(lfo_i16[:, None].copy(), SR, 2, 1)
    gl.amplify(1.0)
    gold.pan(lfo=gl.frames[:, 0].astype(np.float32) / np.float32(32767.0))
    # <=1 LSB: XLA may turn the /32767 normalization into a reciprocal
    # multiply inside the fused program (documented float-chain budget)
    d = np.abs(dev.get_frame_array().astype(np.int64)
               - gold.frames.astype(np.int64))
    assert d.max() <= 1, d.max()


def test_chunked_frame_data(rng):
    gold, dev = make_pair(rng, n=1000)
    gchunks = list(gold.chunked_frame_data(256))
    dchunks = list(dev.chunked_frame_data(256))
    assert gchunks == dchunks
    it = dev.chunked_frame_data(256, repeat=True)
    first = [next(it) for _ in range(6)]
    assert all(len(c) == 256 * 2 * 2 for c in first)


def test_wav_roundtrip(rng, tmp_path):
    _, dev = make_pair(rng, n=2000)
    p = str(tmp_path / "t.wav")
    dev.write_wav(p)
    back = Sample(wave_file=p)
    assert back == dev
    # in-memory
    bio = io.BytesIO()
    dev.write_wav(bio)
    bio.seek(0)
    assert Sample(wave_file=bio) == dev


def test_wav_8bit_roundtrip(rng, tmp_path):
    _, dev = make_pair(rng, n=500, width=1, nch=1)
    p = str(tmp_path / "t8.wav")
    dev.write_wav(p)
    back = Sample(wave_file=p)
    assert back == dev


def test_normalize(rng):
    gold, dev = make_pair(rng, n=3000, width=2, nch=1, sr=22050)
    dev.normalize()
    assert dev.samplerate == 44100 and dev.nchannels == 2 and dev.samplewidth == 2


def test_from_array_and_len(rng):
    vals = np.sin(np.arange(100) * 0.3)
    s = Sample.from_array(vals, SR, 1)
    assert len(s) == 100 and s.samplewidth == 2
    s2 = Sample.from_array(np.rint(vals * 32767).astype(np.int16), SR, 1)
    assert s == s2


def test_levelmeter(rng):
    _, dev = make_pair(rng, n=4410)
    m = LevelMeter()
    l, pl, r, pr = m.update(dev)
    assert -60 <= l <= 0 and -60 <= r <= 0
    quiet = Sample.from_raw_frames(np.zeros(4410 * 2, np.int16).tobytes(), 2, SR, 2)
    for _ in range(5):
        m.update(quiet)
    assert m.level_left < l  # decayed
    m2 = LevelMeter(rms_mode=True)
    m2.update(dev)
    assert m2.level_left <= 0.0


def test_format_mismatch_raises(rng):
    _, a = make_pair(rng)
    _, b = make_pair(rng, sr=22050)
    with pytest.raises(ValueError):
        a.mix(b)


def test_mix_at_negative_offset_raises(rng):
    _, a = make_pair(rng)
    _, b = make_pair(rng)
    with pytest.raises(ValueError):
        a.mix_at(-0.1, b)
