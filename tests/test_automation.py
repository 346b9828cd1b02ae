"""[automation] curves: track volume (per-hit/per-note velocity) and
continuous master volume, on both the offline and streaming song paths.
"""

import numpy as np
import pytest

from synthesizer_tpu import WaveSynth
from synthesizer_tpu.sequencer import Song, SynthDef

SR = 44100


def drum_song(curve=None):
    synth = WaveSynth(samplerate=SR, samplewidth=2)
    song = Song()
    song.bpm = 240
    song.ticks = 4
    song.add_instrument("kick", synth.sine(60.0, 0.08, amplitude=0.6)
                        .fadeout(0.05).stereo())
    song.add_pattern("a", {"kick": "x...x...x...x..."})
    song.pattern_sequence = ["a"]
    if curve is not None:
        song.add_automation("track.kick.volume", curve)
    return song


def lead_song(track_curve=None, master_curve=None):
    song = Song()
    song.bpm = 240
    song.ticks = 4
    song.add_synth("lead", SynthDef(wave="square_bl", amplitude=0.3,
                                    attack=0.005, release=0.05))
    song.add_pattern("a", {"lead": "C4 .. .. .. C4 .. .. .."})
    song.pattern_sequence = ["a"]
    if track_curve is not None:
        song.add_automation("track.lead.volume", track_curve)
    if master_curve is not None:
        song.add_automation("master.volume", master_curve)
    return song


# ---------------------------------------------------------------------------
# Parsing / validation
# ---------------------------------------------------------------------------

def test_ini_automation_roundtrip(tmp_path):
    ini = tmp_path / "song.ini"
    wav = tmp_path / "kick.wav"
    WaveSynth(samplerate=SR, samplewidth=2).sine(60, 0.05).stereo() \
        .write_wav(str(wav))
    ini.write_text("""
[song]
bpm = 240
ticks = 4
patterns = a
[instruments]
kick = kick.wav
[synth.lead]
wave = sine
[pattern.a]
kick = x...x...
lead = C4 .. C5 ..
[automation]
master.volume = 0:1.0 8:0.25
track.kick.volume = 0:1 4:0.5
track.lead.volume = 0:0.8
""")
    song = Song.from_ini(str(ini))
    assert song.automation["master.volume"] == [(0.0, 1.0), (8.0, 0.25)]
    assert song.automation["track.kick.volume"] == [(0.0, 1.0), (4.0, 0.5)]
    assert song.automation["track.lead.volume"] == [(0.0, 0.8)]
    # and it renders on both paths
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=1000)])
    np.testing.assert_array_equal(got, off[:len(got)])


def test_automation_validation():
    song = drum_song()
    with pytest.raises(ValueError, match="strictly ascending"):
        song.add_automation("track.kick.volume", "0:1 0:0.5")
    with pytest.raises(ValueError, match="tick:value"):
        song.add_automation("master.volume", "nonsense")
    with pytest.raises(ValueError, match="unknown track"):
        song.add_automation("track.ghost.volume", "0:1")
    with pytest.raises(ValueError, match="not understood"):
        song.add_automation("track.kick.cutoff", "0:1")
    with pytest.raises(ValueError, match="bad breakpoint"):
        song.add_automation("master.volume", "0:-1")
    with pytest.raises(ValueError, match="empty"):
        song.add_automation("master.volume", [])


# ---------------------------------------------------------------------------
# Track volume (velocity automation)
# ---------------------------------------------------------------------------

def test_drum_velocity_scales_hits():
    """Hits pick up the curve value at their start tick: with the kick
    at ticks 0/4/8/12 and a 1 -> 0.25 ramp over 12 ticks, each hit is an
    exactly rint-scaled copy of the first."""
    song = drum_song(curve="0:1 12:0.25")
    sched = song.compile_schedule()
    np.testing.assert_allclose(sched.gains,
                               np.repeat([[1.0], [0.75], [0.5], [0.25]], 2, 1))
    out = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    kick = song.instruments["kick"].get_frame_array().astype(np.float64)
    tickf = song.tick_duration * SR
    for i, g in enumerate([1.0, 0.75, 0.5, 0.25]):
        start = int(4 * i * tickf)
        got = out[start:start + len(kick)]
        expect = np.rint(kick * np.float32(g)).astype(np.int64)
        np.testing.assert_array_equal(got.astype(np.int64), expect)


def test_no_automation_is_bit_exact_integer_path():
    """gain=1.0 must reproduce the historic pure-integer scatter."""
    a = drum_song(curve=None).mix(normalize=False).get_frame_array()
    b = drum_song(curve="0:1").mix(normalize=False).get_frame_array()
    np.testing.assert_array_equal(a, b)


def test_synth_velocity_scales_notes():
    """A note's amplitude scales by the curve at its start tick — the
    second C4 at half volume equals a song whose synth amplitude is
    halved for that note."""
    song = lead_song(track_curve="0:1 4:0.5")
    voices = song.compile_synth_voices()
    assert [v.amplitude for v in voices] == pytest.approx([0.3, 0.15])
    # oracle: same song, no automation, second-note synth def at half amp
    out = song.mix(normalize=False, tail_seconds=0.1).get_frame_array()
    solo2 = lead_song()
    solo2.synths["lead"].amplitude = 0.15
    solo2.add_pattern("a", {"lead": ".. .. .. .. C4 .. .. .."})
    b = solo2.mix(normalize=False, tail_seconds=0.1).get_frame_array()
    solo1 = lead_song()
    solo1.add_pattern("a", {"lead": "C4 .. .. .. .. .. .. .."})
    a = solo1.mix(normalize=False, tail_seconds=0.1).get_frame_array()
    n = min(len(out), len(a), len(b))
    d = np.abs(out[:n].astype(np.int64)
               - (a[:n].astype(np.int64) + b[:n].astype(np.int64))).max()
    assert d <= 2, d


@pytest.mark.parametrize("chunk", [1000, 4096])
def test_velocity_streaming_equals_offline(chunk):
    song = drum_song(curve="0:1 12:0.1")
    song.add_synth("lead", SynthDef(wave="sine", amplitude=0.2))
    song.patterns["a"]["lead"] = "C4 - .. .. E4 - .. .."
    song.add_automation("track.lead.volume", "0:1 8:0.3")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    np.testing.assert_array_equal(got, off[:len(got)])


def test_velocity_sharded_mix_bit_exact():
    from synthesizer_tpu.parallel.mesh import voice_mesh
    song = drum_song(curve="0:1 12:0.25")
    single = song.mix(normalize=False).get_frame_array()
    sharded = song.mix(normalize=False, mesh=voice_mesh(8)).get_frame_array()
    np.testing.assert_array_equal(single, sharded)


# ---------------------------------------------------------------------------
# Track pan automation
# ---------------------------------------------------------------------------

def test_drum_pan_places_hits():
    """Pan automation on a drum track: a hit at pan p scales channels by
    the equal-gain law (lg=min(1,1-p), rg=min(1,1+p)) at its start tick."""
    song = drum_song()
    song.add_automation("track.kick.volume", "0:0.5")
    song.add_automation("track.kick.pan", "0:-1 12:1")
    sched = song.compile_schedule()
    # ticks 0/4/8/12 -> pans -1, -1/3, 1/3, 1
    pans = [-1.0, -1/3, 1/3, 1.0]
    want = np.asarray([[0.5 * min(1, 1 - p), 0.5 * min(1, 1 + p)]
                       for p in pans], np.float32)
    np.testing.assert_allclose(sched.gains, want, rtol=1e-6)
    out = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    kick = song.instruments["kick"].get_frame_array().astype(np.float64)
    tickf = song.tick_duration * SR
    # first hit: hard left -> right channel silent
    h0 = out[: len(kick)]
    assert np.abs(h0[:, 1]).max() == 0 and np.abs(h0[:, 0]).max() > 0
    # last hit: hard right
    s3 = int(12 * tickf)
    h3 = out[s3: s3 + len(kick)]
    assert np.abs(h3[:, 0]).max() == 0 and np.abs(h3[:, 1]).max() > 0


def test_synth_pan_automation_overrides_def():
    song = lead_song()
    song.add_automation("track.lead.pan", "0:-0.8 4:0.8")
    voices = song.compile_synth_voices()
    assert [v.pan for v in voices] == pytest.approx([-0.8, 0.8])
    out = song.mix(normalize=False, tail_seconds=0.1).get_frame_array()
    tickf = song.tick_duration * SR
    n1 = slice(0, int(2 * tickf))
    n2 = slice(int(4 * tickf), int(6 * tickf))
    # first note louder left, second louder right
    def rms(x):
        return np.sqrt(np.mean(np.square(x.astype(np.float64)), axis=0))
    l1, r1 = rms(out[n1])
    l2, r2 = rms(out[n2])
    assert l1 > r1 * 2 and r2 > l2 * 2


@pytest.mark.parametrize("chunk", [1000, 4096])
def test_pan_automation_streaming_equals_offline(chunk):
    song = drum_song()
    song.add_automation("track.kick.pan", "0:-1 12:1")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    np.testing.assert_array_equal(got, off[:len(got)])


def test_pan_automation_sharded_bit_exact():
    from synthesizer_tpu.parallel.mesh import voice_mesh
    song = drum_song()
    song.add_automation("track.kick.pan", "0:-0.5 12:0.5")
    single = song.mix(normalize=False).get_frame_array()
    sharded = song.mix(normalize=False, mesh=voice_mesh(8)).get_frame_array()
    np.testing.assert_array_equal(single, sharded)


def test_pan_automation_validation():
    song = drum_song()
    with pytest.raises(ValueError, match=r"\[-1, 1\]"):
        song.add_automation("track.kick.pan", "0:2")
    song.nchannels = 1
    with pytest.raises(ValueError, match="stereo"):
        song.add_automation("track.kick.pan", "0:0.5")


# ---------------------------------------------------------------------------
# Master volume
# ---------------------------------------------------------------------------

def test_master_volume_fades_mix():
    song = drum_song()
    base = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    song.add_automation("master.volume", "0:1 16:0")
    out = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    # expected: per-frame linear gain on the saturated mix
    tickf = song.tick_duration * SR
    n = np.arange(len(base), dtype=np.float32)
    g = np.interp(n / np.float32(tickf), [0.0, 16.0], [1.0, 0.0]) \
        .astype(np.float32)
    expect = np.clip(np.rint(base.astype(np.float32) * g[:, None]),
                     -32768, 32767).astype(np.int16)
    d = np.abs(out.astype(np.int64) - expect.astype(np.int64)).max()
    assert d <= 1, d        # host np.interp vs device interp rounding
    # the fade actually fades: the last hit (tick 12, gain 0.25) renders
    # at about a quarter of the unautomated peak
    tick12 = int(12 * tickf)
    seg = slice(tick12, tick12 + 1000)
    assert np.abs(out[: 1000]).max() > 0
    ratio = np.abs(out[seg]).max() / max(np.abs(base[seg]).max(), 1)
    assert 0.15 < ratio < 0.35, ratio


@pytest.mark.parametrize("chunk", [1000, 4096])
def test_master_volume_streaming_bit_exact(chunk):
    song = lead_song(master_curve="0:1 8:0.2")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    np.testing.assert_array_equal(got, off[:len(got)])


def test_master_volume_seek_bit_exact():
    song = lead_song(master_curve="0:1 8:0.2")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    seek = 12345
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=2048,
                                                      start_frame=seek)])
    np.testing.assert_array_equal(got, off[seek:seek + len(got)])


def test_master_volume_before_fx_chain():
    """Mastering order: volume automation feeds the [fx] chain (a fade
    into a compressor releases it, rather than the compressor output
    being faded)."""
    song = lead_song(master_curve="0:1 8:0")
    song.add_fx("reverb", wet=0.5, dry=0.5, tail=0.1)
    out = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    # with volume BEFORE the chain, the reverb tail of the faded signal
    # still rings after the programme (it was fed pre-fade audio early on)
    assert len(out) == song.duration_frames() + int(0.1 * SR)
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=1470)])
    assert len(got) == len(out)
    d = np.abs(got.astype(np.int64) - out.astype(np.int64)).max()
    assert d <= 8, d


# ---------------------------------------------------------------------------
# fx.filter.cutoff (master-chain filter-sweep automation)
# ---------------------------------------------------------------------------

def bright_song():
    song = Song()
    song.bpm = 240
    song.ticks = 4
    song.add_synth("saw", SynthDef(wave="sawtooth_bl", amplitude=0.4,
                                   attack=0.002, release=0.05))
    song.add_pattern("a", {"saw": "C3 - - - C3 - - - C3 - - - C3 - - -"})
    song.pattern_sequence = ["a"]
    return song


def test_fx_filter_cutoff_requires_filter():
    song = bright_song()
    with pytest.raises(ValueError, match="no filter"):
        song.add_automation("fx.filter.cutoff", "0:200 16:8000")
    song.add_fx("filter", kind="lowpass", cutoff=1000.0)
    song.add_automation("fx.filter.cutoff", "0:200 16:8000")
    song.add_fx("filter", kind="highpass", cutoff=100.0)
    with pytest.raises(ValueError, match="several filter"):
        song.add_automation("fx.filter.cutoff", "0:200 16:8000")


def test_fx_filter_cutoff_sweeps_the_spectrum():
    """A 200 Hz -> 8 kHz lowpass sweep: the late part of the song keeps
    far more high-frequency energy than the early part."""
    song = bright_song()
    song.add_fx("filter", kind="lowpass", cutoff=1000.0, q=0.7071)
    song.add_automation("fx.filter.cutoff", "0:200 16:8000")
    out = song.mix(normalize=False, tail_seconds=0.0).get_frame_array() \
        .astype(np.float64)

    def hf_ratio(x):
        d = np.diff(x[:, 0])
        return np.sqrt(np.mean(d * d)) / max(
            np.sqrt(np.mean(x[:, 0] * x[:, 0])), 1e-9)

    n = len(out)
    early = hf_ratio(out[: n // 8])               # cutoff ~200-1200 Hz
    late = hf_ratio(out[6 * n // 8: 7 * n // 8])  # cutoff ~6-7 kHz
    assert late > early * 1.8, (early, late)


@pytest.mark.parametrize("chunk", [1000, 4096])
def test_fx_filter_cutoff_streaming_equals_offline(chunk):
    song = bright_song()
    song.add_fx("filter", kind="lowpass", cutoff=1000.0, q=2.0)
    song.add_automation("fx.filter.cutoff", "0:300 8:6000 16:300")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    assert len(got) == len(off)
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    # swept-filter scan regrouping at chunk boundaries (same class as the
    # static filter's budget, amplified a little by Q=2)
    assert d <= 8, d


def test_fx_filter_cutoff_ini_roundtrip(tmp_path):
    ini = tmp_path / "song.ini"
    ini.write_text("""
[song]
bpm = 240
ticks = 4
patterns = a
[synth.saw]
wave = sawtooth_bl
[pattern.a]
saw = C3 - C3 -
[fx]
filter = kind=lowpass cutoff=1000 q=1.5
[automation]
fx.filter.cutoff = 0:250 8:5000
""")
    song = Song.from_ini(str(ini))
    assert song.automation["fx.filter.cutoff"] == [(0.0, 250.0), (8.0, 5000.0)]
    out = song.mix(normalize=False).get_frame_array()
    assert np.abs(out).max() > 100


# ---------------------------------------------------------------------------
# fx.reverb.wet / fx.reverb.dry (output-stage gain automation)
# ---------------------------------------------------------------------------

def test_fx_reverb_wet_rides_up():
    """wet 0 -> 0.8: early audio is (near) dry-only; the late half and
    the tail carry reverb energy."""
    song = bright_song()
    song.add_fx("reverb", roomsize=0.8, wet=0.3, dry=0.6, tail=0.25)
    song.add_automation("fx.reverb.wet", "0:0 16:0.8")
    out = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    base = bright_song()
    base.add_fx("reverb", roomsize=0.8, wet=0.0, dry=0.6, tail=0.25)
    dry_only = base.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    n = min(len(out), len(dry_only))
    # at the very start the curves agree (wet ~ 0): nearly identical
    head = np.abs(out[:300].astype(np.int64)
                  - dry_only[:300].astype(np.int64)).max()
    assert head <= 8, head
    # the tail rings only for the automated song (its wet ended at 0.8)
    prog_end = bright_song().duration_frames()
    assert np.abs(out[prog_end:prog_end + 4000]).max() > 50
    assert np.abs(dry_only[prog_end:prog_end + 4000]).max() <= 2


@pytest.mark.parametrize("chunk", [1000, 4096])
def test_fx_reverb_automation_streaming_equals_offline(chunk):
    song = bright_song()
    song.add_fx("compress", threshold_db=-18.0, ratio=3.0)
    song.add_fx("reverb", roomsize=0.7, wet=0.3, dry=0.7, tail=0.2)
    song.add_automation("fx.reverb.wet", "0:0.1 8:0.6 16:0.1")
    song.add_automation("fx.reverb.dry", "0:0.9 16:0.4")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    assert len(got) == len(off)
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 8, d


def test_fx_reverb_automation_requires_reverb():
    song = bright_song()
    with pytest.raises(ValueError, match="no reverb"):
        song.add_automation("fx.reverb.wet", "0:0.5")


# ---------------------------------------------------------------------------
# fx.chorus.wet/.dry + fx.compress.makeup_db (output-stage gain curves)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("chunk", [1000, 4096])
def test_fx_chorus_and_makeup_automation_streaming(chunk):
    song = bright_song()
    song.add_fx("chorus", rate=1.5, depth=0.002, delay=0.015, wet=0.4)
    song.add_fx("compress", threshold_db=-18.0, ratio=3.0)
    song.add_automation("fx.chorus.wet", "0:0 8:0.7 16:0")
    song.add_automation("fx.chorus.dry", "0:1 16:0.7")
    song.add_automation("fx.compress.makeup_db", "0:-6 16:6")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    assert len(got) == len(off)
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 8, d


def test_fx_makeup_automation_gains():
    """makeup -12 dB -> +0 dB over the song: the end is ~4x the start
    relative to the un-automated render."""
    base = bright_song()
    base.add_fx("compress", threshold_db=-18.0, ratio=3.0, makeup_db=0.0)
    a = base.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    song = bright_song()
    song.add_fx("compress", threshold_db=-18.0, ratio=3.0)
    song.add_automation("fx.compress.makeup_db", "0:-12 16:0")
    b = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    n = min(len(a), len(b))

    def rms(x):
        return np.sqrt(np.mean(np.square(x.astype(np.float64))))
    r_head = rms(b[: n // 8]) / max(rms(a[: n // 8]), 1e-9)
    r_tail = rms(b[6 * n // 8: 7 * n // 8]) \
        / max(rms(a[6 * n // 8: 7 * n // 8]), 1e-9)
    assert r_head < 0.4            # ~-10.5 dB average over the first 8th
    assert r_tail > 0.7            # approaching unity near the end


def test_fx_automation_validation_targets():
    song = bright_song()
    with pytest.raises(ValueError, match="no chorus"):
        song.add_automation("fx.chorus.wet", "0:0.5")
    with pytest.raises(ValueError, match="no compress"):
        song.add_automation("fx.compress.makeup_db", "0:3")
    song.add_fx("compress", threshold_db=-18.0)
    song.add_automation("fx.compress.makeup_db", "0:-6 8:6")   # negative ok


@pytest.mark.parametrize("chunk", [1000, 4096])
def test_fx_threshold_and_ratio_automation_streaming(chunk):
    song = bright_song()
    song.add_fx("gate", threshold_db=-60.0, range_db=40.0)
    song.add_fx("compress", threshold_db=-18.0, ratio=3.0)
    song.add_automation("fx.compress.threshold_db", "0:-30 16:-10")
    song.add_automation("fx.compress.ratio", "0:8 16:1.5")
    song.add_automation("fx.gate.threshold_db", "0:-70 16:-35")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    assert len(got) == len(off)
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 8, d


def test_fx_threshold_automation_compresses_more_when_low():
    """threshold -40 -> -5 over the song: the early (deep-threshold) part
    gets squashed harder than the late part, relative to no compression."""
    base = bright_song().mix(normalize=False,
                             tail_seconds=0.0).get_frame_array()
    song = bright_song()
    song.add_fx("compress", threshold_db=-18.0, ratio=8.0, attack=0.001,
                release=0.02)
    song.add_automation("fx.compress.threshold_db", "0:-40 16:-5")
    out = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    n = min(len(base), len(out))

    def rms(x):
        return np.sqrt(np.mean(np.square(x.astype(np.float64))))
    head = rms(out[: n // 8]) / max(rms(base[: n // 8]), 1e-9)
    tail = rms(out[6 * n // 8: 7 * n // 8]) \
        / max(rms(base[6 * n // 8: 7 * n // 8]), 1e-9)
    assert head < tail * 0.7, (head, tail)


# ---------------------------------------------------------------------------
# Recurrence-internal automation (round 3): fx.compress.attack/.release,
# fx.chorus.rate/.depth, fx.reverb.roomsize — host-derived coefficient
# grids entering the recurrences themselves.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("chunk", [1000, 4096])
def test_fx_compress_attack_release_automation_streaming(chunk):
    song = bright_song()
    song.add_fx("compress", threshold_db=-25.0, ratio=6.0, attack=0.005,
                release=0.1)
    song.add_automation("fx.compress.attack", "0:0.0005 16:0.05")
    song.add_automation("fx.compress.release", "0:0.02 16:0.5")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    assert len(got) == len(off)
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 8, d


def test_fx_compress_coeff_automation_vs_goldref():
    """Device swept compressor vs the per-sample-coefficient oracle
    (goldref.effects.compressor_gains_swept) with the SAME host grids —
    the static budget applies (<= 2 LSB applied at 16-bit)."""
    import goldref.effects as gfx
    from synthesizer_tpu.effects import StreamingCompressor
    from synthesizer_tpu.ops.coeffs import (compressor_coeff_grids,
                                            curve_grid)
    import jax.numpy as jnp
    rng = np.random.default_rng(0xA77AC)
    n = 6000
    x = (rng.integers(-28000, 28000, size=(n, 2))).astype(np.int16)
    tickf = 44100 / 8.0
    att_c = [(0.0, 0.0008), (16.0, 0.04)]
    rel_c = [(0.0, 0.03), (16.0, 0.4)]
    proc = StreamingCompressor(44100, threshold_db=-22.0, ratio=5.0,
                               attack_curve=att_c, release_curve=rel_c,
                               tickf=tickf)
    got = np.asarray(proc.process(jnp.asarray(x)))
    alpha, decay = compressor_coeff_grids(
        curve_grid(att_c, 0, n, tickf), curve_grid(rel_c, 0, n, tickf),
        44100)
    a = np.max(np.abs(x.astype(np.float32) / np.float32(32767.0)),
               axis=1).astype(np.float32)
    slope = np.float32(1.0 - 1.0 / 5.0)
    gains = gfx.compressor_gains_swept(a, alpha, decay,
                                       np.float32(-22.0), slope)
    want = gfx._gain_floor(x, gains[:, None], 2)
    d = np.abs(got.astype(np.int64) - want.astype(np.int64)).max()
    assert d <= 2, d
    # constant grids == the static compressor, bit-exact
    proc_c = StreamingCompressor(44100, threshold_db=-22.0, ratio=5.0,
                                 attack_curve=[(0.0, 0.005)],
                                 release_curve=[(0.0, 0.1)], tickf=tickf)
    proc_s = StreamingCompressor(44100, threshold_db=-22.0, ratio=5.0,
                                 attack=0.005, release=0.1)
    yc = np.asarray(proc_c.process(jnp.asarray(x)))
    ys = np.asarray(proc_s.process(jnp.asarray(x)))
    d2 = np.abs(yc.astype(np.int64) - ys.astype(np.int64)).max()
    assert d2 <= 1, d2


@pytest.mark.parametrize("chunk", [1000, 4096])
def test_fx_chorus_rate_depth_automation_streaming(chunk):
    song = bright_song()
    song.add_fx("chorus", rate=0.8, depth=0.002, delay=0.015, wet=0.5)
    song.add_automation("fx.chorus.rate", "0:0.2 16:6.0")
    song.add_automation("fx.chorus.depth", "0:0.0005 16:0.004")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    assert len(got) == len(off)
    # gathers are exact and the phase mirror is integer math: the only
    # per-chunk difference is FMA regrouping in the lerp
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 2, d


def test_fx_chorus_rate_automation_vs_goldref():
    """Device swept chorus vs goldref.effects.chorus_swept with the same
    cumulative phase/depth grids (<= 2 LSB, the static chorus budget);
    a CONSTANT rate curve reproduces the static chorus exactly (P_n ==
    n*inc by integer math)."""
    import goldref.effects as gfx
    from synthesizer_tpu.effects import StreamingChorus
    from synthesizer_tpu.ops.coeffs import (chorus_inc_grid,
                                            chorus_phase_grid, curve_grid)
    import jax.numpy as jnp
    rng = np.random.default_rng(0xC0DA)
    n = 5000
    x = (rng.integers(-20000, 20000, size=(n, 2))).astype(np.int16)
    tickf = 44100 / 8.0
    rate_c = [(0.0, 0.3), (8.0, 5.0)]
    depth_c = [(0.0, 0.001), (8.0, 0.003)]
    proc = StreamingChorus(44100, 2, rate=0.5, depth=0.002, delay=0.012,
                           voices=3, wet=0.5, dry=0.9,
                           rate_curve=rate_c, depth_curve=depth_c,
                           tickf=tickf)
    got = np.asarray(proc.process(jnp.asarray(x)))
    inc = chorus_inc_grid(curve_grid(rate_c, 0, n, tickf), 44100)
    P, _ = chorus_phase_grid(inc, 0)
    depth = curve_grid(depth_c, 0, n, tickf).astype(np.float32)
    want = gfx.chorus_swept(x, 2, 44100, P, depth, 0.012, 3, 0.5, 0.9)
    d = np.abs(got.astype(np.int64) - want.astype(np.int64)).max()
    assert d <= 2, d
    # constant-rate curve == static chorus (identical integer phases)
    proc_c = StreamingChorus(44100, 2, rate=1.5, depth=0.002, delay=0.012,
                             voices=3, wet=0.5, dry=0.9,
                             rate_curve=[(0.0, 1.5)], tickf=tickf)
    proc_s = StreamingChorus(44100, 2, rate=1.5, depth=0.002, delay=0.012,
                             voices=3, wet=0.5, dry=0.9)
    yc = np.asarray(proc_c.process(jnp.asarray(x)))
    ys = np.asarray(proc_s.process(jnp.asarray(x)))
    np.testing.assert_array_equal(yc, ys)


@pytest.mark.parametrize("chunk", [1000, 4096])
def test_fx_reverb_roomsize_automation_streaming(chunk):
    song = bright_song()
    song.add_fx("reverb", roomsize=0.5, wet=0.35, dry=0.6, tail=0.25)
    song.add_automation("fx.reverb.roomsize", "0:0.1 16:0.95")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    assert len(got) == len(off)
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 8, d


def test_fx_reverb_roomsize_automation_vs_goldref():
    """Device roomsize-swept reverb vs the oracle's per-sample feedback
    network (goldref reverb(feedback_curve=)) — the reverb budget
    (<= 4 LSB) applies."""
    import goldref.effects as gfx
    from synthesizer_tpu.effects import StreamingReverb
    from synthesizer_tpu.ops.coeffs import curve_grid, reverb_feedback_grid
    import jax.numpy as jnp
    rng = np.random.default_rng(0xF00F)
    n = 4000
    x = (rng.integers(-20000, 20000, size=(n, 2))).astype(np.int16)
    tickf = 44100 / 8.0
    room_c = [(0.0, 0.2), (8.0, 0.9)]
    proc = StreamingReverb(44100, 2, roomsize=0.5, damping=0.4, wet=0.3,
                           dry=0.7, tail=0.0, roomsize_curve=room_c,
                           tickf=tickf)
    got = np.asarray(proc.process(jnp.asarray(x)))
    fb = reverb_feedback_grid(curve_grid(room_c, 0, n, tickf))
    want = gfx.reverb(x, 2, 44100, roomsize=0.5, damping=0.4, wet=0.3,
                      dry=0.7, tail_frames=0, feedback_curve=fb)
    d = np.abs(got.astype(np.int64) - want.astype(np.int64)).max()
    assert d <= 4, d
    # a bigger room rings longer: constant high/low roomsize CURVES
    # (still the automation machinery) — after ~0.3 s of silence the
    # fb=0.952 room carries far more energy than the fb=0.714 one.  The
    # FIRST tail chunk is dominated by immediate echoes in both rooms,
    # so compare a later window, by RMS.
    def ring(room):
        p = StreamingReverb(44100, 2, roomsize=0.5, damping=0.4, wet=0.3,
                            dry=0.7, tail=0.0,
                            roomsize_curve=[(0.0, room)], tickf=tickf)
        np.asarray(p.process(jnp.asarray(x)))        # programme
        zs = np.zeros((4000, 2), np.int16)
        for _ in range(3):
            tail = np.asarray(p.process(jnp.asarray(zs)))
        return np.sqrt(np.mean(np.square(tail.astype(np.float64))))

    assert ring(0.9) > 4 * max(ring(0.05), 1.0)


def test_recurrence_automation_seek_alignment():
    """Seeking with recurrence-internal curves: the host coefficient
    mirrors (chorus phase carry, grid positions) replay to start_frame, so
    a seeked stream matches the offline slice after effect state warms up
    (state starts cold at the seek, like every seek-with-fx)."""
    song = bright_song()
    song.add_fx("chorus", rate=0.8, depth=0.002, delay=0.015, wet=0.5)
    song.add_automation("fx.chorus.rate", "0:0.2 16:6.0")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    k = 9000
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=1024,
                                                      start_frame=k)])
    # the chorus history is cold for its first window (~delay+depth
    # seconds); past the warmup the automated LFO must be phase-aligned
    warm = int(0.02 * SR)
    d = np.abs(got[warm:].astype(np.int64)
               - off[k + warm:k + len(got)].astype(np.int64)).max()
    assert d <= 2, d


def test_recurrence_automation_validation():
    song = bright_song()
    with pytest.raises(ValueError, match="no compress"):
        song.add_automation("fx.compress.attack", "0:0.01")
    song.add_fx("reverb", roomsize=0.5)
    with pytest.raises(ValueError, match="roomsize"):
        song.add_automation("fx.reverb.roomsize", "0:1.5")
    song.add_automation("fx.reverb.roomsize", "0:0.2 8:0.9")   # valid


# ---------------------------------------------------------------------------
# fx.eq band-gain automation (round-3 continuation): gains enter the RBJ
# b/a coefficients themselves, so the curves ride per-frame coefficient
# grids through the shared companion scan (the recurrence-internal
# pattern).  Spec: goldref.effects.eq_swept.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("chunk", [1000, 4096])
def test_fx_eq_automation_streaming(chunk):
    song = bright_song()
    song.add_fx("eq", mid_db=5.0, mid_freq=1200.0, mid_q=1.0,
                high_db=3.0, high_freq=5000.0)
    song.add_automation("fx.eq.mid_db", "0:-12 16:9")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    assert len(got) == len(off)
    # two scans (swept mid + static high shelf), each within the biquad
    # chunk-regrouping budget
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 8, d


def test_fx_eq_automation_vs_goldref():
    """Device swept EQ band vs the sequential-f64 oracle driven by the
    SAME host coefficient grids (goldref.effects.eq_swept); a CONSTANT
    gain curve reproduces the static band within 1 LSB (identical f32
    coefficients, but vector-vs-scalar coefficient operands let LLVM
    contract the feed-forward FMA chain differently — the documented
    contraction class)."""
    import goldref.effects as gfx
    import jax.numpy as jnp
    from synthesizer_tpu.effects import StreamingBiquad, SweptEQBand
    from synthesizer_tpu.ops.coeffs import curve_grid
    rng = np.random.default_rng(0xE0B0)
    n = 6000
    x = (rng.integers(-24000, 24000, size=(n, 2))).astype(np.int16)
    tickf = 44100 / 8.0
    gain_c = [(0.0, -10.0), (8.0, 8.0)]
    proc = SweptEQBand(44100, 2, "peaking", 1500.0, 1.2, gain_c, tickf)
    got = np.asarray(proc.process(jnp.asarray(x)))
    g = curve_grid(gain_c, 0, n, tickf)
    # this band routes through the compensated float-float scan
    # (ops.coeffs.wants_ff_scan), so the oracle consumes the f64 grids
    assert proc._ff
    want = gfx.eq_swept(x, 2, 44100, "peaking", 1500.0, 1.2, g,
                        grids_dtype=np.float64)
    d = np.abs(got.astype(np.int64) - want.astype(np.int64)).max()
    assert d <= 2, d
    # constant curve == static band
    pc = SweptEQBand(44100, 2, "highshelf", 5000.0, 0.7071,
                     [(0.0, 4.0)], tickf)
    ps = StreamingBiquad(44100, 2, "highshelf", 5000.0, 0.7071,
                         gain_db=4.0)
    yc = np.asarray(pc.process(jnp.asarray(x)))
    ys = np.asarray(ps.process(jnp.asarray(x)))
    dc = np.abs(yc.astype(np.int64) - ys.astype(np.int64)).max()
    assert dc <= 1, dc


def test_fx_eq_automation_brightens_over_time():
    """high_db riding -15 -> +9 dB: the late part of the song carries
    more high-frequency energy than the early part, relative to the
    un-automated mix."""
    base = bright_song()
    base.add_fx("eq", high_db=1.0, high_freq=3000.0)
    b = base.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    song = bright_song()
    song.add_fx("eq", high_db=1.0, high_freq=3000.0)
    song.add_automation("fx.eq.high_db", "0:-15 16:9")
    out = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    n = min(len(b), len(out))

    def hf_energy(x):
        s = x.astype(np.float64).mean(axis=1)
        spec = np.abs(np.fft.rfft(s)) ** 2
        freqs = np.fft.rfftfreq(len(s), 1.0 / SR)
        return spec[freqs > 3000.0].sum()

    head = hf_energy(out[: n // 4]) / max(hf_energy(b[: n // 4]), 1e-12)
    tail = hf_energy(out[3 * n // 4: n]) \
        / max(hf_energy(b[3 * n // 4: n]), 1e-12)
    assert head < 0.5, head       # cut region: well below the base
    assert tail > 1.2 * head, (head, tail)


def test_fx_eq_automation_validation():
    song = bright_song()
    with pytest.raises(ValueError, match="no eq"):
        song.add_automation("fx.eq.mid_db", "0:-6 16:6")
    song.add_fx("eq", mid_db=3.0)
    song.add_automation("fx.eq.mid_db", "0:-6 16:6")     # valid (neg ok)
    with pytest.raises(ValueError, match="not understood"):
        song.add_automation("fx.eq.mid_freq", "0:500 16:2000")


def test_fx_eq_automation_ini_roundtrip(tmp_path):
    ini = tmp_path / "song.ini"
    ini.write_text("""
[song]
bpm = 240
ticks = 4
patterns = a
[synth.saw]
wave = sawtooth_bl
amplitude = 0.4
[pattern.a]
saw = C3 - - - C3 - - -
[fx]
eq = low_db=2 mid_db=4 mid_freq=1100 high_db=1
[automation]
fx.eq.low_db = 0:-8 8:6
fx.eq.high_db = 0:0 8:5
""")
    song = Song.from_ini(str(ini))
    assert song.automation["fx.eq.low_db"] == [(0.0, -8.0), (8.0, 6.0)]
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=1500)])
    assert len(got) == len(off)
    # low shelf at 120 Hz: poles near z=1, the derived-conditioning-model
    # budget dominates (ROADMAP "Parametric EQ" note)
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 64, d


def test_fx_eq_automation_sharded():
    """fx.eq curves under mesh=: the master chain runs on the gathered
    bus after the psums, so the swept EQ applies identically — the only
    divergence is the synth bus's f32-psum summation order (≤1 LSB)
    amplified through the band (≤ a few LSB end to end)."""
    from synthesizer_tpu.parallel.mesh import voice_mesh
    song = bright_song()
    song.add_fx("eq", mid_db=3.0, mid_freq=1200.0, high_db=2.0)
    song.add_automation("fx.eq.mid_db", "0:-9 16:6")
    single = song.mix(normalize=False).get_frame_array()
    sharded = song.mix(normalize=False,
                       mesh=voice_mesh(8)).get_frame_array()
    d = np.abs(single.astype(np.int64) - sharded.astype(np.int64)).max()
    assert d <= 4, d


def test_fx_eq_lowshelf_automation_ff_scan():
    """A low-shelf gain curve routes the band through the compensated
    float-float scan (the 120 Hz shelf was the scan-conditioning worst
    case at ~35-220 LSB); with f64-split coefficient grids it tracks the
    sequential-f64 oracle to <= 2 LSB."""
    import goldref.effects as gfx
    import jax.numpy as jnp
    from synthesizer_tpu.effects import SweptEQBand
    from synthesizer_tpu.ops.coeffs import curve_grid
    rng = np.random.default_rng(0x10F5)
    n = 9000
    x = rng.integers(-28000, 28000, size=(n, 2)).astype(np.int16)
    tickf = 44100 / 8.0
    gc = [(0.0, -8.0), (8.0, 8.0)]
    band = SweptEQBand(44100, 2, "lowshelf", 120.0, 0.7071, gc, tickf)
    assert band._ff
    got = np.asarray(band.process(jnp.asarray(x)))
    want = gfx.eq_swept(x, 2, 44100, "lowshelf", 120.0, 0.7071,
                        curve_grid(gc, 0, n, tickf),
                        grids_dtype=np.float64)
    d = np.abs(got.astype(np.int64) - want.astype(np.int64)).max()
    assert d <= 2, d


def test_fx_filter_cutoff_shelf_kind_vs_goldref():
    """fx.filter.cutoff on a gain kind: host frequency-varying grids
    (the full RBJ set including gain_db) vs the sequential-f64 oracle;
    a low-shelf corner sweep routes through the float-float scan."""
    import goldref.effects as gfx
    import jax.numpy as jnp
    from synthesizer_tpu.effects import SweptGainKindBiquad
    from synthesizer_tpu.ops.coeffs import curve_grid
    rng = np.random.default_rng(0x5EEB)
    n = 9000
    x = rng.integers(-26000, 26000, size=(n, 2)).astype(np.int16)
    tickf = 44100 / 8.0
    fc = [(0.0, 80.0), (8.0, 500.0)]
    proc = SweptGainKindBiquad(44100, 2, "lowshelf", 0.7071, 6.0, fc,
                               tickf)
    assert proc._ff
    got = np.asarray(proc.process(jnp.asarray(x)))
    f = np.clip(curve_grid(fc, 0, n, tickf), 10.0, 44100 * 0.49)
    want = gfx.filter_swept_freq(x, 2, 44100, "lowshelf", 0.7071, 6.0,
                                 f, grids_dtype=np.float64)
    d = np.abs(got.astype(np.int64) - want.astype(np.int64)).max()
    assert d <= 2, d
    # constant curve == the static filter (same routing, same coeffs)
    from synthesizer_tpu.effects import StreamingBiquad
    pc = SweptGainKindBiquad(44100, 2, "highshelf", 0.7071, 4.0,
                             [(0.0, 5000.0)], tickf)
    ps = StreamingBiquad(44100, 2, "highshelf", 5000.0, 0.7071,
                         gain_db=4.0)
    yc = np.asarray(pc.process(jnp.asarray(x)))
    ys = np.asarray(ps.process(jnp.asarray(x)))
    dc = np.abs(yc.astype(np.int64) - ys.astype(np.int64)).max()
    assert dc <= 1, dc


@pytest.mark.parametrize("chunk", [1000, 4096])
def test_fx_filter_cutoff_shelf_streaming_equals_offline(chunk):
    song = bright_song()
    song.add_fx("filter", kind="highshelf", cutoff=2000.0, gain_db=-9.0)
    song.add_automation("fx.filter.cutoff", "0:400 16:8000")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    assert len(got) == len(off)
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 8, d


# ---------------------------------------------------------------------------
# Round-3 continuation keys: fx.echo.*, fx.width.amount,
# fx.limiter.ceiling_db, fx.phaser.wet/.dry
# ---------------------------------------------------------------------------

def test_new_fx_automation_validation():
    song = bright_song()
    with pytest.raises(ValueError, match="no echo"):
        song.add_automation("fx.echo.wet", "0:0.5")
    song.add_fx("echo", delay=0.1, feedback=0.3)
    song.add_automation("fx.echo.wet", "0:0.1 16:0.6")
    with pytest.raises(ValueError, match="feedback"):
        song.add_automation("fx.echo.feedback", "0:0.99")
    song.add_fx("width", amount=1.0)
    with pytest.raises(ValueError, match="width amount"):
        song.add_automation("fx.width.amount", "0:5.0")
    song.add_fx("limiter", ceiling_db=-1.0)
    with pytest.raises(ValueError, match="ceiling"):
        song.add_automation("fx.limiter.ceiling_db", "0:2.0")
    song.add_automation("fx.limiter.ceiling_db", "0:-1 16:-12")
    with pytest.raises(ValueError, match="release"):
        song.add_automation("fx.limiter.release", "0:0.0")
    song.add_automation("fx.limiter.release", "0:0.01 16:0.4")
    song.add_fx("phaser", rate=1.0)
    with pytest.raises(ValueError, match="rate"):
        song.add_automation("fx.phaser.rate", "0:25.0")
    with pytest.raises(ValueError, match="depth"):
        song.add_automation("fx.phaser.depth", "0:1.5")
    song.add_automation("fx.phaser.rate", "0:0.2 16:5.0")
    song.add_automation("fx.phaser.depth", "0:0.1 16:1.0")


def test_echo_automation_streaming_equals_offline():
    song = bright_song()
    song.add_fx("echo", delay=0.09, feedback=0.4, wet=0.3)
    song.add_automation("fx.echo.feedback", "0:0.1 16:0.8")
    song.add_automation("fx.echo.wet", "0:0.6 16:0.1")
    song.add_automation("fx.echo.dry", "0:1.0 16:0.7")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    for cf in (977, 4096):
        got = np.concatenate([c.get_frame_array()
                              for c in song.mix_generator(chunk_frames=cf)])
        assert got.shape == off.shape
        d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
        assert d <= 1, (cf, d)   # host grids both sides; FMA class only


def test_echo_feedback_curve_audibly_grows_the_train():
    song = bright_song()
    # explicit tail so both renders share a length; compare the LATE tail
    # where the static fb=0.1 train (k >= 8 echoes) has fully decayed
    song.add_fx("echo", delay=0.05, feedback=0.1, wet=0.8, tail=0.5)
    base = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    song.add_automation("fx.echo.feedback", "0:0.9")
    hot = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    assert hot.shape == base.shape
    seg = slice(len(base) - int(0.1 * SR), len(base))
    assert np.abs(hot[seg]).max() > 4 * max(np.abs(base[seg]).max(), 1)


def test_width_automation_streaming_equals_offline():
    song = bright_song()
    song.synths["saw"].pan = 0.7          # give the sides real energy
    song.add_fx("width", amount=1.0)
    song.add_automation("fx.width.amount", "0:0.0 16:2.0")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=1209)])
    assert got.shape == off.shape
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 1, d
    # the sweep audibly widens over the song: the side (L-R) energy of
    # the last fifth dwarfs the first fifth's
    side = off[:, 0].astype(np.float64) - off[:, 1].astype(np.float64)
    n5 = len(side) // 5
    rms = lambda x: np.sqrt(np.mean(x * x) + 1e-9)
    assert rms(side[-n5:]) > 4 * rms(side[:n5])


def test_limiter_ceiling_automation():
    song = bright_song()
    song.synths["saw"].amplitude = 0.9
    song.add_fx("limiter", ceiling_db=-1.0, lookahead=0.003)
    song.add_automation("fx.limiter.ceiling_db", "0:-1 16:-18")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=1536)])
    assert got.shape == off.shape
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 2, d
    # the ramped ceiling audibly ducks the end vs the head: the last
    # 0.05 s sits past tick 15.2 where the curve has reached <= -17 dB
    from synthesizer_tpu.ops.coeffs import limiter_ceiling
    tail_peak = np.abs(off[-int(0.05 * SR):].astype(np.int64)).max()
    assert tail_peak <= limiter_ceiling(-17.0, 2)
    head_peak = np.abs(off[: int(0.2 * SR)].astype(np.int64)).max()
    assert head_peak > 2 * tail_peak


def test_phaser_wet_automation_streaming_equals_offline():
    song = bright_song()
    song.add_fx("phaser", rate=1.2, depth=1.0, wet=0.5)
    song.add_automation("fx.phaser.wet", "0:0.0 16:0.9")
    song.add_automation("fx.phaser.dry", "0:1.0 16:0.6")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=977)])
    assert got.shape == off.shape
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 10, d     # per-stage scan regroup across chunk boundaries


@pytest.mark.parametrize("chunk", [850, 2048])
def test_fx_phaser_rate_depth_automation_streaming(chunk):
    song = bright_song()
    song.add_fx("phaser", rate=0.8, depth=0.6, stages=3, wet=0.6)
    song.add_automation("fx.phaser.rate", "0:0.2 16:6.0")
    song.add_automation("fx.phaser.depth", "0:0.2 16:1.0")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    assert got.shape == off.shape
    # the phase mirror is integer math and the grids are host-derived at
    # absolute frames: only per-stage scan regrouping differs per chunk
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 8, d      # 2 + 2*stages


def test_fx_phaser_rate_automation_vs_goldref():
    """Device swept phaser vs goldref.effects.phaser with the same
    cumulative phase / depth grids (<= 2+2*stages LSB, the static
    budget); a CONSTANT rate curve reproduces the static phaser exactly
    (P_n == n*inc by integer math)."""
    import goldref.effects as gfx
    from synthesizer_tpu.effects import StreamingPhaser
    from synthesizer_tpu.ops.coeffs import (chorus_inc_grid,
                                            chorus_phase_grid, curve_grid)
    import jax.numpy as jnp
    rng = np.random.default_rng(0xFA5E)
    n = 5000
    x = (rng.integers(-20000, 20000, size=(n, 2))).astype(np.int16)
    tickf = 44100 / 8.0
    rate_c = [(0.0, 0.3), (8.0, 5.0)]
    depth_c = [(0.0, 0.2), (8.0, 1.0)]
    kw = dict(rate=0.5, depth=1.0, min_freq=300.0, max_freq=3000.0,
              stages=3, q=0.7071, wet=0.6, dry=0.9)
    proc = StreamingPhaser(44100, 2, rate_curve=rate_c,
                           depth_curve=depth_c, tickf=tickf, **kw)
    got = np.asarray(proc.process(jnp.asarray(x)))
    inc = chorus_inc_grid(curve_grid(rate_c, 0, n, tickf), 44100)
    P, _ = chorus_phase_grid(inc, 0)
    depth = curve_grid(depth_c, 0, n, tickf)
    want = gfx.phaser(x, 2, 44100, P=P, depth_curve=depth, **kw)
    d = np.abs(got.astype(np.int64) - want.astype(np.int64)).max()
    assert d <= 8, d
    # constant-rate/depth curves == static phaser (identical grids)
    proc_c = StreamingPhaser(44100, 2, rate_curve=[(0.0, 1.5)],
                             depth_curve=[(0.0, 0.8)], tickf=tickf,
                             **{**kw, "rate": 1.5, "depth": 0.8})
    proc_s = StreamingPhaser(44100, 2, **{**kw, "rate": 1.5,
                                          "depth": 0.8})
    yc = np.asarray(proc_c.process(jnp.asarray(x)))
    ys = np.asarray(proc_s.process(jnp.asarray(x)))
    np.testing.assert_array_equal(yc, ys)


@pytest.mark.parametrize("chunk", [900, 3000])
def test_fx_limiter_release_automation_streaming(chunk):
    song = bright_song()
    song.synths["saw"].amplitude = 0.9
    song.add_fx("limiter", ceiling_db=-6.0, lookahead=0.003)
    song.add_automation("fx.limiter.release", "0:0.005 16:0.5")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    assert got.shape == off.shape
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 2, d


def test_fx_limiter_release_automation_vs_goldref():
    """Device swept-release limiter vs goldref.effects.limiter with the
    same per-frame release grid (the decaying-max scan runs per-element
    decay coefficients)."""
    import goldref.effects as gfx
    from synthesizer_tpu.effects import StreamingLimiter
    from synthesizer_tpu.ops.coeffs import curve_grid
    import jax.numpy as jnp
    rng = np.random.default_rng(0x11A1)
    n = 4000
    x = (rng.integers(-32000, 32000, size=(n, 2))).astype(np.int16)
    tickf = 44100 / 8.0
    rel_c = [(0.0, 0.004), (8.0, 0.4)]
    L = max(1, int(0.003 * 44100))
    proc = StreamingLimiter(44100, 2, ceiling_db=-6.0, lookahead=0.003,
                            release_curve=rel_c, tickf=tickf)
    fed = np.concatenate([x, np.zeros((L, 2), np.int16)])
    got = np.asarray(proc.process(jnp.asarray(fed)))
    assert got.shape == (n, 2)
    rel = curve_grid(rel_c, 0, n, tickf)
    want = gfx.limiter(x, 2, 44100, ceiling_db=-6.0, release=rel,
                       lookahead=0.003)
    d = np.abs(got.astype(np.int64) - want.astype(np.int64)).max()
    assert d <= 2, d


# ---------------------------------------------------------------------------
# Per-track fx automation (fx.TRACK.EFFECT.KNOB)
# ---------------------------------------------------------------------------

def _track_fx_song():
    from synthesizer_tpu.sequencer import SynthDef
    song = Song()
    song.bpm = 240
    song.ticks = 4
    song.add_synth("saw", SynthDef(wave="sawtooth_bl", amplitude=0.5,
                                   attack=0.002, release=0.05))
    ws = WaveSynth(samplerate=SR, samplewidth=2)
    song.add_instrument("kick", ws.sine(60, 0.1, amplitude=0.8)
                        .fadeout(0.08).stereo())
    song.add_pattern("a", {"saw": "C3 - - - C3 - - - C3 - - - C3 - - -",
                           "kick": "x... x... x... x..."})
    song.pattern_sequence = ["a"]
    return song


@pytest.mark.parametrize("chunk", [977, 3001])
def test_track_fx_automation_streaming_equals_offline(chunk):
    song = _track_fx_song()
    song.add_track_fx("saw", [("filter", "kind=lowpass cutoff=2000")])
    song.add_track_fx("kick", [("echo", "delay=0.06 feedback=0.4 wet=0.4")],
                      bus=True)
    song.add_automation("fx.saw.filter.cutoff", "0:300 16:8000")
    song.add_automation("fx.kick.echo.wet", "0:0.0 16:0.7")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    assert got.shape == off.shape
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 12, d
    # the swept track audibly brightens
    def hf(seg):
        f = np.abs(np.fft.rfft(seg[:, 0].astype(np.float64)))
        fr = np.fft.rfftfreq(len(seg), 1 / SR)
        return f[fr > 3000].sum() / max(f.sum(), 1e-9)
    n = len(off) // 4
    assert hf(off[-n:]) > 2 * hf(off[:n])


def test_track_fx_automation_from_ini_prescan(tmp_path):
    """A drum [fx.NAME] chain whose knobs appear in [automation] routes
    to a mix-time bus (the pre-scan), not the baked WAV — the curve is
    audible and streaming == offline."""
    from synthesizer_tpu import WaveSynth
    ws = WaveSynth(samplerate=SR, samplewidth=2)
    ws.sine(60, 0.1, amplitude=0.8).fadeout(0.08).stereo() \
        .write_wav(str(tmp_path / "kick.wav"))
    ini = tmp_path / "t.ini"
    ini.write_text("""
[song]
bpm = 240
ticks = 4
patterns = a

[paths]
samples = .

[instruments]
kick = kick.wav

[pattern.a]
kick = x... x... x... x...

[fx.kick]
echo = delay=0.06 feedback=0.4 wet=0.1

[automation]
fx.kick.echo.wet = 0:0.0 16:0.7
""")
    song = Song.from_ini(str(ini))
    assert "kick" in song.drum_fx_bus          # bus route, not baked
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=1470)])
    assert len(got) == len(off)
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 2, d
    # the echo send rides up: the echo-only window after the LAST hit
    # (wet ~0.6) carries far more energy than after the FIRST (wet ~0).
    # Kick = 0.1 s (4410 fr), delay = 0.06 s (2646 fr): frames
    # [5292, 7000) past a hit hold only echo copies, no dry kick.
    beat = int(60.0 / 240 * SR)
    first, last = 0, 3 * beat                  # hits at ticks 0 and 12
    w = slice(5292, 7000)
    r_first = float(np.sqrt(np.mean(
        off[first + w.start:first + w.stop].astype(np.float64) ** 2)))
    r_last = float(np.sqrt(np.mean(
        off[last + w.start:last + w.stop].astype(np.float64) ** 2)))
    assert r_last > 3 * max(r_first, 1.0), (r_first, r_last)


def test_track_fx_automation_validation():
    song = _track_fx_song()
    song.add_track_fx("saw", [("filter", "kind=lowpass cutoff=2000")])
    with pytest.raises(ValueError, match="no echo"):
        song.add_automation("fx.saw.echo.wet", "0:0.5")
    with pytest.raises(ValueError, match="no \\[fx.ghost\\]"):
        song.add_automation("fx.ghost.filter.cutoff", "0:500")
    # a BAKED drum chain cannot be automated after the fact
    song.add_track_fx("kick", [("filter", "kind=lowpass cutoff=900")])
    with pytest.raises(ValueError, match="baked"):
        song.add_automation("fx.kick.filter.cutoff", "0:300 8:4000")
    # range checks apply to track-scoped knobs too
    song.add_track_fx("saw", [("filter", "kind=lowpass cutoff=2000"),
                              ("echo", "delay=0.05")])
    with pytest.raises(ValueError, match="feedback"):
        song.add_automation("fx.saw.echo.feedback", "0:0.99")


def test_fx_compress_knee_automation():
    song = bright_song()
    song.synths["saw"].amplitude = 0.8
    song.add_fx("compress", threshold_db=-18.0, ratio=6.0, knee_db=6.0)
    with pytest.raises(ValueError, match="knee"):
        song.add_automation("fx.compress.knee_db", "0:0.0")
    song.add_automation("fx.compress.knee_db", "0:0.5 16:18")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=977)])
    assert got.shape == off.shape
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 2, d


@pytest.mark.parametrize("chunk", [977, 4096])
def test_fx_tremolo_autopan_automation(chunk):
    """LFO-gain fx automation (rate via the host-mirrored cumulative
    phase, depth as per-frame grids): streaming == offline bit-exactly
    (the grids are identical host arrays on both paths) at any chunk
    size, seek included."""
    song = bright_song()
    song.add_fx("tremolo", rate_beats=1.0, depth=0.6)
    song.add_fx("autopan", rate=0.8, depth=0.8)
    song.add_automation("fx.tremolo.depth", "0:0.1 16:0.9")
    song.add_automation("fx.tremolo.rate", "0:1.0 16:8.0")
    song.add_automation("fx.autopan.rate", "0:0.3 16:4.0")
    song.add_automation("fx.autopan.depth", "0:0.2 16:1.0")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    assert got.shape == off.shape
    np.testing.assert_array_equal(got, off)
    k = 9431
    got2 = np.concatenate([c.get_frame_array() for c in
                           song.mix_generator(chunk_frames=chunk,
                                              start_frame=k)])
    np.testing.assert_array_equal(got2, off[k:k + len(got2)])
    with pytest.raises(ValueError, match="rate"):
        song.add_automation("fx.tremolo.rate", "0:30.0")
    with pytest.raises(ValueError, match="depth"):
        song.add_automation("fx.autopan.depth", "0:1.5")
