"""Pitched sampler tracks ([sampler.NAME] — tracker/FL-style melodic WAV
playback): batched interpolating gathers vs a numpy spec twin, rate-1
bit-exactness vs the source, streaming == offline, seeks, automation,
mesh sharding, and the ini surface.
"""

import numpy as np
import pytest

from synthesizer_tpu import WaveSynth
from synthesizer_tpu.sequencer import Song
from synthesizer_tpu.synth import note_freq

SR = 44100
C4 = 261.6255653005986


def guitar_sample(dur=0.3, seed=3):
    ws = WaveSynth(samplerate=SR, samplewidth=2)
    return ws.pluck(C4, dur, amplitude=0.6, seed=seed) \
        .fadeout(min(0.05, dur / 2)).stereo()


def make_song(pattern="C4 .. E4 .. G4 .. C5 C3", base_note="C4", **auto):
    song = Song()
    song.bpm = 240
    song.ticks = 4
    song.add_sampler("gtr", guitar_sample(), base_note=base_note)
    song.add_pattern("a", {"gtr": pattern})
    song.pattern_sequence = ["a"]
    for key, curve in auto.items():
        song.add_automation(key.replace("__", "."), curve)
    return song


def pitched_oracle(song: Song, total: int) -> np.ndarray:
    """Numpy twin of the pitched-playback spec: pos = n_rel * rate in
    f32, linear interp, per-hit rint(gain * value), int64 sum."""
    (bank, lens, idx, starts, rates, gains, loopf,
     loopu) = song.compile_pitched_hits()
    C = song.nchannels
    bank = bank[:, :, :C]       # the device bank is pair-packed [.., 2C]
    out = np.zeros((total, C), np.int64)
    for h in range(len(idx)):
        wav = bank[idx[h], : lens[idx[h]]].astype(np.float32)
        L = int(lens[idx[h]])
        n_rel = np.arange(total, dtype=np.int64) - starts[h]
        n_rel_f = n_rel.astype(np.float32)
        pos = n_rel_f * np.float32(rates[h])
        flag, ls, lp, gate_total, fade_r = (np.float32(v) for v in loopf[h])
        env = np.float32(1.0)
        if flag > 0:
            inc, p0 = (int(v) for v in loopu[h])
            phase = ((p0 + n_rel.astype(np.uint64) * inc)
                     & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            posL = ls + (phase.astype(np.float32)
                         * np.float32(2.0 ** -32) * lp)
            pos = np.where(pos > ls + lp, posL, pos).astype(np.float32)
            pos = np.minimum(pos, np.float32(L - 1)).astype(np.float32)
            env = np.clip((gate_total - n_rel_f) * fade_r,
                          np.float32(0), np.float32(1)).astype(np.float32)
            inr = (n_rel >= 0) & (n_rel_f < gate_total)
        else:
            inr = (n_rel >= 0) & (pos <= np.float32(L - 1))
        i = np.clip(pos.astype(np.int32), 0, max(L - 2, 0))
        frac = (pos - i.astype(np.float32)).astype(np.float32)
        v0 = wav[i]
        v1 = wav[np.minimum(i + 1, L - 1)]
        vals = v0 + (v1 - v0) * frac[:, None]
        # same multiply order as the device: (gain * env) first
        ge = gains[h][None, :] * (env[:, None] if np.ndim(env) else env)
        vals = np.rint(vals * ge).astype(np.int64)
        out += np.where(inr[:, None], vals, 0)
    return out


def test_pitched_matches_numpy_twin():
    song = make_song()
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    want = np.clip(pitched_oracle(song, len(off)), -32768, 32767)
    np.testing.assert_array_equal(off.astype(np.int64), want)


def test_base_note_is_bit_exact_passthrough():
    """rate == 1.0: f32 pos is integral, interp collapses to the source
    sample bit-for-bit (including the final frame)."""
    song = make_song(pattern="C4 .. .. .. .. .. .. ..")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    src = song.samplers["gtr"].sample.get_frame_array()
    np.testing.assert_array_equal(off[:len(src)], src)
    assert np.abs(off[len(src):]).max() == 0


def test_octave_pitching_scales_length_and_pitch():
    src = guitar_sample()
    n = src.nframes
    up = make_song(pattern="C5 .. .. .. .. .. .. ..") \
        .mix(normalize=False, tail_seconds=0.0).get_frame_array()
    dn = make_song(pattern="C3 - - - - - - - - - - - - - - -") \
        .mix(normalize=False, tail_seconds=0.0).get_frame_array()
    nz_up = np.nonzero(np.abs(up).max(1))[0][-1] + 1
    nz_dn = np.nonzero(np.abs(dn).max(1))[0][-1] + 1
    assert abs(nz_up - n // 2) <= 4
    assert abs(nz_dn - n * 2) <= 4
    # spectral check with a pure-tone sample: a C5 note on a 440 Hz
    # source plays the tone at 880 Hz
    ws = WaveSynth(samplerate=SR, samplewidth=2)
    tone = ws.sine(440.0, 0.3, amplitude=0.6).stereo()
    song = Song()
    song.bpm = 240
    song.ticks = 4
    song.add_sampler("t", tone, base_note="C4")
    song.add_pattern("a", {"t": "C5 .. .. .. .. .. .. .."})
    song.pattern_sequence = ["a"]
    out = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()

    def peak_freq(x, nfft=8192):
        w = np.abs(np.fft.rfft(x[:nfft, 0].astype(np.float64), nfft))
        w[:20] = 0
        return np.argmax(w) * SR / nfft

    assert peak_freq(out) == pytest.approx(880.0, rel=0.02)


@pytest.mark.parametrize("chunk", [977, 4096])
def test_streaming_equals_offline(chunk):
    song = make_song()
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    np.testing.assert_array_equal(got, off[:len(got)])


def test_seek_bit_exact():
    song = make_song()
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    seek = 7001
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=2048,
                                                      start_frame=seek)])
    np.testing.assert_array_equal(got, off[seek:seek + len(got)])


def test_sampler_with_drums_and_synths():
    ws = WaveSynth(samplerate=SR, samplewidth=2)
    from synthesizer_tpu.sequencer import SynthDef
    song = make_song()
    song.add_instrument("kick", ws.sine(60, 0.08, amplitude=0.5)
                        .fadeout(0.05).stereo())
    song.add_synth("lead", SynthDef(wave="sine", amplitude=0.2))
    song.patterns["a"]["kick"] = "x.x.x.x."
    song.patterns["a"]["lead"] = "C5 - .. .. E5 - .. .."
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=1470)])
    np.testing.assert_array_equal(got, off[:len(got)])


def test_sampler_automation_velocity_and_pan():
    song = make_song(pattern="C4 .. .. .. C4 .. .. ..",
                     track__gtr__volume="0:1 4:0.5",
                     track__gtr__pan="0:-1 4:1")
    bank, lens, idx, starts, rates, gains, _lf, _lu = \
        song.compile_pitched_hits()
    np.testing.assert_allclose(gains, [[1.0, 0.0], [0.0, 0.5]], atol=1e-6)
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    want = np.clip(pitched_oracle(song, len(off)), -32768, 32767)
    np.testing.assert_array_equal(off.astype(np.int64), want)
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=1000)])
    np.testing.assert_array_equal(got, off[:len(got)])


def test_sampler_sharded_bit_exact():
    from synthesizer_tpu.parallel.mesh import voice_mesh
    song = make_song()
    single = song.mix(normalize=False).get_frame_array()
    sharded = song.mix(normalize=False, mesh=voice_mesh(8)).get_frame_array()
    np.testing.assert_array_equal(single, sharded)
    # streaming under the mesh too
    got = np.concatenate([c.get_frame_array() for c in
                          song.mix_generator(chunk_frames=2048,
                                             mesh=voice_mesh(8))])
    np.testing.assert_array_equal(got, single[:len(got)])


def test_sampler_ini_roundtrip(tmp_path):
    guitar_sample().write_wav(str(tmp_path / "gtr.wav"))
    (tmp_path / "song.ini").write_text("""
[song]
bpm = 240
ticks = 4
patterns = a
[sampler.gtr]
file = gtr.wav
base_note = C4
[pattern.a]
gtr = C4 .. E4 G4 .. .. C5 ..
""")
    song = Song.from_ini(str(tmp_path / "song.ini"))
    assert "gtr" in song.samplers
    assert song.samplers["gtr"].base_freq == pytest.approx(note_freq("C4"))
    off = song.mix(normalize=False).get_frame_array()
    assert np.abs(off).max() > 1000
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=1470)])
    np.testing.assert_array_equal(got, off[:len(got)])


def test_sampler_duration_frames_covers_lowest_note():
    song = make_song(pattern="C2 .. .. .. .. .. .. ..")
    n = song.duration_frames()
    src_n = song.samplers["gtr"].sample.nframes
    # C2 plays at 1/4 speed: ~4x the source length
    assert n >= (src_n - 1) * 4
    out = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    assert len(out) >= n


def test_sampler_export_midi():
    song = make_song(pattern="C4 .. E4 .. .. .. .. ..")
    from synthesizer_tpu.midi import parse_midi
    notes = parse_midi(song.export_midi())
    keys = sorted(n.note for n in notes)
    assert keys == [60, 64]
    assert all(n.channel not in (9,) for n in notes)


# ---------------------------------------------------------------------------
# Sustain loops (loop_start/loop_end + tie-gated notes)
# ---------------------------------------------------------------------------

def looped_song(pattern, release=0.02):
    ws = WaveSynth(samplerate=SR, samplewidth=2)
    src = ws.sine(C4, 0.1, amplitude=0.5).stereo()
    song = Song()
    song.bpm = 120
    song.ticks = 4
    song.add_sampler("pad", src, base_note="C4", loop_start=0.02,
                     loop_end=0.08, release=release)
    song.add_pattern("a", {"pad": pattern})
    song.pattern_sequence = ["a"]
    return song


def test_loop_sustains_and_releases():
    """A held note loops far past the 0.1 s source, then fades out over
    `release` after its tie length."""
    song = looped_song("C4 - - - - - - - .. .. .. .. .. .. .. ..")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    gate = int(8 * song.tick_duration * SR)
    mid = off[int(0.5 * SR): int(0.6 * SR)]     # way past the source
    assert np.sqrt(np.mean(mid.astype(np.float64) ** 2)) > 2000
    after = off[gate + int(0.03 * SR):]
    assert len(after) == 0 or np.abs(after).max() == 0
    # matches the numpy twin within 1 LSB (looped positions have
    # arbitrary f32 fractions, so the interp multiply-add may contract
    # to FMA differently — the documented class; one-shot rate-1 reads
    # stay bit-exact)
    want = np.clip(pitched_oracle(song, len(off)), -32768, 32767)
    d = np.abs(off.astype(np.int64) - want)
    assert d.max() <= 1 and (d > 0).mean() < 0.02


def test_loop_pitch_follows_note():
    """A looped 440 Hz-content source played at E4 sustains the
    transposed tone (still periodic and louder than silence) for the
    whole hold."""
    song = looped_song("E4 - - - - - - - - - - - - - - -")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()

    def peak_freq(x, nfft=16384):
        w = np.abs(np.fft.rfft(x[:, 0].astype(np.float64), nfft))
        w[:20] = 0
        return np.argmax(w) * SR / nfft

    seg = off[int(0.8 * SR): int(1.4 * SR)]      # pure looped region
    f = peak_freq(seg)
    want = C4 * note_freq("E4") / note_freq("C4")
    assert f == pytest.approx(want, rel=0.03)


@pytest.mark.parametrize("chunk", [977, 4096])
def test_loop_streaming_and_seek_bit_exact(chunk):
    song = looped_song("C4 - - - E4 - - - .. .. G4 - - - - -")
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    np.testing.assert_array_equal(got, off[:len(got)])
    seek = 31337
    got2 = np.concatenate([c.get_frame_array() for c in song.mix_generator(
        chunk_frames=chunk, start_frame=seek)])
    np.testing.assert_array_equal(got2, off[seek:seek + len(got2)])


def test_loop_validation(tmp_path):
    ws = WaveSynth(samplerate=SR, samplewidth=2)
    src = ws.sine(C4, 0.1, amplitude=0.5).stereo()
    song = Song()
    with pytest.raises(ValueError, match="loop region"):
        song.add_sampler("bad", src, loop_start=0.05, loop_end=0.5)
    src.write_wav(str(tmp_path / "pad.wav"))
    (tmp_path / "s.ini").write_text("""
[song]
bpm = 120
ticks = 4
patterns = a
[sampler.pad]
file = pad.wav
base_note = C4
loop_start = 0.02
loop_end = 0.08
release = 0.03
[pattern.a]
pad = C4 - - - - - - -
""")
    song2 = Song.from_ini(str(tmp_path / "s.ini"))
    assert song2.samplers["pad"].looped
    assert song2.samplers["pad"].release == 0.03
    out = song2.mix(normalize=False).get_frame_array()
    assert np.abs(out[int(0.3 * SR): int(0.4 * SR)]).max() > 1000


def test_sampler_format_mismatch_normalized():
    """A sampler WAV at a different rate/width/channel count is CONVERTED
    to the song's normalization targets at load (like instruments), so
    mixed-format sources cannot silently bank at the wrong rate."""
    ws44 = WaveSynth(samplerate=44100, samplewidth=2)
    ws22 = WaveSynth(samplerate=22050, samplewidth=2)
    song = Song()
    song.add_sampler("a", ws44.sine(200, 0.05).stereo())
    song.add_sampler("b", ws22.sine(200, 0.1))        # mono, half rate
    sb = song.samplers["b"].sample
    assert sb.samplerate == 44100 and sb.nchannels == 2
    # and the converted sample still plays ~0.1 s of 200 Hz content
    assert abs(sb.nframes - int(0.1 * 44100)) <= 4


def test_loop_to_sample_end_no_extrapolation():
    """A loop region ending exactly at the sample's last frame must not
    extrapolate past wav[len-1] (review finding: frac > 1 at the seam)."""
    ws = WaveSynth(samplerate=SR, samplewidth=2)
    src = ws.sine(C4, 0.1, amplitude=0.5).stereo()
    song = Song()
    song.bpm = 120
    song.ticks = 4
    song.add_sampler("pad", src, base_note="C4", loop_start=0.02,
                     loop_end=0.1, release=0.02)   # le == sample end
    song.add_pattern("a", {"pad": "D4 - - - - - - - - - - - - - - -"})
    song.pattern_sequence = ["a"]
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    src_peak = np.abs(src.get_frame_array().astype(np.int64)).max()
    # no sample of the output may exceed the source peak (interp convex
    # combination; extrapolation would overshoot)
    assert np.abs(off.astype(np.int64)).max() <= src_peak + 1
    want = np.clip(pitched_oracle(song, len(off)), -32768, 32767)
    d = np.abs(off.astype(np.int64) - want)
    assert d.max() <= 1


def test_sampler_track_fx_offline_matches_solo():
    """[fx.SAMPLER] chains process the track's own pitched bus: a solo
    fx'd sampler song equals (quantize bus to int16, run the chain over
    the tail-padded length)."""
    from synthesizer_tpu.effects import run_fx_chain_ops
    from synthesizer_tpu import Sample
    import jax.numpy as jnp
    song = make_song()
    song.add_track_fx("gtr", [("filter", "kind=lowpass cutoff=1200 q=1.5"),
                              ("compress", "threshold_db=-20 ratio=4")])
    got = song.mix(normalize=False, tail_seconds=0.1).get_frame_array()
    base = make_song()
    total = len(got)
    bus = np.clip(pitched_oracle(base, total), -32768, 32767)         .astype(np.int16)
    ts = Sample.from_jax(jnp.asarray(bus), SR, 2)
    run_fx_chain_ops(ts, song.sampler_fx["gtr"], {})
    want = ts.get_frame_array()
    d = np.abs(got.astype(np.int64) - want.astype(np.int64)).max()
    assert d <= 4, d


@pytest.mark.parametrize("chunk", [1000, 4096])
def test_sampler_track_fx_streaming_equals_offline(chunk):
    song = make_song()
    song.add_track_fx("gtr", [("compress",
                               "threshold_db=-18 ratio=4"),
                              ("reverb",
                               "roomsize=0.6 wet=0.3 dry=0.7 tail=0.15")])
    # plus drums so the mixed paths compose
    ws = WaveSynth(samplerate=SR, samplewidth=2)
    song.add_instrument("kick", ws.sine(60, 0.08, amplitude=0.4)
                        .fadeout(0.05).stereo())
    song.patterns["a"]["kick"] = "x.x.x.x."
    off = song.mix(normalize=False, tail_seconds=0.0).get_frame_array()
    got = np.concatenate([c.get_frame_array()
                          for c in song.mix_generator(chunk_frames=chunk)])
    assert len(got) == len(off)
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 8, d


def test_sampler_track_fx_mesh_bit_exact():
    """Per-sampler-track fx under mesh= (round-3): the track's hit rows
    shard with a bit-exact int32 psum, so the bus — and therefore the
    chain output and the whole mix — is IDENTICAL to single-device."""
    from synthesizer_tpu.parallel.mesh import voice_mesh
    song = make_song()
    song.add_track_fx("gtr", [("compress", "threshold_db=-18"),
                              ("filter", "kind=highpass cutoff=200")])
    mesh = voice_mesh(8)
    single = song.mix(normalize=False).get_frame_array()
    sharded = song.mix(normalize=False, mesh=mesh).get_frame_array()
    np.testing.assert_array_equal(sharded, single)
    # streaming twin on the mesh == offline slice
    off = song.mix(normalize=False, tail_seconds=0.0,
                   mesh=mesh).get_frame_array()
    got = np.concatenate(
        [c.get_frame_array()
         for c in song.mix_generator(chunk_frames=1024, mesh=mesh)])
    assert len(got) == len(off)
    d = np.abs(got.astype(np.int64) - off.astype(np.int64)).max()
    assert d <= 8, d


def test_automation_curve_requires_tickf():
    from synthesizer_tpu.effects import StreamingCompressor, StreamingGate
    with pytest.raises(ValueError, match="tickf"):
        StreamingCompressor(SR, threshold_curve=[(0.0, -30.0)])
    with pytest.raises(ValueError, match="tickf"):
        StreamingGate(SR, threshold_curve=[(0.0, -50.0)])


def test_loop_region_and_name_collision_validation():
    ws = WaveSynth(samplerate=SR, samplewidth=2)
    src = ws.sine(C4, 0.1, amplitude=0.5).stereo()
    song = Song()
    with pytest.raises(ValueError, match="inverted or incomplete"):
        song.add_sampler("bad", src, loop_start=0.08, loop_end=0.02)
    with pytest.raises(ValueError, match="inverted or incomplete"):
        song.add_sampler("bad", src, loop_end=0.08)   # start unset
    from synthesizer_tpu.sequencer import SynthDef
    song.add_synth("lead", SynthDef())
    with pytest.raises(ValueError, match="already exists"):
        song.add_sampler("lead", src)
    song.add_sampler("gtr", src)
    with pytest.raises(ValueError, match="already exists"):
        song.add_synth("gtr", SynthDef())


def test_looped_sampler_midi_export_holds():
    song = looped_song("C4 - - - - - - - .. .. .. .. .. .. .. ..")
    from synthesizer_tpu.midi import parse_midi
    notes = parse_midi(song.export_midi())
    assert len(notes) == 1
    # the exported note holds for its tie length (8 ticks), not the
    # 0.1 s one-shot source duration
    assert notes[0].duration == pytest.approx(8 * song.tick_duration,
                                              rel=0.01)
