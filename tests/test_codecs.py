"""In-process mp3 / Ogg Vorbis via system codec library bindings.

Closes the last "decode anything needs ffmpeg" dependency (VERDICT r2
missing #1 follow-through): utils/codecs.py binds the host's stock
libmpg123/libvorbisfile (decode) and libmp3lame/libvorbisenc (encode)
with ctypes.  Validation is three-sided:

* encode→decode round trips through two INDEPENDENT codebases (LAME
  encodes, mpg123 decodes; libvorbisenc encodes, libvorbisfile decodes)
  with gapless sample-count checks and SNR floors;
* a REAL-WORLD file (the LAME-encoded mp3 shipped with the machine's
  gcloud SDK test data) must parse with the right length/rate/layout;
* the full product ladder (AudiofileToWavStream → SampleStream →
  jukebox indexer) must carry the decoded audio end to end.

Everything skips cleanly on hosts without the shared libraries — the
ffmpeg subprocess rung (tested elsewhere with fake binaries) covers
those.
"""

import io
import os
import wave

import numpy as np
import pytest

from synthesizer_tpu.sample import Sample
from synthesizer_tpu.streaming import AudiofileToWavStream, SampleStream
from synthesizer_tpu.utils import codecs, decoders

needs_mpeg = pytest.mark.skipif(
    not (codecs.have_mpg123() and codecs.have_lame()),
    reason="libmpg123/libmp3lame not installed")
needs_vorbis = pytest.mark.skipif(
    not (codecs.have_vorbisfile() and codecs.have_vorbisenc()),
    reason="libvorbis*/libogg not installed")

SR = 44100
REAL_MP3 = ("/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
            "test_data/test.mp3")


def tone(n=SR, nch=2, freq=440.0, amp=0.5):
    t = np.arange(n) / SR
    cols = [np.sin(2 * np.pi * freq * (k + 1) * t) * amp * 32767 / (k + 1)
            for k in range(nch)]
    return np.ascontiguousarray(
        np.rint(np.stack(cols, axis=1))).astype(np.int16)


def snr_db(ref, got):
    ref = ref.astype(np.float64)
    err = got.astype(np.float64) - ref
    return 10 * np.log10(np.mean(ref ** 2) / max(np.mean(err ** 2), 1e-12))


# -- mp3 -------------------------------------------------------------------

@needs_mpeg
def test_mp3_roundtrip_gapless_stereo(tmp_path):
    """LAME encode -> mpg123 decode: the LAME info tag makes the decoded
    sample count EXACT (no codec delay/padding leaks), and the audio
    itself survives with a sane SNR for 192 kbps."""
    ref = tone()
    p = tmp_path / "t.mp3"
    codecs.write_mp3(p, ref, SR, 2)
    got, rate, width, nch = codecs.read_mpeg(str(p))
    assert (rate, width, nch) == (SR, 2, 2)
    assert len(got) == len(ref)                    # gapless
    assert snr_db(ref, got) > 20.0


@needs_mpeg
def test_mp3_roundtrip_mono(tmp_path):
    ref = tone(nch=1, n=SR // 2)
    p = tmp_path / "m.mp3"
    codecs.write_mp3(p, ref, SR, 1, bitrate=128)
    got, rate, width, nch = codecs.read_mpeg(str(p))
    assert (rate, nch) == (SR, 1)
    assert len(got) == len(ref)
    assert snr_db(ref, got) > 20.0


@needs_mpeg
def test_mp3_probe_matches_decode(tmp_path):
    ref = tone(n=SR // 4)
    p = tmp_path / "p.mp3"
    codecs.write_mp3(p, ref, SR, 2)
    n, rate, nch = codecs.probe_mpeg(str(p))
    got, rate2, _, nch2 = codecs.read_mpeg(str(p))
    assert (n, rate, nch) == (len(got), rate2, nch2)


@pytest.mark.skipif(not codecs.have_mpg123(), reason="libmpg123 missing")
@pytest.mark.skipif(not os.path.exists(REAL_MP3),
                    reason="no real-world mp3 on this host")
def test_real_world_mp3_decodes():
    """A REAL mp3 (LAME-encoded, ID3v2.4-tagged, MPEG-2 22.05 kHz mono —
    shipped with this machine's gcloud SDK) must parse: right
    rate/channels, ID3 skipped, frame count consistent with the probe.
    (The file is digital silence, so content is length/format only.)"""
    frames, rate, width, nch = codecs.read_mpeg(REAL_MP3)
    assert (rate, width, nch) == (22050, 2, 1)
    assert len(frames) > 20000                  # ~1.2 s
    assert codecs.probe_mpeg(REAL_MP3) == (len(frames), rate, nch)
    # the product ladder decodes it too (extension-agnostic magic)
    frames2, rate2, _, nch2 = decoders.decode_audio_file(REAL_MP3)
    np.testing.assert_array_equal(frames, frames2)


@needs_mpeg
def test_mp3_garbage_raises(tmp_path):
    p = tmp_path / "junk.mp3"
    p.write_bytes(b"\xff\xfb" + os.urandom(64))   # sync word, bogus frame
    with pytest.raises((codecs.CodecError, decoders.DecodeError)):
        codecs.read_mpeg(str(p))


# -- ogg vorbis ------------------------------------------------------------

@needs_vorbis
def test_vorbis_roundtrip_stereo(tmp_path):
    ref = tone()
    p = tmp_path / "t.ogg"
    codecs.write_vorbis(p, ref, SR, 2)
    got, rate, width, nch = codecs.read_vorbis(str(p))
    assert (rate, width, nch) == (SR, 2, 2)
    assert len(got) == len(ref)                    # granulepos-exact
    assert snr_db(ref, got) > 25.0


@needs_vorbis
def test_vorbis_roundtrip_mono_and_quality(tmp_path):
    ref = tone(nch=1, n=SR // 2)
    sizes = {}
    for q in (0.0, 0.8):
        p = tmp_path / f"q{q}.ogg"
        codecs.write_vorbis(p, ref, SR, 1, quality=q)
        got, rate, _, nch = codecs.read_vorbis(str(p))
        assert (rate, nch, len(got)) == (SR, 1, len(ref))
        sizes[q] = os.path.getsize(p)
    assert sizes[0.8] > sizes[0.0]     # quality knob actually does VBR


@needs_vorbis
def test_vorbis_probe_matches_decode(tmp_path):
    ref = tone(n=SR // 4)
    p = tmp_path / "p.ogg"
    codecs.write_vorbis(p, ref, SR, 2)
    got, rate, _, nch = codecs.read_vorbis(str(p))
    assert codecs.probe_vorbis(str(p)) == (len(got), rate, nch)


@needs_vorbis
def test_non_vorbis_ogg_raises(tmp_path):
    p = tmp_path / "fake.ogg"
    p.write_bytes(b"OggS" + bytes(60))
    with pytest.raises(codecs.CodecError):
        codecs.read_vorbis(str(p))


# -- ogg opus --------------------------------------------------------------

needs_opus = pytest.mark.skipif(not codecs.have_opus(),
                                reason="libopus/libogg not installed")


@needs_opus
def test_opus_roundtrip_stereo(tmp_path):
    """libopus encode behind OUR libogg mux -> OUR demux + libopus
    decode: RFC 7845 preskip/end-trim granule handling makes the sample
    count exact."""
    n = 24000
    t = np.arange(n) / 48000
    ref = np.ascontiguousarray(np.rint(np.stack(
        [np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 660 * t)], 1)
        * 0.5 * 32767)).astype(np.int16)
    p = tmp_path / "t.opus"
    codecs.write_opus(p, ref, 48000, 2)
    got, rate, width, nch = codecs.read_opus(str(p))
    assert (rate, width, nch) == (48000, 2, 2)
    assert len(got) == n                           # preskip + padding trim
    assert snr_db(ref, got) > 25.0
    assert codecs.probe_opus(str(p)) == (n, 48000, 2)


@needs_opus
def test_opus_low_rate_input(tmp_path):
    """A 16 kHz input stream decodes at the canonical 48 kHz with the
    granule-exact sample count (16k samples x3)."""
    n = 8000
    ref = (np.sin(2 * np.pi * 300 * np.arange(n) / 16000)
           * 12000).astype(np.int16).reshape(-1, 1)
    p = tmp_path / "l.opus"
    codecs.write_opus(p, ref, 16000, 1)
    got, rate, _, nch = codecs.read_opus(str(p))
    assert (rate, nch, len(got)) == (48000, 1, n * 3)


@needs_opus
def test_opus_invalid_rate_raises(tmp_path):
    with pytest.raises(codecs.CodecError, match="8/12/16/24/48"):
        codecs.write_opus(tmp_path / "x.opus",
                          np.zeros((100, 2), np.int16), 44100, 2)


@needs_opus
def test_sample_write_opus_resamples(tmp_path):
    """Sample.write_opus: a 44.1 kHz sample resamples a COPY to 48 kHz
    through the exact ratecv before encoding; self is untouched."""
    ref = tone(n=SR // 4)
    smp = Sample.from_raw_frames(ref.tobytes(), 2, SR, 2)
    p = tmp_path / "s.opus"
    smp.write_audio(p)                     # extension dispatch
    assert smp.samplerate == SR
    nf, rate, nch = codecs.probe_opus(str(p))
    assert (rate, nch) == (48000, 2)
    assert abs(nf - SR // 4 * 48000 // SR) <= 2    # ratecv truncation
    frames, rate2, _, nch2 = decoders.decode_audio_file(str(p))
    assert (rate2, nch2, len(frames)) == (48000, 2, nf)


@needs_opus
def test_opus_through_stream_ladder(tmp_path):
    ref = tone(n=SR // 4)
    smp = Sample.from_raw_frames(ref.tobytes(), 2, SR, 2)
    p = tmp_path / "s.opus"
    smp.write_opus(p)
    with AudiofileToWavStream(str(p), samplerate=SR, nchannels=2,
                              samplewidth=2) as st:
        with wave.open(io.BytesIO(st.read()), "rb") as w:
            assert w.getframerate() == SR
            got = np.frombuffer(w.readframes(w.getnframes()),
                                np.int16).reshape(-1, 2)
    # 44.1k -> 48k (encode) -> 44.1k (normalize): lossy + two exact
    # ratecv hops; the 440 Hz fundamental must dominate
    spec = np.abs(np.fft.rfft(got[:SR // 8, 0].astype(np.float64)))
    freqs = np.fft.rfftfreq(SR // 8, 1 / SR)
    assert abs(freqs[int(np.argmax(spec))] - 440.0) < 8.0


@needs_opus
def test_opus_probe_audio_file(tmp_path):
    n = 12000
    ref = (np.sin(2 * np.pi * 500 * np.arange(n) / 48000)
           * 9000).astype(np.int16).reshape(-1, 1)
    p = tmp_path / "x.opus"
    codecs.write_opus(p, ref, 48000, 1)
    assert decoders.probe_audio_file(str(p)) == (n, 48000, 1)


@needs_opus
def test_opus_garbage_raises(tmp_path):
    p = tmp_path / "bad.opus"
    p.write_bytes(b"OggS" + bytes(40))
    with pytest.raises(codecs.CodecError):
        codecs.read_opus(str(p))


# -- magic sniffing --------------------------------------------------------

def test_mpeg_magic_sniffer():
    assert codecs.looks_like_mpeg(b"ID3\x04\x00rest")
    assert codecs.looks_like_mpeg(b"\xff\xfb\x90\x00")   # MPEG-1 L3
    assert codecs.looks_like_mpeg(b"\xff\xf3\x80\xc4")   # MPEG-2 L3
    assert not codecs.looks_like_mpeg(b"RIFF....WAVE")
    assert not codecs.looks_like_mpeg(b"\xff\xf8\x00\x00")  # layer bits 00
    assert not codecs.looks_like_mpeg(b"\xff\x0b\x90\x00")  # no sync
    assert codecs.looks_like_ogg(b"OggSxxxx")
    assert not codecs.looks_like_ogg(b"fLaC")


# -- product integration ---------------------------------------------------

@needs_mpeg
def test_audiofile_stream_decodes_mp3(tmp_path):
    """AudiofileToWavStream: .mp3 -> normalized PCM WAV through the same
    device convert pipeline as every other in-process rung."""
    ref = tone(n=SR // 2)
    p = tmp_path / "song.mp3"
    codecs.write_mp3(p, ref, SR, 2)
    with AudiofileToWavStream(str(p), samplerate=SR, nchannels=2,
                              samplewidth=2) as st:
        with wave.open(io.BytesIO(st.read()), "rb") as w:
            assert w.getframerate() == SR and w.getnchannels() == 2
            got = np.frombuffer(w.readframes(w.getnframes()),
                                np.int16).reshape(-1, 2)
    assert len(got) == len(ref)
    assert snr_db(ref, got) > 20.0


@needs_vorbis
def test_sample_stream_over_ogg(tmp_path):
    ref = tone(n=SR // 2)
    p = tmp_path / "song.ogg"
    codecs.write_vorbis(p, ref, SR, 2)
    chunks = list(SampleStream(AudiofileToWavStream(
        str(p), samplerate=SR, nchannels=2, samplewidth=2), 4096))
    got = np.concatenate([c.get_frame_array() for c in chunks])
    assert len(got) == len(ref)
    assert snr_db(ref, got) > 25.0


@needs_mpeg
def test_misnamed_mp3_magic_sniffed(tmp_path):
    """A .wav-named mp3 still decodes (magic beats extension)."""
    ref = tone(n=SR // 4)
    p = tmp_path / "lying.wav"
    codecs.write_mp3(p, ref, SR, 2)
    frames, rate, _, nch = decoders.decode_audio_file(str(p))
    assert (rate, nch, len(frames)) == (SR, 2, len(ref))


@needs_mpeg
def test_sample_write_mp3_and_write_audio(tmp_path):
    ref = tone(n=SR // 4)
    smp = Sample.from_raw_frames(ref.tobytes(), 2, SR, 2)
    p1 = tmp_path / "a.mp3"
    smp.write_mp3(p1)
    got, rate, _, nch = codecs.read_mpeg(str(p1))
    assert (rate, nch, len(got)) == (SR, 2, len(ref))
    p2 = tmp_path / "b.mp3"
    smp.write_audio(p2)                    # extension dispatch
    assert codecs.probe_mpeg(str(p2))[0] == len(ref)


@needs_vorbis
def test_sample_write_ogg(tmp_path):
    ref = tone(n=SR // 4)
    smp = Sample.from_raw_frames(ref.tobytes(), 2, SR, 2)
    p = tmp_path / "a.ogg"
    smp.write_audio(p)
    got, rate, _, nch = codecs.read_vorbis(str(p))
    assert (rate, nch, len(got)) == (SR, 2, len(ref))
    assert snr_db(ref, got) > 25.0


@needs_mpeg
def test_sample_write_mp3_width_conversion(tmp_path):
    """A 32-bit sample converts through make_16bit for the encoder and
    the original sample is untouched."""
    ref = tone(n=SR // 8)
    smp = Sample.from_raw_frames(
        (ref.astype(np.int32) << 16).tobytes(), 4, SR, 2)
    p = tmp_path / "w4.mp3"
    smp.write_mp3(p)
    assert smp.samplewidth == 4
    got, rate, _, nch = codecs.read_mpeg(str(p))
    assert (rate, nch, len(got)) == (SR, 2, len(ref))
    assert snr_db(ref, got) > 20.0


@needs_mpeg
@needs_vorbis
def test_jukebox_indexes_mp3_and_ogg(tmp_path):
    """The library indexer gets full duration metadata for mp3/ogg with
    no external binary."""
    from jukebox.backend import MusicLibrary
    ref = tone(n=SR // 2)
    codecs.write_mp3(tmp_path / "one.mp3", ref, SR, 2)
    codecs.write_vorbis(tmp_path / "two.ogg", ref, SR, 2)
    lib = MusicLibrary()
    assert lib.scan(str(tmp_path)) == 2
    rows = {t.title: t for t in lib.search()}
    assert rows["one"].samplerate == SR and rows["two"].samplerate == SR
    for t in rows.values():
        assert abs(t.duration - 0.5) < 0.01
        assert t.nchannels == 2


@needs_mpeg
def test_probe_audio_file_mpeg(tmp_path):
    ref = tone(n=SR // 4)
    p = tmp_path / "x.mp3"
    codecs.write_mp3(p, ref, SR, 2)
    assert decoders.probe_audio_file(str(p)) == (len(ref), SR, 2)


@needs_vorbis
def test_probe_audio_file_vorbis(tmp_path):
    ref = tone(n=SR // 4)
    p = tmp_path / "x.ogg"
    codecs.write_vorbis(p, ref, SR, 2)
    assert decoders.probe_audio_file(str(p)) == (len(ref), SR, 2)


def test_missing_libs_raise_codec_error(monkeypatch):
    """Hosts without the shared libraries degrade to CodecError (the
    streaming ladder then falls through to ffmpeg)."""
    monkeypatch.setattr(codecs, "_LIBS",
                        {k: None for k in ("mpg123", "lame", "vorbisfile",
                                           "vorbis", "vorbisenc", "ogg")})
    assert not codecs.have_mpg123() and not codecs.have_vorbisenc()
    with pytest.raises(codecs.CodecError, match="libmpg123"):
        codecs.read_mpeg("/nonexistent.mp3")
    with pytest.raises(codecs.CodecError, match="libmp3lame"):
        codecs.write_mp3("/nonexistent.mp3", np.zeros((4, 2), np.int16),
                         SR, 2)
    with pytest.raises(codecs.CodecError, match="libvorbisfile"):
        codecs.read_vorbis("/nonexistent.ogg")
    with pytest.raises(codecs.CodecError, match="not available"):
        codecs.write_vorbis("/x.ogg", np.zeros((4, 2), np.int16), SR, 2)


# -- soxr hqresample rung --------------------------------------------------

from synthesizer_tpu.utils import soxr as soxr_mod

needs_soxr = pytest.mark.skipif(not soxr_mod.have_soxr(),
                                reason="libsoxr not installed")


@needs_soxr
def test_soxr_resample_quality():
    """soxr 22050->44100 of a pure tone: near-ideal SNR vs the analytic
    target (far beyond linear interpolation's)."""
    sr_in, sr_out = 22050, 44100
    n = sr_in
    sig = (np.sin(2 * np.pi * 1000 * np.arange(n) / sr_in)
           * 12000).astype(np.int16).reshape(-1, 1)
    out = soxr_mod.soxr_resample(sig, sr_in, sr_out)
    assert abs(len(out) - 2 * n) <= 16
    m = len(out) - 2000
    ideal = np.sin(2 * np.pi * 1000 * np.arange(1000, 1000 + m)
                   / sr_out) * 12000
    err = out[1000:1000 + m, 0].astype(np.float64) - ideal[:m]
    snr = 10 * np.log10(np.mean(ideal ** 2) / np.mean(err ** 2))
    assert snr > 55.0, snr


@needs_soxr
def test_soxr_identity_and_empty():
    sig = (np.arange(32, dtype=np.int16) * 100).reshape(-1, 2)
    np.testing.assert_array_equal(
        soxr_mod.soxr_resample(sig, 44100, 44100), sig)
    assert len(soxr_mod.soxr_resample(np.zeros((0, 2), np.int16),
                                      22050, 44100)) == 0


@needs_mpeg
@needs_soxr
def test_hqresample_uses_soxr_for_lossy(tmp_path):
    """A 22.05 kHz mp3 normalized to 44.1 kHz: hqresample=True routes
    through soxr (different samples from the exact-ratecv path, better
    high-frequency image rejection), hqresample=False keeps ratecv."""
    sr_in = 22050
    n = sr_in // 2
    sig = (np.sin(2 * np.pi * 8000 * np.arange(n) / sr_in)
           * 11000).astype(np.int16).reshape(-1, 1)
    p = tmp_path / "hq.mp3"
    codecs.write_mp3(p, sig, sr_in, 1)

    def decoded(hq):
        with AudiofileToWavStream(str(p), samplerate=44100, nchannels=1,
                                  samplewidth=2, hqresample=hq) as st:
            with wave.open(io.BytesIO(st.read()), "rb") as w:
                return np.frombuffer(w.readframes(w.getnframes()),
                                     np.int16)

    hq, lo = decoded(True), decoded(False)
    assert abs(len(hq) - len(lo)) <= 32
    m = min(len(hq), len(lo))
    assert np.abs(hq[:m].astype(np.int64) - lo[:m].astype(np.int64)).max() > 0

    def image_ratio(x):
        k = min(len(x), sr_in)
        spec = np.abs(np.fft.rfft(x[:k].astype(np.float64)))
        freqs = np.fft.rfftfreq(k, 1 / 44100)
        fund = spec[(freqs > 7500) & (freqs < 8500)].max()
        image = spec[(freqs > 13000) & (freqs < 15000)].max()
        return fund / max(image, 1e-9)

    # the 8 kHz tone's 14.05 kHz mirror image: soxr crushes it, linear
    # interpolation leaves it audible
    assert image_ratio(hq) > 4 * image_ratio(lo)


@needs_soxr
def test_exact_formats_keep_ratecv(tmp_path):
    """A FLAC (lossless contract) at 22.05 kHz normalized to 44.1 kHz
    must be bit-exact with the device ratecv even under hqresample."""
    from synthesizer_tpu.utils.flac import write_flac
    sig = tone(n=4000, nch=1)
    p = tmp_path / "c.flac"
    write_flac(str(p), sig, 22050, 2, 1)
    with AudiofileToWavStream(str(p), samplerate=44100, nchannels=1,
                              samplewidth=2, hqresample=True) as st:
        with wave.open(io.BytesIO(st.read()), "rb") as w:
            got = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    want = Sample.from_raw_frames(sig.tobytes(), 2, 22050, 1) \
        .resample(44100).get_frame_array()
    np.testing.assert_array_equal(got, want.reshape(-1))


# -- tracker modules (libopenmpt) ------------------------------------------

from synthesizer_tpu.utils import modules as mod_rung

needs_openmpt = pytest.mark.skipif(not mod_rung.have_openmpt(),
                                   reason="libopenmpt not installed")


def make_protracker_mod(path, title=b"graft test mod"):
    """A REAL (minimal) ProTracker MOD written to the published format:
    one 32-word square-wave sample, one pattern, C-3 on row 0."""
    import struct
    out = bytearray()
    out += title.ljust(20, b"\0")
    out += (b"square".ljust(22, b"\0") + struct.pack(">H", 32)
            + bytes([0, 64]) + struct.pack(">HH", 0, 1))
    for _ in range(30):
        out += (b"\0" * 22 + struct.pack(">H", 0) + bytes([0, 0])
                + struct.pack(">HH", 0, 1))
    out += bytes([1, 127])
    out += bytes([0]) + b"\0" * 127
    out += b"M.K."
    pat = bytearray(1024)
    pat[0:4] = bytes([214 >> 8, 214 & 0xFF, 0x10, 0])   # smp 1, period 214
    out += pat
    sq = np.concatenate([np.full(32, 100, np.int8),
                         np.full(32, -100, np.int8)])
    out += sq.tobytes()
    with open(path, "wb") as f:
        f.write(bytes(out))


@needs_openmpt
def test_mod_renders(tmp_path):
    p = tmp_path / "t.mod"
    make_protracker_mod(p)
    frames, rate, width, nch = mod_rung.read_module(str(p))
    assert (rate, width, nch) == (48000, 2, 2)
    assert len(frames) > 5 * 48000        # 64 rows at speed 6 ≈ 7.7 s
    assert np.abs(frames).max() > 2000    # the square wave is audible
    assert mod_rung.module_title(str(p)) == "graft test mod"


@needs_openmpt
def test_mod_through_dispatcher_and_probe(tmp_path):
    p = tmp_path / "t.mod"
    make_protracker_mod(p)
    frames, rate, _, nch = decoders.decode_audio_file(str(p))
    assert (rate, nch) == (48000, 2)
    n, rate2, nch2 = decoders.probe_audio_file(str(p))
    assert (rate2, nch2) == (48000, 2)
    assert 0.8 * len(frames) < n <= len(frames)   # probe excludes fade tail


@needs_openmpt
def test_mod_through_stream_ladder(tmp_path):
    p = tmp_path / "t.mod"
    make_protracker_mod(p)
    with AudiofileToWavStream(str(p), samplerate=SR, nchannels=2,
                              samplewidth=2) as st:
        with wave.open(io.BytesIO(st.read()), "rb") as w:
            assert w.getframerate() == SR and w.getnchannels() == 2
            got = np.frombuffer(w.readframes(w.getnframes()),
                                np.int16).reshape(-1, 2)
    assert len(got) > 5 * SR and np.abs(got).max() > 2000


@needs_openmpt
def test_jukebox_indexes_mod_with_embedded_title(tmp_path):
    from jukebox.backend import MusicLibrary
    p = tmp_path / "file_name.mod"
    make_protracker_mod(p, title=b"Embedded Song Title")
    lib = MusicLibrary()
    assert lib.scan(str(tmp_path)) == 1
    (t,) = lib.search()
    assert t.title == "Embedded Song Title"
    assert t.samplerate == 48000 and t.nchannels == 2
    assert t.duration > 5.0


def test_module_sniffer():
    assert mod_rung.looks_like_module(b"IMPM" + bytes(100))
    assert mod_rung.looks_like_module(b"Extended Module: hello")
    assert mod_rung.looks_like_module(bytes(44) + b"SCRM")
    assert mod_rung.looks_like_module(bytes(1080) + b"M.K." + b"...")
    assert not mod_rung.looks_like_module(b"RIFF" + bytes(2000))
    assert not mod_rung.looks_like_module(b"IMP")


@needs_openmpt
def test_module_garbage_raises(tmp_path):
    """A truncated IT header raises ModuleError.  (Classic MOD is
    header-only-validated by libopenmpt — a zero-filled M.K. file loads
    as an empty song, so the garbage check uses IT.)"""
    p = tmp_path / "bad.it"
    p.write_bytes(b"IMPM" + bytes(4))
    with pytest.raises(mod_rung.ModuleError, match="cannot parse"):
        mod_rung.read_module(str(p))


# -- libav catch-all rung (m4a/aac and friends) ----------------------------

from synthesizer_tpu.utils import libav as libav_mod

needs_libav = pytest.mark.skipif(not libav_mod.have_libav(),
                                 reason="ffmpeg shared libs/headers absent")


def snr_db(got, want):
    got = got.astype(np.float64)
    want = want.astype(np.float64)
    m = min(len(got), len(want))
    err = got[:m] - want[:m]
    return 10 * np.log10(np.mean(want[:m] ** 2) / max(np.mean(err ** 2),
                                                      1e-12))


@needs_libav
def test_m4a_roundtrip_snr(tmp_path):
    """AAC-in-MP4 encode -> decode through the shim: the 440 Hz tone
    survives with codec-grade SNR and near-gapless length."""
    sig = tone(n=SR, nch=2)
    p = tmp_path / "t.m4a"
    libav_mod.write_with_libav(str(p), sig, SR, 2)
    frames, rate, width, nch = libav_mod.read_with_libav(str(p))
    assert (rate, width, nch) == (SR, 2, 2)
    # AAC adds encoder delay/padding; the MP4 edit list trims most of it
    assert abs(len(frames) - len(sig)) < 4096
    # align by cross-correlation (residual priming delay), then SNR
    lag = np.argmax(np.correlate(frames[:8192, 0].astype(np.float64),
                                 sig[:4096, 0].astype(np.float64),
                                 "valid"))
    assert snr_db(frames[lag:lag + SR // 2, 0], sig[:SR // 2, 0]) > 20


@needs_libav
def test_adts_aac_decodes(tmp_path):
    sig = tone(n=SR // 2, nch=1, freq=1000.0)
    p = tmp_path / "t.aac"
    libav_mod.write_with_libav(str(p), sig, SR, 1)
    frames, rate, _w, nch = libav_mod.read_with_libav(str(p))
    assert (rate, nch) == (SR, 1)
    spec = np.abs(np.fft.rfft(frames[4096:4096 + 16384, 0]
                              .astype(np.float64)))
    freqs = np.fft.rfftfreq(16384, 1 / rate)
    assert abs(freqs[np.argmax(spec)] - 1000.0) < 10


@needs_libav
def test_m4a_through_dispatcher_probe_and_ladder(tmp_path):
    sig = tone(n=SR, nch=2)
    p = tmp_path / "song.m4a"
    libav_mod.write_with_libav(str(p), sig, SR, 2)
    frames, rate, _w, nch = decoders.decode_audio_file(str(p))
    assert (rate, nch) == (SR, 2)
    n, rate2, nch2 = decoders.probe_audio_file(str(p))
    assert (rate2, nch2) == (SR, 2)
    assert abs(n - len(frames)) < 8192
    with AudiofileToWavStream(str(p), samplerate=SR, nchannels=2,
                              samplewidth=2) as st:
        with wave.open(io.BytesIO(st.read()), "rb") as w:
            assert w.getframerate() == SR and w.getnchannels() == 2
            got = np.frombuffer(w.readframes(w.getnframes()),
                                np.int16).reshape(-1, 2)
    assert snr_db(got[1024:SR // 2, 0], sig[1024:SR // 2, 0]) > 15


@needs_libav
def test_sample_write_m4a_and_write_audio(tmp_path):
    smp = Sample.from_raw_frames(tone(n=SR // 2).tobytes(), 2, SR, 2)
    p1, p2 = tmp_path / "a.m4a", tmp_path / "b.aac"
    smp.write_m4a(p1)
    smp.write_audio(str(p2))
    for p in (p1, p2):
        frames, rate, _w, nch = libav_mod.read_with_libav(str(p))
        assert (rate, nch) == (SR, 2) and len(frames) > SR // 4
    assert p1.read_bytes()[4:8] == b"ftyp"          # real MP4 box
    assert p2.read_bytes()[0] == 0xFF               # real ADTS sync


@needs_libav
def test_libav_downmixes_51_to_stereo(tmp_path):
    """A 5.1 source decodes as a stereo downmix (the pipeline's channel
    model is mono/stereo)."""
    n = SR // 4
    six = np.zeros((n, 6), np.int16)
    six[:, 0] = tone(n=n, nch=1, freq=440.0)[:, 0]      # FL
    six[:, 1] = tone(n=n, nch=1, freq=660.0)[:, 0]      # FR
    import wave as _wave
    p = tmp_path / "six.wav"
    with _wave.open(str(p), "wb") as w:
        w.setnchannels(6)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(six.tobytes())
    frames, rate, _w, nch = libav_mod.read_with_libav(str(p))
    assert (rate, nch) == (SR, 2)
    assert np.abs(frames).max() > 1000


@needs_libav
def test_libav_garbage_raises(tmp_path):
    p = tmp_path / "junk.m4a"
    p.write_bytes(os.urandom(4096))
    with pytest.raises(libav_mod.LibavError):
        libav_mod.read_with_libav(str(p))
    with pytest.raises(decoders.DecodeError):
        decoders.decode_audio_file(str(p))


@needs_libav
def test_jukebox_indexes_m4a(tmp_path):
    from jukebox.backend import MusicLibrary
    p = tmp_path / "tune.m4a"
    libav_mod.write_with_libav(str(p), tone(n=SR), SR, 2)
    lib = MusicLibrary()
    assert lib.scan(str(tmp_path)) == 1
    (t,) = lib.search()
    assert t.samplerate == SR and t.nchannels == 2
    assert 0.8 < t.duration < 1.3
