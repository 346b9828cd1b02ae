"""Render server: HTTP surface tests (health, song/patch/voices renders,
error responses)."""

import http.client
import io
import json
import time
import wave

import numpy as np
import pytest

from synthesizer_tpu.server import RenderServer, spec_from_json, voices_from_json
from synthesizer_tpu.models import spec as S


@pytest.fixture(scope="module")
def server():
    srv = RenderServer(port=0).start()
    yield srv
    srv.stop()


def request(server, method, path, body=None, ctype="application/json"):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
    headers = {"Content-Type": ctype} if body else {}
    conn.request(method, path, body=body, headers=headers)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), data


def read_wav_bytes(data):
    with wave.open(io.BytesIO(data)) as w:
        frames = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        return frames.reshape(-1, w.getnchannels()), w.getframerate()


def test_health(server):
    status, ctype, data = request(server, "GET", "/health")
    assert status == 200 and ctype == "application/json"
    info = json.loads(data)
    assert info["status"] == "ok" and info["samplerate"] == 44100


def test_render_patch(server):
    body = json.dumps({
        "duration": 0.5, "samplerate": 44100,
        "patch": {"node": "envelope", "attack": 0.02, "decay": 0.05,
                  "sustain": 0.3, "sustain_level": 0.6, "release": 0.1,
                  "source": {"node": "osc", "kind": "sine", "frequency": 440,
                             "amplitude": 0.8,
                             "fm_lfo": {"node": "osc", "kind": "sine",
                                        "frequency": 6, "amplitude": 0.01}}}})
    status, ctype, data = request(server, "POST", "/render/patch", body)
    assert status == 200 and ctype == "audio/wav"
    audio, rate = read_wav_bytes(data)
    assert rate == 44100 and len(audio) == 22050
    assert np.abs(audio).max() > 10000


def test_render_voices(server):
    body = json.dumps({
        "duration": 0.4,
        "voices": [
            {"wave": "square_bl", "frequency": 220, "amplitude": 0.3,
             "start": 0.0, "duration": 0.3, "pan": -0.5},
            {"wave": "harmonics", "frequency": 110, "amplitude": 0.3,
             "duration": 0.3, "harmonics": [1.0, 0.5, 0.25], "pan": 0.5},
        ]})
    status, ctype, data = request(server, "POST", "/render/voices", body)
    assert status == 200 and ctype == "audio/wav"
    audio, rate = read_wav_bytes(data)
    assert audio.shape == (int(0.4 * 44100), 2)
    assert np.abs(audio).max() > 3000


SONG_INI = """
[song]
bpm = 240
ticks = 4
patterns = a

[instruments]
kick = kick.wav

[synth.lead]
wave = sine
amplitude = 0.3
release = 0.05

[pattern.a]
kick = x... x...
lead = C4 .. E4 ..
"""


def test_render_song(server, tmp_path):
    from synthesizer_tpu import WaveSynth
    kick = WaveSynth(samplerate=44100, samplewidth=2).sine(60, 0.1, amplitude=0.8).stereo()
    kick.write_wav(str(tmp_path / "kick.wav"))
    server.sample_root = str(tmp_path)
    try:
        status, ctype, data = request(server, "POST", "/render/song", SONG_INI,
                                      ctype="text/plain")
    finally:
        server.sample_root = None
    assert status == 200 and ctype == "audio/wav"
    audio, rate = read_wav_bytes(data)
    assert rate == 44100 and len(audio) > 44100 // 4
    assert np.abs(audio.astype(np.int64)).max() >= 32000  # normalized mixdown


def test_render_song_path_policy(server, tmp_path):
    # no sample_root configured -> [instruments] rejected outright
    status, _, data = request(server, "POST", "/render/song", SONG_INI,
                              ctype="text/plain")
    assert status == 400 and b"sample_root" in data

    from synthesizer_tpu import WaveSynth
    kick = WaveSynth(samplerate=44100, samplewidth=2).sine(60, 0.1).stereo()
    kick.write_wav(str(tmp_path / "kick.wav"))
    server.sample_root = str(tmp_path)
    try:
        # [paths] sections rejected for server-submitted songs
        bad = SONG_INI.replace("[instruments]",
                               f"[paths]\nsamples = {tmp_path}/\n[instruments]")
        status, _, data = request(server, "POST", "/render/song", bad,
                                  ctype="text/plain")
        assert status == 400 and b"paths" in data
        # absolute, parent-escaping, and root-resolving filenames rejected
        for evil in ("/etc/hostname", "../kick.wav", ".", ""):
            bad = SONG_INI.replace("kick = kick.wav", f"kick = {evil}")
            status, _, data = request(server, "POST", "/render/song", bad,
                                      ctype="text/plain")
            assert status == 400 and b"escapes" in data, evil
    finally:
        server.sample_root = None


def test_render_limits(server):
    # duration cap (server default 600 s)
    body = json.dumps({"duration": 1e6,
                       "patch": {"node": "osc", "frequency": 440}})
    status, _, data = request(server, "POST", "/render/patch", body)
    assert status == 400 and b"exceeds" in data
    # samplerate bounds: a huge rate must not bypass the frame cap, and
    # zero must not ZeroDivisionError the handler
    for sr in (2_000_000_000, 0, -44100):
        body = json.dumps({"duration": 1.0, "samplerate": sr,
                           "patch": {"node": "osc", "frequency": 440}})
        status, _, data = request(server, "POST", "/render/patch", body)
        assert status == 400 and b"samplerate" in data, sr
        body = json.dumps({"duration": 1.0, "samplerate": sr,
                           "voices": [{"wave": "sine"}]})
        status, _, data = request(server, "POST", "/render/voices", body)
        assert status == 400 and b"samplerate" in data, sr
    body = json.dumps({"duration": 1e6, "voices": [{"wave": "sine"}]})
    status, _, data = request(server, "POST", "/render/voices", body)
    assert status == 400 and b"exceeds" in data
    # body size cap -> 413
    big = b"x" * (8 * 1024 * 1024 + 1)
    status, _, data = request(server, "POST", "/render/song", big,
                              ctype="text/plain")
    assert status == 413


def test_error_responses(server):
    status, _, data = request(server, "POST", "/render/patch", "{not json")
    assert status == 400 and b"error" in data
    status, _, data = request(server, "POST", "/render/patch",
                              json.dumps({"duration": 1,
                                          "patch": {"node": "nope"}}))
    assert status == 400 and b"unknown patch node" in data
    status, _, data = request(server, "POST", "/render/voices",
                              json.dumps({"duration": 1, "voices": []}))
    assert status == 400
    status, _, _ = request(server, "GET", "/nope")
    assert status == 404


def test_endpoint_garbage_fuzz(server):
    """Malformed bodies must produce clean 4xx responses, never a handler
    crash (which would surface as a dropped connection / empty reply)."""
    rng = np.random.default_rng(99)
    payloads = [b"", b"{", b"[]", b"null", b'{"duration": "x"}',
                b'{"patch": "sine", "duration": 1}',
                b'{"patch": {"node": ["list"]}, "duration": 1}',
                b'{"voices": {"not": "a list"}, "duration": 1}',
                b'{"voices": [{"wave": "nope"}], "duration": 1}',
                b"\xff\xfe\x00bad utf8 \x80", b"MThd" + b"\x00" * 3,
                b"MThd" + bytes(rng.integers(0, 256, 64, dtype=np.uint8)),
                b"[song]\nbpm = NaN\n",
                b"[song]\nbpm = 120\nticks = 4\npatterns = missing\n",
                b"[song]\nbpm = 0\nticks = 4\npatterns = a\n"
                b"[synth.l]\nwave = sine\n[pattern.a]\nl = C4\n",
                bytes(rng.integers(0, 256, 512, dtype=np.uint8))]
    for path in ("/render/song", "/render/patch", "/render/voices",
                 "/render/midi"):
        for body in payloads:
            status, ctype, data = request(server, "POST", path, body,
                                          ctype="application/octet-stream")
            assert 400 <= status < 500, (path, body[:20], status)
            assert ctype == "application/json" and b"error" in data


def test_concurrent_renders(server):
    """ThreadingHTTPServer + JAX: 8 simultaneous renders must all succeed
    with correct, independent outputs (no cross-request corruption)."""
    import concurrent.futures as cf

    def render(freq):
        body = json.dumps({"duration": 0.2,
                           "patch": {"node": "osc", "kind": "sine",
                                     "frequency": freq, "amplitude": 0.8}})
        status, ctype, data = request(server, "POST", "/render/patch", body)
        assert status == 200, (freq, status)
        audio, rate = read_wav_bytes(data)
        spec = np.abs(np.fft.rfft(audio[:, 0].astype(np.float64)))
        freqs = np.fft.rfftfreq(len(audio), 1 / rate)
        return freqs[np.argmax(spec)]

    want = [220.0 + 110.0 * i for i in range(8)]
    with cf.ThreadPoolExecutor(8) as ex:
        got = list(ex.map(render, want))
    for w, g in zip(want, got):
        assert abs(w - g) < 6.0, (w, g)   # each response carries ITS tone


def test_spec_from_json_roundtrip():
    node = spec_from_json({"node": "mix", "sources": [
        {"node": "osc", "kind": "triangle", "frequency": 100},
        {"node": "clip", "minimum": -0.5, "maximum": 0.5,
         "source": {"node": "osc", "kind": "sawtooth_bl", "frequency": 200}},
    ]})
    assert isinstance(node, S.Mix) and len(node.sources) == 2
    assert isinstance(node.sources[1], S.Clip)
    vs = voices_from_json([{"wave": "sine", "frequency": 440,
                            "unknown_field": 1}])
    assert vs[0].frequency == 440  # unknown fields ignored


def test_render_midi_endpoint(server):
    from synthesizer_tpu.midi import MidiNote, write_midi
    data = write_midi([MidiNote(0.0, 0.3, 60, 100, 0),
                       MidiNote(0.3, 0.3, 67, 100, 0)])
    status, ctype, wav = request(server, "POST", "/render/midi", data,
                                 ctype="audio/midi")
    assert status == 200 and ctype == "audio/wav"
    audio, rate = read_wav_bytes(wav)
    assert np.abs(audio).max() > 1000
    # garbage midi -> clean 400
    status, _, body = request(server, "POST", "/render/midi", b"nope",
                              ctype="audio/midi")
    assert status == 400 and b"error" in body


FX_SONG_INI = SONG_INI + """
[fx]
compress = threshold_db=-12 ratio=3
reverb = roomsize=0.6 wet=0.25 tail=0.2
convolve = ir=ir.wav wet=0.1 dry=0.9
"""


def test_render_song_with_fx(server, tmp_path):
    from synthesizer_tpu import WaveSynth
    ws = WaveSynth(samplerate=44100, samplewidth=2)
    ws.sine(60, 0.1, amplitude=0.8).stereo().write_wav(str(tmp_path / "kick.wav"))
    ws.white_noise(duration=0.005, amplitude=0.4, seed=2).fadeout(0.004) \
        .write_wav(str(tmp_path / "ir.wav"))
    server.sample_root = str(tmp_path)
    try:
        status, ctype, data = request(server, "POST", "/render/song",
                                      FX_SONG_INI, ctype="text/plain")
    finally:
        server.sample_root = None
    assert status == 200 and ctype == "audio/wav"
    audio, rate = read_wav_bytes(data)
    # master chain extends the render by the reverb + IR tails
    assert len(audio) > 44100 // 4 + int(0.2 * 44100)


def test_render_song_fx_ir_sandbox(server, tmp_path):
    from synthesizer_tpu import WaveSynth
    WaveSynth(samplerate=44100, samplewidth=2).sine(60, 0.1).stereo() \
        .write_wav(str(tmp_path / "kick.wav"))
    server.sample_root = str(tmp_path)
    try:
        for evil in ("/etc/hostname", "../x.wav"):
            bad = FX_SONG_INI.replace("ir=ir.wav", f"ir={evil}")
            status, _, data = request(server, "POST", "/render/song", bad,
                                      ctype="text/plain")
            assert status == 400 and b"escapes" in data, evil
        # unknown effect name in [fx] -> clean 400, not a 500
        bad = FX_SONG_INI.replace("compress =", "flanger =")
        status, _, data = request(server, "POST", "/render/song", bad,
                                  ctype="text/plain")
        assert status == 400 and b"unknown effect" in data
    finally:
        server.sample_root = None


def test_render_song_fx_tail_dos_capped(server, tmp_path):
    # an attacker-controlled reverb tail must not bypass the render bound
    # (tails extend the mix; per-track tails pad the bank at load time)
    from synthesizer_tpu import WaveSynth
    WaveSynth(samplerate=44100, samplewidth=2).sine(60, 0.1).stereo() \
        .write_wav(str(tmp_path / "kick.wav"))
    server.sample_root = str(tmp_path)
    try:
        for section in ("[fx]", "[fx.kick]"):
            bad = SONG_INI + f"\n{section}\nreverb = tail=1e6\n"
            status, _, data = request(server, "POST", "/render/song", bad,
                                      ctype="text/plain")
            assert status == 400 and b"tail" in data, section
    finally:
        server.sample_root = None


def test_render_voices_batching_coalesces_and_matches_solo(server):
    """Concurrent /render/voices requests coalesce into one grouped bank
    program, and each request's audio matches its solo render <= 1 LSB."""
    import threading
    from synthesizer_tpu import server as server_mod

    batcher = server.batcher
    gate = threading.Event()
    orig_execute = batcher._execute

    def gated_execute(batch):
        gate.wait(timeout=10.0)
        return orig_execute(batch)
    batcher._execute = gated_execute
    b0, r0, c0 = batcher.batches, batcher.requests, batcher.coalesced

    def body(freq, pan):
        return json.dumps({
            "duration": 0.05, "samplerate": 22050,
            "voices": [{"wave": "sine", "frequency": freq, "amplitude": 0.4,
                        "pan": pan, "duration": 0.04}],
        })

    N = 4
    results = [None] * N
    def worker(i):
        status, ctype, data = request(server, "POST", "/render/voices",
                                      body(220.0 * (i + 1), (i - 1.5) / 2))
        results[i] = (status, data)
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(N)]
    for t in threads:
        t.start()
    # wait until every request is queued in the batcher, then open the gate
    deadline = time.time() + 10.0
    while time.time() < deadline:
        with batcher._cv:
            if len(batcher._pending) + (batcher.requests - r0) >= N - 1:
                break
        time.sleep(0.005)
    gate.set()
    for t in threads:
        t.join(timeout=30.0)
    batcher._execute = orig_execute

    assert all(r is not None and r[0] == 200 for r in results)
    # the first request formed its own batch; the rest coalesced
    assert batcher.requests - r0 == N
    assert batcher.batches - b0 < N
    assert batcher.coalesced - c0 >= 2
    # correctness: each equals its solo render within 1 LSB
    for i, (status, data) in enumerate(results):
        solo_status, _, solo = request(server, "POST", "/render/voices",
                                       body(220.0 * (i + 1), (i - 1.5) / 2))
        a, _ = read_wav_bytes(data)
        b, _ = read_wav_bytes(solo)
        assert a.shape == b.shape
        d = np.abs(a.astype(np.int64) - b.astype(np.int64)).max()
        assert d <= 1, (i, d)


AUTOMATION_SONG_INI = """
[song]
bpm = 240
ticks = 4
patterns = a

[instruments]
kick = kick.wav

[synth.gtr]
wave = pluck
amplitude = 0.4
damping = 1.5
seed = 3
release = 0.08

[pattern.a]
kick = x...x...x...x...
gtr  = E3 .. A3 .. D4 .. G4 ..

[fx]
filter = kind=lowpass cutoff=1000 q=1.5

[automation]
track.kick.volume = 0:1 12:0.25
track.gtr.pan = 0:-0.8 12:0.8
master.volume = 0:1 16:0.2
fx.filter.cutoff = 0:300 16:6000
"""


def test_render_song_with_automation_and_pluck(server, tmp_path):
    """Untrusted song text with the full [automation] surface (velocity,
    pan, master fade, filter sweep) and a pluck synth track renders over
    the socket like any other song."""
    from synthesizer_tpu import WaveSynth
    ws = WaveSynth(samplerate=44100, samplewidth=2)
    ws.sine(60, 0.08, amplitude=0.7).stereo().write_wav(
        str(tmp_path / "kick.wav"))
    server.sample_root = str(tmp_path)
    try:
        status, ctype, data = request(server, "POST", "/render/song",
                                      AUTOMATION_SONG_INI,
                                      ctype="text/plain")
    finally:
        server.sample_root = None
    assert status == 200 and ctype == "audio/wav"
    audio, rate = read_wav_bytes(data)
    assert np.abs(audio).max() > 100
    # the master fade: final region much quieter than the start
    n = len(audio)
    assert np.abs(audio[-n // 10:]).max() < np.abs(audio[: n // 10]).max()


def test_render_song_sampler_sandbox(server, tmp_path):
    """[sampler.*] file paths obey the same sample-root confinement as
    instruments (no escapes), and an in-root sampler song renders."""
    from synthesizer_tpu import WaveSynth
    ws = WaveSynth(samplerate=44100, samplewidth=2)
    ws.sine(261.63, 0.1, amplitude=0.6).stereo().write_wav(
        str(tmp_path / "gtr.wav"))
    ok_ini = """
[song]
bpm = 240
ticks = 4
patterns = a
[sampler.gtr]
file = gtr.wav
base_note = C4
[pattern.a]
gtr = C4 .. E4 .. G4 .. .. ..
"""
    server.sample_root = str(tmp_path)
    try:
        status, ctype, data = request(server, "POST", "/render/song",
                                      ok_ini, ctype="text/plain")
        assert status == 200 and ctype == "audio/wav"
        bad = ok_ini.replace("file = gtr.wav", "file = ../../etc/passwd")
        status, _, data = request(server, "POST", "/render/song", bad,
                                  ctype="text/plain")
        assert status == 400 and b"escapes" in data
        bad2 = ok_ini.replace("file = gtr.wav", "file = /etc/passwd")
        status, _, data = request(server, "POST", "/render/song", bad2,
                                  ctype="text/plain")
        assert status == 400 and b"escapes" in data
    finally:
        server.sample_root = None
