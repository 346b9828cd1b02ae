"""Render server: HTTP surface tests (health, song/patch/voices renders,
error responses)."""

import http.client
import io
import json
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


def test_render_song(server, tmp_path):
    from synthesizer_tpu import WaveSynth
    kick = WaveSynth(samplerate=44100, samplewidth=2).sine(60, 0.1, amplitude=0.8).stereo()
    kick.write_wav(str(tmp_path / "kick.wav"))
    ini = f"""
[song]
bpm = 240
ticks = 4
patterns = a

[paths]
samples = {tmp_path}/

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
    status, ctype, data = request(server, "POST", "/render/song", ini,
                                  ctype="text/plain")
    assert status == 200 and ctype == "audio/wav"
    audio, rate = read_wav_bytes(data)
    assert rate == 44100 and len(audio) > 44100 // 4
    assert np.abs(audio.astype(np.int64)).max() >= 32000  # normalized mixdown


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
