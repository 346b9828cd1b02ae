"""Gate-driven RealtimeVoice tests (the reference's key-down/up flow §4.5)."""

import time

import numpy as np
import pytest

from synthesizer_tpu import Output, oscillators as osc
from synthesizer_tpu.voice import RealtimeVoice

import sys
sys.path.insert(0, "/root/repo")
from keyboard_gui import SynthController  # noqa: E402

SR = 44100
BS = 1470


def collect(voice, n_before_release, n_max=200):
    gen = voice.chunks()
    chunks = []
    for i in range(n_max):
        try:
            c = next(gen)
        except StopIteration:
            break
        chunks.append(np.frombuffer(c, np.int16).reshape(-1, 2))
        if i == n_before_release - 1:
            voice.release()
    else:
        pytest.fail("voice never ended")
    return np.concatenate(chunks)


def test_voice_attack_sustain_release():
    patch = osc.Sine(440.0, amplitude=0.9, samplerate=SR)
    v = RealtimeVoice(patch, attack=0.02, decay=0.03, sustain_level=0.6,
                      release=0.05, samplerate=SR, blocksize=BS)
    audio = collect(v, n_before_release=6)
    # attack: first ms quiet, later loud
    assert np.abs(audio[:40]).max() < np.abs(audio[2000:4000]).max()
    # sustained region roughly at sustain_level * amp
    sus = np.abs(audio[4 * BS:5 * BS]).max()
    assert 0.45 * 32767 * 0.9 < sus < 0.75 * 32767 * 0.9
    # ends in silence after release
    assert np.abs(audio[-BS // 4:]).max() == 0
    # stream terminated (release 0.05s ~ 3 blocks after release point)
    assert len(audio) <= (6 + 4) * BS


def test_voice_hold_indefinitely_until_release():
    patch = osc.Square(110.0, amplitude=0.5, samplerate=SR)
    v = RealtimeVoice(patch, 0.005, 0.01, 0.7, 0.02, samplerate=SR, blocksize=BS)
    audio = collect(v, n_before_release=40, n_max=100)
    held = np.abs(audio[30 * BS:31 * BS]).max()
    assert held > 0.5 * 32767 * 0.5  # still sounding at block 30


def test_controller_realtime_voice_lifecycle():
    out = Output(samplerate=SR, nchannels=2, frames_per_chunk=BS, mixing="mixed")
    try:
        c = SynthController(samplerate=SR, output=out)
        c.key_down(49)
        assert len(c._active) == 1
        assert out.mixer.active_count == 1
        c.key_up(49)
        deadline = time.time() + 10.0
        while out.mixer.active_count and time.time() < deadline:
            time.sleep(0.02)
        assert out.mixer.active_count == 0  # release completed, voice dropped
    finally:
        out.close()
