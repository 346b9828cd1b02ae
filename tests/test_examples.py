"""Smoke tests for the uncovered examples/ scripts.

make_demo_song.py and make_tracker_song.py are exercised end-to-end in
test_properties.py / test_apps.py; this module runs the rest in-process
so the shipped examples can never rot against the library surface
(midi_demo's first draft died on two stale field names — exactly the
class of drift this pins).
"""

import importlib.util
import os
import sys
import wave

import numpy as np

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


def _run(name: str, argv):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(EXAMPLES, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    old = sys.argv
    sys.argv = [name] + [str(a) for a in argv]
    try:
        spec.loader.exec_module(mod)
        mod.main()
    finally:
        sys.argv = old


def _wav_peak(path):
    with wave.open(str(path)) as w:
        a = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        return int(np.abs(a.astype(np.int64)).max()), w.getnchannels()


def test_fm_bell_example(tmp_path):
    _run("fm_bell", [tmp_path])
    for f in ("bell_graph.wav", "bell_eager.wav", "bell_chord.wav"):
        peak, nch = _wav_peak(tmp_path / f)
        assert peak > 1000 and nch == 2, f


def test_midi_demo_example(tmp_path):
    _run("midi_demo", [tmp_path])
    assert (tmp_path / "demo.mid").stat().st_size > 200
    peak, nch = _wav_peak(tmp_path / "midi_demo.wav")
    assert peak > 1000 and nch == 2
    # the pad is panned: channels must differ
    with wave.open(str(tmp_path / "midi_demo.wav")) as w:
        a = np.frombuffer(w.readframes(w.getnframes()),
                          np.int16).reshape(-1, 2)
    assert (a[:, 0] != a[:, 1]).any()


def test_sharded_mixdown_example(tmp_path):
    # the conftest already forces 8 virtual CPU devices, so the script's
    # own env setup is a no-op here and the mesh path runs for real
    out = tmp_path / "sharded.wav"
    _run("sharded_mixdown", [out])
    peak, nch = _wav_peak(out)
    assert peak > 1000 and nch == 2
