#!/usr/bin/env python3
"""Generate a tracker-style demo song exercising the round-2/3 song-layer
surface end to end: pitched samplers (one-shot + sustain-looped), tracker
accents and note@velocity, swing, per-track fx on all three track kinds,
an AIFF instrument (decoded in-process — no ffmpeg), and the full
[automation] set (velocity/pan curves, filter sweep, reverb send, master
fade, plus the recurrence-internal compressor-release and reverb-roomsize
curves).

    python examples/make_tracker_song.py [outdir]
    python trackmixer.py outdir/tracker.ini -o tracker.wav
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthesizer_tpu import WaveSynth, oscillators as osc  # noqa: E402

SR = 44100
C4 = 261.6255653005986


def make_kit(outdir: str) -> None:
    synth = WaveSynth(samplerate=SR, samplewidth=2)
    os.makedirs(outdir, exist_ok=True)

    kick = synth.render_oscillator(
        osc.EnvelopeFilter(
            osc.Sine(52.0, amplitude=0.9,
                     fm_lfo=osc.Linear(0.0, -5e-5, min_value=-0.6),
                     samplerate=SR), 0.002, 0.16, 0.0, 0.3, 0.05),
        0.22, "kick")
    kick.fadeout(0.05).stereo().write_wav(os.path.join(outdir, "kick.wav"))

    snare = synth.render_oscillator(
        osc.EnvelopeFilter(
            osc.MixingFilter(osc.Triangle(190.0, amplitude=0.35,
                                          samplerate=SR),
                             osc.WhiteNoise(amplitude=0.5, seed=3,
                                            samplerate=SR)),
            0.001, 0.1, 0.0, 0.2, 0.03), 0.14, "snare")
    snare.fadeout(0.04).stereo()
    # write the snare as AIFF (big-endian PCM): the song loads it through
    # the in-process decoder (utils/decoders.py) — no ffmpeg involved
    import struct
    import numpy as np
    frames = snare.get_frame_array().astype(">i2")
    m = SR
    e = 0
    while m < (1 << 63):
        m <<= 1
        e += 1
    rate80 = struct.pack(">HII", 16383 + 63 - e, m >> 32, m & 0xFFFFFFFF)
    comm = struct.pack(">HIH", 2, len(frames), 16) + rate80
    ssnd = struct.pack(">II", 0, 0) + frames.tobytes()
    body = (b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    with open(os.path.join(outdir, "snare.aiff"), "wb") as f:
        f.write(b"FORM" + struct.pack(">I", len(body)) + body)

    hat = synth.white_noise(duration=0.04, amplitude=0.3, seed=5)
    hat.fadeout(0.03).stereo().write_wav(os.path.join(outdir, "hat.wav"))

    # one-shot melodic source: Karplus-Strong pluck, repitched per note
    synth.pluck(C4, 0.3, amplitude=0.55, seed=21, damping=1.2) \
        .fadeout(0.04).stereo().write_wav(os.path.join(outdir, "pluck.wav"))

    # looped pad source: one second of slow-attack saw, loop the steady
    # middle so held notes sustain forever
    pad = synth.render_oscillator(
        osc.EnvelopeFilter(osc.BandlimitedSawtooth(C4, amplitude=0.4,
                                                   samplerate=SR),
                           0.15, 0.1, 0.7, 0.8, 0.05), 1.0, "pad")
    pad.stereo().write_wav(os.path.join(outdir, "pad.wav"))


SONG_INI = """\
; tracker-style demo: samplers + loops + accents + automation + swing
[song]
bpm = 112
ticks = 4
swing = 0.25
patterns = a a b b a a

[paths]
samples = .

[instruments]
kick = kick.wav
snare = snare.aiff
hat = hat.wav

[sampler.pluck]
file = pluck.wav
base_note = C4

[sampler.pad]
file = pad.wav
base_note = C4
loop_start = 0.45
loop_end = 0.85
release = 0.12

[fx.hat]
filter = kind=highpass cutoff=6000 q=0.7071

[fx.pluck]
; per-sampler-track chain: the pluck gets its own slap-room
reverb = roomsize=0.35 damping=0.7 wet=0.2 dry=0.9 tail=0.25

[fx.pad]
; sidechain ducking (round 3): the pad pumps under the kick
compress = threshold_db=-14 ratio=8 attack=0.002 release=0.11 sidechain=kick

[fx]
compress = threshold_db=-11 ratio=3 attack=0.004 release=0.1 makeup_db=1
filter = kind=lowpass cutoff=9000 q=0.7071
reverb = roomsize=0.5 damping=0.55 wet=0.12 dry=0.95 tail=0.5

[automation]
track.hat.volume = 0:0.5 32:1.0
track.pluck.pan = 0:-0.6 48:0.6
fx.filter.cutoff = 0:900 24:9000 96:9000
fx.reverb.wet = 0:0.08 64:0.2
; recurrence-internal curves (round 3): the compressor releases slower and
; the room grows as the song builds
fx.compress.release = 0:0.05 48:0.25
fx.reverb.roomsize = 0:0.35 64:0.7
master.volume = 0:1 80:1 96:0

[pattern.a]
kick  = X... x... X... x...
snare = .... x... .... o...
hat   = x.o. x.o. x.o. x.oo
pluck = C3 .. E3 G3 .. C4@0.6 .. .. A2 .. C3 E3 .. G3@0.5 .. ..
pad   = C3 - - - - - - - A2 - - - - - - -

[pattern.b]
kick  = X... x..x X... x...
snare = .... x... ..o. x..X
hat   = xxo. x.o. xxo. x.o.
pluck = F3 .. A3 C4 .. F4@0.5 .. .. G2 .. B2 D3 .. G3 .. ..
pad   = F2 - - - - - - - G2 - - - - - - -
"""


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "tracker_song"
    make_kit(outdir)
    with open(os.path.join(outdir, "tracker.ini"), "w") as f:
        f.write(SONG_INI)
    print(f"wrote tracker kit + tracker.ini to {outdir}/")
    print(f"try:  python trackmixer.py {outdir}/tracker.ini -o tracker.wav")


if __name__ == "__main__":
    main()
