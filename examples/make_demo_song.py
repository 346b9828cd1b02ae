#!/usr/bin/env python3
"""Generate the demo song assets: drum/instrument WAVs + song .ini.

The reference shipped a samples/ directory with demo WAVs and pattern-song
definitions for trackmixer (SURVEY.md §1).  This script synthesizes an
equivalent kit with the framework itself (no binary assets in the repo) and
writes a playable demo song:

    python examples/make_demo_song.py [outdir]
    python trackmixer.py outdir/demo.ini -o demo.wav
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthesizer_tpu import Sample, WaveSynth, oscillators as osc  # noqa: E402

SR = 44100


def make_kit(outdir: str) -> None:
    synth = WaveSynth(samplerate=SR, samplewidth=2)
    os.makedirs(outdir, exist_ok=True)

    # kick: descending sine thump
    sweep = osc.Sine(55.0, amplitude=0.9,
                     fm_lfo=osc.Linear(0.0, -4e-5, min_value=-0.7),
                     samplerate=SR)
    kick = synth.render_oscillator(
        osc.EnvelopeFilter(sweep, 0.002, 0.18, 0.0, 0.3, 0.05), 0.25, "kick")
    kick.amplify(1.2).fadeout(0.05).stereo().write_wav(os.path.join(outdir, "kick.wav"))

    # snare: noise burst + 180 Hz body
    body = osc.Triangle(180.0, amplitude=0.4, samplerate=SR)
    noise = osc.WhiteNoise(amplitude=0.5, seed=11, samplerate=SR)
    snare = synth.render_oscillator(
        osc.EnvelopeFilter(osc.MixingFilter(body, noise),
                           0.001, 0.12, 0.0, 0.2, 0.03), 0.16, "snare")
    snare.fadeout(0.05).stereo().write_wav(os.path.join(outdir, "snare.wav"))

    # closed hat: short bright noise
    hat = synth.white_noise(duration=0.05, amplitude=0.35, seed=7)
    hat.fadeout(0.04).stereo().write_wav(os.path.join(outdir, "hat.wav"))

    # open hat
    ohat = synth.white_noise(duration=0.22, amplitude=0.3, seed=8)
    ohat.fadeout(0.2).stereo().write_wav(os.path.join(outdir, "openhat.wav"))

    # bass pluck
    pluck = osc.EnvelopeFilter(
        osc.Harmonics(82.4, [(1, 0.7), (2, 0.35), (3, 0.18)], samplerate=SR),
        0.004, 0.25, 0.0, 0.3, 0.05)
    synth.render_oscillator(pluck, 0.3, "bass").stereo().write_wav(
        os.path.join(outdir, "bass.wav"))

    # melodic sampler source: a plucked C4 the [sampler.pluckgtr]
    # track repitches per note (tracker-style)
    synth.pluck(261.6255653005986, 0.35, amplitude=0.55, seed=14,
                damping=1.3).fadeout(0.05).stereo().write_wav(
        os.path.join(outdir, "pluckgtr.wav"))

    # stab chord
    stab = osc.EnvelopeFilter(
        osc.MixingFilter(
            osc.Sawtooth(220.0, amplitude=0.2, samplerate=SR),
            osc.Sawtooth(277.2, amplitude=0.2, samplerate=SR),
            osc.Sawtooth(329.6, amplitude=0.2, samplerate=SR)),
        0.005, 0.2, 0.0, 0.4, 0.08)
    synth.render_oscillator(stab, 0.3, "stab").stereo().write_wav(
        os.path.join(outdir, "stab.wav"))


SONG_INI = """\
; demo song for synthesizer_tpu trackmixer
[song]
bpm = 128
ticks = 4
patterns = intro main main fill main main outro

[paths]
samples = .

[instruments]
kick = kick.wav
snare = snare.wav
hat = hat.wav
openhat = openhat.wav
bass = bass.wav
stab = stab.wav

[synth.lead]
wave = square_bl
amplitude = 0.22
attack = 0.008
decay = 0.04
sustain_level = 0.6
release = 0.09
pan = 0.25

[sampler.pluckgtr]
; tracker-style pitched sample playback (beyond-reference)
file = pluckgtr.wav
base_note = C4

[synth.gtr]
; Karplus-Strong plucked string (beyond-reference physical modeling)
wave = pluck
amplitude = 0.3
damping = 1.4
seed = 4
attack = 0.0
decay = 0.0
sustain_level = 1.0
release = 0.12
pan = -0.35

[synth.sub]
wave = sine
amplitude = 0.35
attack = 0.004
decay = 0.03
sustain_level = 0.8
release = 0.06
pan = -0.1

[fx]
; master bus: gentle glue compression + a small room, a tempo-synced
; slapback, and a safety brickwall (all beyond-reference)
compress = threshold_db=-10 ratio=3 attack=0.004 release=0.12 makeup_db=1.5
reverb = roomsize=0.45 damping=0.6 wet=0.14 dry=0.95 tail=0.6
echo = beats=0.75 feedback=0.25 wet=0.12
limiter = ceiling_db=-0.5 lookahead=0.004

[fx.lead]
; per-synth-track chain: the lead gets its own chorus bus
chorus = rate=1.2 depth=0.002 delay=0.014 wet=0.35

[automation]
; hats ride up across the song; the whole mix fades over the outro
track.hat.volume = 0:0.6 48:1.0
fx.reverb.wet = 0:0.10 64:0.22
fx.echo.wet = 0:0.06 64:0.16
master.volume = 0:1 96:1 112:0

[pattern.intro]
hat   = x.x. x.x. x.x. x.x.
kick  = x... .... x... ....

[pattern.main]
kick  = x... x... x... x...
snare = .... x... .... x...
hat   = x.x. x.x. x.x. x.xx
bass  = x... ..x. x... ..x.
stab  = .... .... x... ....
lead  = E4 .. G4 A4 -  .. E5 D5 -  .. A4 -  G4 .. E4 -
gtr   = E3 .. .. B3 .. .. G3 .. E3 .. .. B2 .. .. A2 ..
pluckgtr = .. E4 .. .. G4 .. .. B4 .. E5 .. .. B4 .. G4 ..
sub   = E2 -  -  -  A1 -  -  -  C2 -  -  -  B1 -  -  -

[pattern.fill]
kick  = x... x... x... xxxx
snare = .... x... .x.x xxxx
hat   = x.x. x.x. x.x. ....
openhat = .... .... .... x...

[pattern.outro]
kick  = x... .... x... ....
openhat = x... .... .... ....
bass  = x... .... ..x. ....
sub   = E1 -  -  -  -  -  -  -  -  -  -  -  -  -  -  -
"""


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "demo_song"
    make_kit(outdir)
    with open(os.path.join(outdir, "demo.ini"), "w") as f:
        f.write(SONG_INI)
    print(f"wrote demo kit + demo.ini to {outdir}/")
    print(f"try:  python trackmixer.py {outdir}/demo.ini -o demo.wav")


if __name__ == "__main__":
    main()
