"""Golden-oracle ``Sample``: the op-level behavioral spec.

Host-side numpy implementation of the reference's ``synthplayer.sample.Sample``
op set (SURVEY.md §3.1 row 2, §3.2).  Because the mounted reference is a
tombstone, the semantics written down here — in each method's docstring — ARE
the contract; ``synthesizer_tpu.sample.Sample`` (the device implementation)
is tested against this class: bit-exact for integer/arrangement ops and
single-product scaling ops, ≤1 LSB for gain-ramp ops (fades/envelope/LFO pan,
where backend FMA contraction is permitted).

Numeric conventions (shared with the device implementation):

* frames: signed int8/int16/int32 for widths 1/2/4, shape [nframes, nch];
* float-factor scaling: IEEE float32 product, floor, clamp;
* gain ramps (fades, ADSR, pan LFO): gains computed in float32 with the
  formulas documented on each method;
* mixing: element-wise saturating add at the sample's width (audioop.add);
* width conversion: shift semantics (audioop.lin2lin);
* resampling: audioop.ratecv recurrence (goldref.pcm.ratecv).
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import numpy as np

from . import pcm

_DTYPES = {1: np.int8, 2: np.int16, 4: np.int32}
MAXVAL = {1: 127, 2: 32767, 4: 2147483647}
MINVAL = {1: -128, 2: -32768, 4: -2147483648}


def _f32(x) -> np.float32:
    return np.float32(x)


def _bounded_ratio(outrate: int, inrate: int, maxterm: int):
    """Best rational approximation (L, M) of outrate/inrate with both
    terms <= maxterm (continued-fraction convergent) — the
    speed(quality='hq') ratio-snapping spec.  If the reduced ratio
    already fits, it is returned unchanged."""
    from fractions import Fraction
    if outrate < 1 or inrate < 1:
        raise ValueError("rates must be positive")
    g = math.gcd(int(inrate), int(outrate))
    if max(inrate // g, outrate // g) <= maxterm:
        return outrate // g, inrate // g
    limit = min(maxterm, maxterm * inrate // outrate)
    while limit >= 1:
        f = Fraction(int(outrate), int(inrate)).limit_denominator(limit)
        if f.numerator < 1:
            break
        if max(f.numerator, f.denominator) <= maxterm:
            return f.numerator, f.denominator
        limit -= 1
    raise ValueError(
        f"speed ratio {inrate}/{outrate} is beyond the {maxterm}x range "
        f"of the quality='hq' polyphase bank")


def _floor_clamp(v_f32: np.ndarray, width: int) -> np.ndarray:
    v = np.floor(v_f32.astype(np.float64))
    return np.clip(v, MINVAL[width], MAXVAL[width]).astype(_DTYPES[width])


class Sample:
    """PCM buffer with chainable in-place DSP ops (oracle implementation)."""

    def __init__(self, frames: np.ndarray, samplerate: int, samplewidth: int,
                 nchannels: int, name: str = ""):
        frames = np.asarray(frames, dtype=_DTYPES[samplewidth])
        if frames.ndim == 1:
            frames = frames.reshape(-1, nchannels)
        assert frames.shape[1] == nchannels
        self.frames = frames
        self.samplerate = int(samplerate)
        self.samplewidth = int(samplewidth)
        self.nchannels = int(nchannels)
        self.name = name

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_raw_frames(cls, frames: bytes, samplewidth: int, samplerate: int,
                        nchannels: int, name: str = "") -> "Sample":
        a = pcm.frombytes(frames, samplewidth).reshape(-1, nchannels)
        return cls(a, samplerate, samplewidth, nchannels, name)

    def copy(self) -> "Sample":
        return Sample(self.frames.copy(), self.samplerate, self.samplewidth,
                      self.nchannels, self.name)

    # -- introspection ------------------------------------------------------

    @property
    def nframes(self) -> int:
        return self.frames.shape[0]

    @property
    def duration(self) -> float:
        return self.nframes / self.samplerate

    @property
    def maxvalue(self) -> int:
        return MAXVAL[self.samplewidth]

    def view_frame_data(self) -> bytes:
        return pcm.tobytes(self.frames.reshape(-1), self.samplewidth)

    def _n(self, seconds: float) -> int:
        """Seconds -> frame count: int truncation (reference convention)."""
        return int(seconds * self.samplerate)

    # -- scaling ------------------------------------------------------------

    def amplify(self, factor: float) -> "Sample":
        """Scale all samples: floor(f32(v) * f32(factor)), clamp."""
        v = self.frames.astype(np.float32) * _f32(factor)
        self.frames = _floor_clamp(v, self.samplewidth)
        return self

    def amplify_max(self) -> "Sample":
        """Amplify to full scale: factor = f32(maxval) / f32(peak), a single-
        precision division (device parity: the factor is computed in-graph
        on device, so the whole op stages without a host sync).  No-op if
        silent."""
        peak = pcm.max_(self.view_frame_data(), self.samplewidth)
        if peak == 0:
            return self
        return self.amplify(np.float32(self.maxvalue) / np.float32(peak))

    def invert(self) -> "Sample":
        """Multiply by -1 (mul semantics: -MIN clamps to MAX)."""
        return self.amplify(-1.0)

    def bias(self, amount: int) -> "Sample":
        """Add a DC offset with wrap-around (audioop.bias)."""
        frag = pcm.bias(self.view_frame_data(), self.samplewidth, int(amount))
        self.frames = pcm.frombytes(frag, self.samplewidth).reshape(-1, self.nchannels)
        return self

    # -- arrangement --------------------------------------------------------

    def clip(self, start_seconds: float, end_seconds: float) -> "Sample":
        """Keep only [start, end) (frame indices truncate from seconds)."""
        a, b = self._n(start_seconds), self._n(end_seconds)
        self.frames = self.frames[a:b]
        return self

    def cut(self, start_seconds: float, end_seconds: float) -> "Sample":
        """Remove [start, end)."""
        a, b = self._n(start_seconds), self._n(end_seconds)
        self.frames = np.concatenate([self.frames[:a], self.frames[b:]], axis=0)
        return self

    def split(self, seconds: float) -> "Sample":
        """Truncate self at ``seconds``; return the chopped-off tail."""
        n = self._n(seconds)
        tail = Sample(self.frames[n:].copy(), self.samplerate, self.samplewidth,
                      self.nchannels, self.name)
        self.frames = self.frames[:n]
        return tail

    def add_silence(self, seconds: float, at_start: bool = False) -> "Sample":
        """Append (or prepend) silence."""
        z = np.zeros((self._n(seconds), self.nchannels), self.frames.dtype)
        parts = [z, self.frames] if at_start else [self.frames, z]
        self.frames = np.concatenate(parts, axis=0)
        return self

    def join(self, other: "Sample") -> "Sample":
        """Append another sample (formats must match)."""
        assert (other.samplerate, other.samplewidth, other.nchannels) == \
               (self.samplerate, self.samplewidth, self.nchannels)
        self.frames = np.concatenate([self.frames, other.frames], axis=0)
        return self

    def reverse(self) -> "Sample":
        """Reverse frame order (channels stay in place)."""
        self.frames = self.frames[::-1].copy()
        return self

    def delay(self, seconds: float, keep_length: bool = False) -> "Sample":
        """Shift audio later in time by prepending silence; with
        ``keep_length`` the result is trimmed back to the original length.
        Negative seconds shift earlier (cut from the start, optionally
        padding the end to keep length)."""
        n = self._n(abs(seconds))
        if seconds >= 0:
            self.add_silence(seconds, at_start=True)
            if keep_length and n > 0:
                self.frames = self.frames[:-n] if n <= self.nframes else self.frames[:0]
        else:
            self.frames = self.frames[n:]
            if keep_length:
                self.add_silence(abs(seconds))
        return self

    # -- fades & envelopes (gain ramps, f32 spec) ---------------------------

    def fadein(self, seconds: float, start_volume: float = 0.0) -> "Sample":
        """Linear fade-in over the first ``seconds``:
        gain_i = start + (1-start) * (i / nfade), f32, floor, clamp."""
        n = min(self._n(seconds), self.nframes)
        if n <= 0:
            return self
        i = np.arange(n, dtype=np.float32)
        g = _f32(start_volume) + (_f32(1.0) - _f32(start_volume)) * (i / _f32(n))
        head = self.frames[:n].astype(np.float32) * g[:, None]
        self.frames = np.concatenate(
            [_floor_clamp(head, self.samplewidth), self.frames[n:]], axis=0)
        return self

    def fadeout(self, seconds: float, target_volume: float = 0.0) -> "Sample":
        """Linear fade-out over the last ``seconds``:
        gain_j = target + (1-target) * ((nfade-1-j) / nfade), f32."""
        n = min(self._n(seconds), self.nframes)
        if n <= 0:
            return self
        j = np.arange(n, dtype=np.float32)
        g = _f32(target_volume) + (_f32(1.0) - _f32(target_volume)) * \
            ((_f32(n) - _f32(1.0) - j) / _f32(n))
        tail = self.frames[self.nframes - n:].astype(np.float32) * g[:, None]
        self.frames = np.concatenate(
            [self.frames[:self.nframes - n], _floor_clamp(tail, self.samplewidth)], axis=0)
        return self

    def envelope(self, attack: float, decay: float, sustainlevel: float,
                 release: float) -> "Sample":
        """Apply an ADSR gain curve over the whole buffer (f32):

        t = i / samplerate;
        attack:  g = t/attack                      for t < attack
        decay:   g = 1 + (sustain-1)*(t-attack)/decay
        sustain: g = sustainlevel
        release: over the final ``release`` seconds, g *= (dur-t)/release
        """
        n = self.nframes
        g = adsr_gains(n, self.samplerate, attack, decay, sustainlevel, release)
        v = self.frames.astype(np.float32) * g[:, None]
        self.frames = _floor_clamp(v, self.samplewidth)
        return self

    def modulate_amp(self, modulator) -> "Sample":
        """Per-sample amplitude modulation.

        ``modulator`` may be a float32 gain array (frames-long, applied to all
        channels), another Sample (gains = f32(v)/f32(maxval)), or any object
        with ``gains(n)`` returning f32 gains (oscillators).
        """
        g = _modulator_gains(modulator, self.nframes)
        v = self.frames.astype(np.float32) * g[:, None]
        self.frames = _floor_clamp(v, self.samplewidth)
        return self

    # -- mixing -------------------------------------------------------------

    def mix(self, other: "Sample", other_seconds: Optional[float] = None,
            pad_shortest: bool = True) -> "Sample":
        """Saturating element-wise add of another sample from t=0.

        ``other_seconds`` clips the other sample first; with ``pad_shortest``
        the result has the longer duration (shorter padded with silence),
        otherwise the other is clipped to self's length.
        """
        return self.mix_at(0.0, other, other_seconds, pad_shortest=pad_shortest)

    def mix_at(self, seconds: float, other: "Sample",
               other_seconds: Optional[float] = None,
               pad_shortest: bool = True) -> "Sample":
        """Saturating add of ``other`` starting at ``seconds``."""
        assert (other.samplerate, other.samplewidth, other.nchannels) == \
               (self.samplerate, self.samplewidth, self.nchannels)
        ofr = other.frames
        if other_seconds is not None:
            ofr = ofr[:other._n(other_seconds)]
        start = self._n(seconds)
        end = start + len(ofr)
        if end > self.nframes:
            if pad_shortest:
                pad = np.zeros((end - self.nframes, self.nchannels), self.frames.dtype)
                self.frames = np.concatenate([self.frames, pad], axis=0)
            else:
                ofr = ofr[:max(0, self.nframes - start)]
                end = start + len(ofr)
        region = self.frames[start:end]
        mixed = pcm.frombytes(
            pcm.add(pcm.tobytes(region.reshape(-1), self.samplewidth),
                    pcm.tobytes(ofr.reshape(-1), self.samplewidth),
                    self.samplewidth),
            self.samplewidth).reshape(-1, self.nchannels)
        out = self.frames.copy()
        out[start:end] = mixed
        self.frames = out
        return self

    def echo(self, length: float, amount: int, delay: float, decay: float) -> "Sample":
        """Feed-forward echo: result is ``length`` seconds long; echo k
        (k=1..amount) is the original scaled by the f32 cumulative product
        decay_k = f32(decay_{k-1} * f32(decay)) (floor/clamp) mixed in
        (saturating) at offset k*delay seconds.  The gain recurrence is
        single-precision so the device can stage it in-graph."""
        orig = self.copy()
        total = self._n(length)
        if total > self.nframes:
            pad = np.zeros((total - self.nframes, self.nchannels), self.frames.dtype)
            self.frames = np.concatenate([self.frames, pad], axis=0)
        else:
            self.frames = self.frames[:total]
        gain = np.float32(1.0)
        for k in range(1, amount + 1):
            gain = np.float32(gain * np.float32(decay))
            copy_k = orig.copy().amplify(gain)
            self.mix_at(k * delay, copy_k, pad_shortest=False)
        return self

    # -- effects rack (beyond-reference; spec: goldref.effects) --------------

    def compress(self, threshold_db: float = -20.0, ratio: float = 4.0,
                 attack: float = 0.005, release: float = 0.1,
                 makeup_db: float = 0.0, knee_db: float = 0.0,
                 sidechain: "Sample" = None) -> "Sample":
        """Peak compressor / limiter (ratio=inf); with ``sidechain`` the
        detector listens to the key sample (ducking).  Spec:
        goldref.effects.compressor_gains / sidechain_level."""
        from . import effects
        self.frames = effects.compress(
            self.frames, self.samplewidth, self.samplerate, threshold_db,
            ratio, attack, release, makeup_db, knee_db,
            sidechain=None if sidechain is None else sidechain.frames,
            sidechain_width=2 if sidechain is None else sidechain.samplewidth)
        return self

    def reverb(self, roomsize: float = 0.7, damping: float = 0.5,
               wet: float = 0.33, dry: float = 0.7, width: float = 1.0,
               tail: float = 1.5) -> "Sample":
        """Freeverb-style reverb; extends the sample by ``tail`` seconds of
        decay.  Spec: goldref.effects.reverb."""
        from . import effects
        self.frames = effects.reverb(self.frames, self.samplewidth,
                                     self.samplerate, roomsize, damping, wet,
                                     dry, width, self._n(tail))
        return self

    def chorus(self, rate: float = 0.5, depth: float = 0.002,
               delay: float = 0.02, voices: int = 3, wet: float = 0.4,
               dry: float = 1.0) -> "Sample":
        """Multi-voice chorus; spec: goldref.effects.chorus."""
        from . import effects
        self.frames = effects.chorus(self.frames, self.samplewidth,
                                     self.samplerate, rate, depth, delay,
                                     voices, wet, dry)
        return self

    def filter(self, kind: str, cutoff: float, q: float = 0.7071,
               gain_db: float = 0.0) -> "Sample":
        """Resonant RBJ biquad on the PCM (lowpass/highpass/bandpass plus
        the gain kinds lowshelf/highshelf/peaking); spec:
        goldref.effects.biquad_filter / goldref.spec.eq_band_coeffs."""
        from . import effects
        if kind in ("lowshelf", "highshelf", "peaking"):
            self.frames = effects.eq(self.frames, self.samplewidth,
                                     self.samplerate,
                                     [(kind, cutoff, gain_db, q)])
        else:
            self.frames = effects.biquad_filter(
                self.frames, self.samplewidth, self.samplerate, kind,
                cutoff, q)
        return self

    def eq(self, low_db: float = 0.0, mid_db: float = 0.0,
           high_db: float = 0.0, low_freq: float = 120.0,
           mid_freq: float = 1000.0, mid_q: float = 1.0,
           high_freq: float = 8000.0) -> "Sample":
        """Three-band parametric EQ (low shelf / peaking mid / high
        shelf; zero-gain bands skipped); spec: goldref.effects.eq."""
        from . import effects
        bands = [(kind, f, g, q)
                 for kind, f, g, q in (("lowshelf", low_freq, low_db,
                                        0.7071),
                                       ("peaking", mid_freq, mid_db,
                                        mid_q),
                                       ("highshelf", high_freq, high_db,
                                        0.7071))
                 if g != 0.0]
        self.frames = effects.eq(self.frames, self.samplewidth,
                                 self.samplerate, bands)
        return self

    def loudness_lufs(self) -> float:
        """Integrated loudness (LUFS); spec: goldref.effects.loudness_lufs."""
        from . import effects
        return effects.loudness_lufs(self.frames, self.samplewidth,
                                     self.samplerate)

    def loudness_stats(self) -> dict:
        """EBU R128 meter set; spec: goldref.effects.loudness_stats."""
        from . import effects
        return effects.loudness_stats(self.frames, self.samplewidth,
                                      self.samplerate)

    def true_peak_dbtp(self) -> float:
        """True peak (dBTP); spec: goldref.effects.true_peak_dbtp."""
        from . import effects
        return effects.true_peak_dbtp(self.frames, self.samplewidth,
                                      self.samplerate)

    def gate(self, threshold_db: float = -50.0, range_db: float = 80.0,
             attack: float = 0.001, release: float = 0.05) -> "Sample":
        """Noise gate; spec: goldref.effects.gate_gains."""
        from . import effects
        self.frames = effects.gate(self.frames, self.samplewidth,
                                   self.samplerate, threshold_db, range_db,
                                   attack, release)
        return self

    def feedback_echo(self, delay: float, feedback: float = 0.4,
                      wet: float = 0.5, dry: float = 1.0,
                      tail: float = None) -> "Sample":
        """Feedback delay; spec: goldref.effects.feedback_echo (extends
        by the echo_tail_frames decay-room rule)."""
        from . import effects
        tf = effects.echo_tail_frames(self.samplerate, delay, feedback,
                                      wet, tail)
        self.frames = effects.feedback_echo(
            self.frames, self.samplewidth, self.samplerate, delay,
            feedback, wet, dry, tf)
        return self

    def stereo_width(self, amount: float) -> "Sample":
        """Mid/side width; spec: goldref.effects.stereo_width."""
        from . import effects
        self.frames = effects.stereo_width(self.frames, self.samplewidth,
                                           amount)
        return self

    def tremolo(self, rate: float = 5.0, depth: float = 0.5,
                start_frame: int = 0) -> "Sample":
        """LFO amplitude modulation; spec: spec.tremolo_gain_grid +
        effects.tremolo (the house gain rule)."""
        from . import effects, spec
        inc = spec.phase_increment(rate, self.samplerate)
        P = (np.arange(start_frame, start_frame + self.nframes,
                       dtype=np.uint64) * np.uint64(inc)) \
            & np.uint64(0xFFFFFFFF)
        g = spec.tremolo_gain_grid(P, depth)
        self.frames = effects.tremolo(self.frames, self.samplewidth, g)
        return self

    def autopan(self, rate: float = 0.5, depth: float = 1.0,
                start_frame: int = 0) -> "Sample":
        """LFO auto-panner; spec: spec.autopan_pan_grid +
        effects.autopan (equal-gain pan law)."""
        from . import effects, spec
        inc = spec.phase_increment(rate, self.samplerate)
        P = (np.arange(start_frame, start_frame + self.nframes,
                       dtype=np.uint64) * np.uint64(inc)) \
            & np.uint64(0xFFFFFFFF)
        pan = spec.autopan_pan_grid(P, depth)
        self.frames = effects.autopan(self.frames, self.samplewidth, pan)
        return self

    def limit(self, ceiling_db: float = -1.0, release: float = 0.05,
              lookahead: float = 0.005) -> "Sample":
        """Lookahead brickwall limiter; spec:
        goldref.effects.limiter_gains."""
        from . import effects
        self.frames = effects.limiter(self.frames, self.samplewidth,
                                      self.samplerate, ceiling_db, release,
                                      lookahead)
        return self

    def phaser(self, rate: float = 0.5, depth: float = 1.0,
               min_freq: float = 300.0, max_freq: float = 3000.0,
               stages: int = 4, q: float = 0.7071, wet: float = 0.5,
               dry: float = 1.0, grids_dtype=None) -> "Sample":
        """Swept allpass cascade; spec: goldref.effects.phaser
        (``grids_dtype`` matches the evaluator under test — f32 plain
        scan, f64 for the compensated float-float path)."""
        from . import effects
        self.frames = effects.phaser(self.frames, self.samplewidth,
                                     self.samplerate, rate, depth,
                                     min_freq, max_freq, stages, q, wet,
                                     dry, grids_dtype=grids_dtype)
        return self

    def convolve(self, ir: "Sample", wet: float = 1.0,
                 dry: float = 0.0) -> "Sample":
        """Convolve with an impulse-response sample (mono IR applies to all
        channels); extends by len(ir)-1 frames.  Spec:
        goldref.effects.convolve."""
        from . import effects
        if ir.samplerate != self.samplerate:
            raise ValueError("impulse response samplerate mismatch")
        if ir.nchannels not in (1, self.nchannels):
            raise ValueError("impulse response channel mismatch")
        self.frames = effects.convolve(self.frames, self.samplewidth,
                                       ir.frames, ir.samplewidth, wet, dry)
        return self

    def granulate(self, duration: float, grain: float = 0.05,
                  density: float = 25.0, jitter: float = 0.02,
                  amplitude: float = 0.7, seed: int = 0) -> "Sample":
        """Granular resynthesis; spec: goldref.effects.granulate."""
        from . import effects
        self.frames = effects.granulate(self.frames, self.samplewidth,
                                        self.samplerate, duration, grain,
                                        density, jitter, amplitude, seed)
        return self

    def stretch(self, factor: float, frame: int = 2048,
                hop: int = 512) -> "Sample":
        """Phase-vocoder time stretch (duration x factor, pitch kept);
        spec: goldref.effects.stretch."""
        from . import effects
        self.frames = effects.stretch(self.frames, self.samplewidth, factor,
                                      frame, hop)
        return self

    def pitch_shift(self, semitones: float, frame: int = 2048,
                    hop: int = 512) -> "Sample":
        """Shift pitch by equal-tempered semitones, duration preserved:
        DEFINED as stretch(r) followed by speed(r), r = 2**(semitones/12)
        (both component ops are themselves spec'd)."""
        r = 2.0 ** (semitones / 12.0)
        return self.stretch(r, frame, hop).speed(r)

    # -- format conversion ---------------------------------------------------

    def make_32bit(self, scale_amplitude: bool = True) -> "Sample":
        """Convert to 32-bit width.  With ``scale_amplitude`` values are
        widened by shift (lin2lin, x65536 for 16-bit); without, the numeric
        values are preserved (headroom mode for overflow-free mixing)."""
        if self.samplewidth == 4:
            return self
        if scale_amplitude:
            frag = pcm.lin2lin(self.view_frame_data(), self.samplewidth, 4)
            self.frames = pcm.frombytes(frag, 4).reshape(-1, self.nchannels)
        else:
            self.frames = self.frames.astype(np.int32)
        self.samplewidth = 4
        return self

    def make_16bit(self, maximize_amplitude: bool = True) -> "Sample":
        """Convert to 16-bit, optionally amplifying to full scale first."""
        if maximize_amplitude:
            self.amplify_max()
        if self.samplewidth != 2:
            frag = pcm.lin2lin(self.view_frame_data(), self.samplewidth, 2)
            self.frames = pcm.frombytes(frag, 2).reshape(-1, self.nchannels)
            self.samplewidth = 2
        return self

    def resample(self, samplerate: int, quality: str = "linear") -> "Sample":
        """Resample to a new rate (pitch preserved).  quality='linear' is
        the exact audioop ratecv interpolator; quality='hq' is the
        windowed-sinc polyphase resampler (effects.hq_resample) with the
        SAME output length."""
        if samplerate == self.samplerate:
            return self
        if quality == "hq":
            from . import effects
            self.frames = effects.hq_resample(self.frames, self.samplewidth,
                                              self.samplerate, samplerate)
        elif quality == "linear":
            frag, _ = pcm.ratecv(self.view_frame_data(), self.samplewidth,
                                 self.nchannels, self.samplerate, samplerate,
                                 None)
            self.frames = pcm.frombytes(frag, self.samplewidth) \
                .reshape(-1, self.nchannels)
        else:
            raise ValueError(f"unknown resample quality {quality!r}")
        self.samplerate = samplerate
        return self

    def speed(self, speed: float, quality: str = "linear") -> "Sample":
        """Change playback speed (and pitch): resample from rate*speed to
        rate, keeping the sample's samplerate metadata.

        quality='hq' SPEC: the int(samplerate*speed)/samplerate ratio
        snaps to its nearest rational with both terms <= 2048
        (continued-fraction best approximation, _bounded_ratio below) —
        the polyphase bank is L phases of a finite sinc, so unreduced
        semitone-style ratios (e.g. 46723/44100) must land on a bounded
        ratio; the approximation's pitch error (micro-cents in the
        musical range, pinned in tests/test_hq_resample.py) is orders
        below the int() truncation this API has always applied."""
        if speed == 1.0:
            return self
        if quality == "hq":
            from . import effects
            L, M = _bounded_ratio(self.samplerate,
                                  int(self.samplerate * speed), 2048)
            self.frames = effects.hq_resample(self.frames, self.samplewidth,
                                              M, L)
        elif quality == "linear":
            frag, _ = pcm.ratecv(self.view_frame_data(), self.samplewidth,
                                 self.nchannels, int(self.samplerate * speed),
                                 self.samplerate, None)
            self.frames = pcm.frombytes(frag, self.samplewidth) \
                .reshape(-1, self.nchannels)
        else:
            raise ValueError(f"unknown resample quality {quality!r}")
        return self

    def mono(self, left_factor: float = 1.0, right_factor: float = 1.0) -> "Sample":
        """Stereo -> mono: floor(L*lf + R*rf) f32, clamp."""
        if self.nchannels == 1:
            return self
        a = self.frames.astype(np.float32)
        v = a[:, 0] * _f32(left_factor) + a[:, 1] * _f32(right_factor)
        self.frames = _floor_clamp(v, self.samplewidth)[:, None]
        self.nchannels = 1
        return self

    def stereo(self, left_factor: float = 1.0, right_factor: float = 1.0) -> "Sample":
        """Mono -> stereo: per-channel floor(v*f), clamp."""
        if self.nchannels == 2:
            return self
        a = self.frames.astype(np.float32)[:, 0]
        out = np.empty((self.nframes, 2), np.float64)
        out[:, 0] = np.floor(a * _f32(left_factor)).astype(np.float64)
        out[:, 1] = np.floor(a * _f32(right_factor)).astype(np.float64)
        self.frames = np.clip(out, MINVAL[self.samplewidth],
                              MAXVAL[self.samplewidth]).astype(self.frames.dtype)
        self.nchannels = 2
        return self

    def stereo_mix(self, other: "Sample", other_channel: str,
                   other_mix_factor: float = 1.0) -> "Sample":
        """Mix a mono sample into one channel ('L'/'R') of this stereo sample
        (other scaled by f32 factor with floor, then saturating add)."""
        assert other_channel in ("L", "R") and other.nchannels == 1
        if self.nchannels == 1:
            self.stereo()
        scaled = other.copy().amplify(other_mix_factor)
        ch = 0 if other_channel == "L" else 1
        n = min(self.nframes, scaled.nframes)
        col = self.frames[:n, ch]
        mixed = pcm.frombytes(
            pcm.add(pcm.tobytes(col, self.samplewidth),
                    pcm.tobytes(scaled.frames[:n, 0], self.samplewidth),
                    self.samplewidth), self.samplewidth)
        out = self.frames.copy()
        out[:n, ch] = mixed
        self.frames = out
        return self

    def pan(self, amount: float = 0.0, lfo=None) -> "Sample":
        """Pan a stereo sample (balance law, no center attenuation):
        left gain = min(1, 1-amount), right gain = min(1, 1+amount), f32.
        With ``lfo`` (f32 per-frame amounts in [-1, 1]) gains vary per frame.
        Mono samples are converted to stereo first."""
        if self.nchannels == 1:
            self.stereo()
        if lfo is None:
            la = np.float32(min(1.0, 1.0 - amount))
            ra = np.float32(min(1.0, 1.0 + amount))
            a = self.frames.astype(np.float32)
            out = np.empty_like(a)
            out[:, 0] = a[:, 0] * la
            out[:, 1] = a[:, 1] * ra
            self.frames = _floor_clamp(out, self.samplewidth)
        else:
            amt = _modulator_gains(lfo, self.nframes)
            la = np.minimum(np.float32(1.0), np.float32(1.0) - amt)
            ra = np.minimum(np.float32(1.0), np.float32(1.0) + amt)
            a = self.frames.astype(np.float32)
            out = np.empty_like(a)
            out[:, 0] = a[:, 0] * la
            out[:, 1] = a[:, 1] * ra
            self.frames = _floor_clamp(out, self.samplewidth)
        return self

    # -- chunking ------------------------------------------------------------

    def chunked_frame_data(self, chunksize_frames: int, repeat: bool = False) -> Iterator[bytes]:
        """Yield raw frame bytes in fixed-size chunks (last one short unless
        repeating, in which case the stream wraps around forever)."""
        n = self.nframes
        if repeat:
            i = 0
            while True:
                idx = (np.arange(i, i + chunksize_frames) % max(n, 1))
                yield pcm.tobytes(self.frames[idx].reshape(-1), self.samplewidth)
                i = (i + chunksize_frames) % max(n, 1)
        else:
            for i in range(0, n, chunksize_frames):
                yield pcm.tobytes(self.frames[i:i + chunksize_frames].reshape(-1),
                                  self.samplewidth)


def adsr_gains(n: int, samplerate: int, attack: float, decay: float,
               sustain_level: float, release: float) -> np.ndarray:
    """f32 ADSR gain curve over n samples (formula mirrored on device)."""
    i = np.arange(n, dtype=np.float32)
    t = i / np.float32(samplerate)
    a = np.float32(max(attack, 0.0))
    d = np.float32(max(decay, 0.0))
    r = np.float32(max(release, 0.0))
    s = np.float32(sustain_level)
    dur = np.float32(n / samplerate)
    g = np.ones_like(t)
    if a > 0:
        g = np.minimum(g, t / max(a, np.float32(1e-30)))
    in_decay = (t >= a) & (t < a + d)
    g = np.where(in_decay, np.float32(1.0) + (s - np.float32(1.0)) * (t - a) / max(d, np.float32(1e-30)), g)
    g = np.where(t >= a + d, s, g)
    in_rel = t >= dur - r
    rel_gain = g * (dur - t) / max(r, np.float32(1e-30)) if r > 0 else g
    g = np.where(in_rel, rel_gain, g)
    return np.maximum(g, np.float32(0.0))


def _modulator_gains(modulator, n: int) -> np.ndarray:
    if isinstance(modulator, Sample):
        g = modulator.frames[:, 0].astype(np.float32) / _f32(MAXVAL[modulator.samplewidth])
    elif hasattr(modulator, "gains"):
        g = np.asarray(modulator.gains(n), dtype=np.float32)
    else:
        g = np.asarray(modulator, dtype=np.float32)
    if len(g) < n:
        g = np.concatenate([g, np.ones(n - len(g), np.float32)])
    return g[:n]
