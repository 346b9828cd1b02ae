"""Device-resident ``Sample`` PCM buffer and ``LevelMeter``.

TPU-native rebuild of the reference's ``synthplayer/sample.py`` (SURVEY.md
§3.1 rows 2-3): an immutable-metadata, rebindable-buffer PCM sample whose
~30 chainable ops run as jitted XLA programs over an int array held in
device memory (HBM).  The numeric contract for every op is defined by
``goldref.sample.Sample`` (see that module's docstring for the tolerance
classes) and enforced in ``tests/test_sample.py``.

Host work is limited to: WAV container I/O, shape bookkeeping, and the
seconds->frames conversions; all per-sample arithmetic happens on device.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import params
from .ops import pcm as dpcm
from .ops import resample as dresample
from .utils import wavio

_DTYPES = {1: jnp.int8, 2: jnp.int16, 4: jnp.int32}
_NPDT = {1: np.int8, 2: np.int16, 4: np.int32}
MAXVAL = dpcm.MAXVAL
MINVAL = dpcm.MINVAL


@jax.jit
def _fadein_kernel(head: jax.Array, start_volume: jax.Array) -> jax.Array:
    n = head.shape[0]
    i = jnp.arange(n, dtype=jnp.float32)
    g = start_volume + (jnp.float32(1.0) - start_volume) * (i / jnp.float32(n))
    return dpcm.gain_apply(head, g[:, None])


@jax.jit
def _fadeout_kernel(tail: jax.Array, target_volume: jax.Array) -> jax.Array:
    n = tail.shape[0]
    j = jnp.arange(n, dtype=jnp.float32)
    g = target_volume + (jnp.float32(1.0) - target_volume) * \
        ((jnp.float32(n) - jnp.float32(1.0) - j) / jnp.float32(n))
    return dpcm.gain_apply(tail, g[:, None])


@jax.jit
def _pan_kernel(a: jax.Array, amounts: jax.Array) -> jax.Array:
    la = jnp.minimum(jnp.float32(1.0), jnp.float32(1.0) - amounts)
    ra = jnp.minimum(jnp.float32(1.0), jnp.float32(1.0) + amounts)
    return dpcm.gain_apply(a, jnp.stack([la, ra], axis=-1))


class Sample:
    """A device-resident PCM sample with chainable in-place DSP ops.

    API-compatible with the reference's ``Sample`` (SURVEY.md §3.2): ops
    mutate in place and return ``self`` for chaining.  The frames live on
    device as a ``[nframes, nchannels]`` int array.
    """

    def __init__(self, wave_file=None, name: str = ""):
        self.name = name
        if wave_file is not None:
            frames, rate, width, nch = wavio.read_wav(wave_file)
            self._data = jnp.asarray(frames)
            self._samplerate = rate
            self._samplewidth = width
            self._nchannels = nch
            if isinstance(wave_file, str) and not name:
                self.name = wave_file
        else:
            self._data = jnp.zeros((0, params.norm_nchannels),
                                   _DTYPES[params.norm_samplewidth])
            self._samplerate = params.norm_samplerate
            self._samplewidth = params.norm_samplewidth
            self._nchannels = params.norm_nchannels

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_raw_frames(cls, frames: bytes, samplewidth: int, samplerate: int,
                        nchannels: int, name: str = "") -> "Sample":
        s = cls(name=name)
        a = np.frombuffer(frames, dtype=_NPDT[samplewidth]).reshape(-1, nchannels)
        s._data = jnp.asarray(a)
        s._samplerate, s._samplewidth, s._nchannels = samplerate, samplewidth, nchannels
        return s

    @classmethod
    def from_array(cls, array, samplerate: int, nchannels: int,
                   name: str = "") -> "Sample":
        """From a sequence of ints (int16 range) or floats in [-1, 1]."""
        a = np.asarray(array)
        if a.dtype.kind == "f":
            a = np.clip(np.rint(a * 32767.0), -32768, 32767).astype(np.int16)
        elif a.dtype != np.int16:
            a = a.astype(np.int16)
        s = cls(name=name)
        s._data = jnp.asarray(a.reshape(-1, nchannels))
        s._samplerate, s._samplewidth, s._nchannels = samplerate, 2, nchannels
        return s

    @classmethod
    def from_jax(cls, data: jax.Array, samplerate: int, samplewidth: int,
                 name: str = "") -> "Sample":
        """Wrap an existing on-device [n, ch] int array (no copy)."""
        s = cls(name=name)
        assert data.ndim == 2 and data.dtype == _DTYPES[samplewidth]
        s._data = data
        s._samplerate, s._samplewidth, s._nchannels = samplerate, samplewidth, data.shape[1]
        return s

    def copy(self) -> "Sample":
        s = Sample(name=self.name)
        s._data = self._data  # jax arrays are immutable: sharing is a copy
        s._samplerate, s._samplewidth, s._nchannels = \
            self._samplerate, self._samplewidth, self._nchannels
        return s

    dup = copy

    # -- introspection -------------------------------------------------------

    @property
    def samplerate(self) -> int:
        return self._samplerate

    @samplerate.setter
    def samplerate(self, rate: int) -> None:
        """Change the rate metadata only (alters pitch/duration)."""
        assert rate > 0
        self._samplerate = int(rate)

    @property
    def samplewidth(self) -> int:
        return self._samplewidth

    @property
    def nchannels(self) -> int:
        return self._nchannels

    @property
    def nframes(self) -> int:
        return int(self._data.shape[0])

    @property
    def duration(self) -> float:
        return self.nframes / self._samplerate

    @property
    def maxvalue(self) -> int:
        return MAXVAL[self._samplewidth]

    @property
    def jax_frames(self) -> jax.Array:
        """The on-device [nframes, nchannels] int array (no copy)."""
        return self._data

    def __len__(self) -> int:
        return self.nframes

    def __repr__(self) -> str:
        return (f"<Sample '{self.name}' {self.duration:.3f}s "
                f"{self._samplerate}Hz {8 * self._samplewidth}bit "
                f"{self._nchannels}ch on {self._data.device}>")

    def __eq__(self, other) -> bool:
        if not isinstance(other, Sample):
            return NotImplemented
        return (self._samplerate, self._samplewidth, self._nchannels) == \
               (other._samplerate, other._samplewidth, other._nchannels) and \
               self._data.shape == other._data.shape and \
               bool(jnp.array_equal(self._data, other._data))

    def view_frame_data(self) -> bytes:
        """Raw interleaved little-endian frame bytes (device -> host copy)."""
        return np.asarray(self._data).astype(_NPDT[self._samplewidth]).tobytes()

    def get_frame_array(self) -> np.ndarray:
        """Frames as a host numpy array [nframes, nchannels]."""
        return np.asarray(self._data)

    def _n(self, seconds: float) -> int:
        return int(seconds * self._samplerate)

    # -- WAV I/O --------------------------------------------------------------

    def write_wav(self, file) -> "Sample":
        wavio.write_wav(file, np.asarray(self._data), self._samplerate,
                        self._samplewidth, self._nchannels)
        return self

    # -- scaling ---------------------------------------------------------------

    def amplify(self, factor: float) -> "Sample":
        """floor(f32(v) * f32(factor)), clamp (audioop.mul, f32 spec)."""
        self._data = dpcm.mul_floor(self._data, jnp.float32(factor))
        return self

    def amplify_max(self) -> "Sample":
        """Amplify to full scale (factor = maxval / device peak)."""
        peak = int(dpcm.peak(self._data)) if self.nframes else 0
        if peak == 0:
            return self
        return self.amplify(np.float32(self.maxvalue / peak))

    def invert(self) -> "Sample":
        return self.amplify(-1.0)

    def bias(self, amount: int) -> "Sample":
        """Wrapping DC offset (audioop.bias)."""
        self._data = dpcm.bias_wrap(
            self._data, np.asarray(amount).astype(_NPDT[self._samplewidth]))
        return self

    # -- arrangement ------------------------------------------------------------

    def clip(self, start_seconds: float, end_seconds: float) -> "Sample":
        a, b = self._n(start_seconds), self._n(end_seconds)
        self._data = self._data[a:b]
        return self

    def cut(self, start_seconds: float, end_seconds: float) -> "Sample":
        a, b = self._n(start_seconds), self._n(end_seconds)
        self._data = jnp.concatenate([self._data[:a], self._data[b:]], axis=0)
        return self

    def split(self, seconds: float) -> "Sample":
        n = self._n(seconds)
        tail = Sample.from_jax(self._data[n:], self._samplerate,
                               self._samplewidth, self.name)
        self._data = self._data[:n]
        return tail

    def add_silence(self, seconds: float, at_start: bool = False) -> "Sample":
        z = jnp.zeros((self._n(seconds), self._nchannels), self._data.dtype)
        parts = [z, self._data] if at_start else [self._data, z]
        self._data = jnp.concatenate(parts, axis=0)
        return self

    def join(self, other: "Sample") -> "Sample":
        self._check_format(other)
        self._data = jnp.concatenate([self._data, other._data], axis=0)
        return self

    def reverse(self) -> "Sample":
        self._data = self._data[::-1]
        return self

    def delay(self, seconds: float, keep_length: bool = False) -> "Sample":
        n = self._n(abs(seconds))
        if seconds >= 0:
            self.add_silence(seconds, at_start=True)
            if keep_length and n > 0:
                self._data = self._data[:-n] if n <= self.nframes else self._data[:0]
        else:
            self._data = self._data[n:]
            if keep_length:
                self.add_silence(abs(seconds))
        return self

    # -- fades & envelopes --------------------------------------------------------

    def fadein(self, seconds: float, start_volume: float = 0.0) -> "Sample":
        n = min(self._n(seconds), self.nframes)
        if n <= 0:
            return self
        head = _fadein_kernel(self._data[:n], jnp.float32(start_volume))
        self._data = jnp.concatenate([head, self._data[n:]], axis=0)
        return self

    def fadeout(self, seconds: float, target_volume: float = 0.0) -> "Sample":
        n = min(self._n(seconds), self.nframes)
        if n <= 0:
            return self
        tail = _fadeout_kernel(self._data[self.nframes - n:], jnp.float32(target_volume))
        self._data = jnp.concatenate([self._data[:self.nframes - n], tail], axis=0)
        return self

    def envelope(self, attack: float, decay: float, sustainlevel: float,
                 release: float) -> "Sample":
        """ADSR gain curve over the whole buffer (goldref.sample.adsr_gains)."""
        g = dpcm.adsr_ramp(self.nframes, self._samplerate, attack, decay,
                           sustainlevel, release)
        self._data = dpcm.gain_apply(self._data, g[:, None])
        return self

    def modulate_amp(self, modulator) -> "Sample":
        """Per-sample amplitude modulation by a Sample, f32 array, or an
        object exposing ``gains(n)`` (oscillators)."""
        g = _modulator_gains(modulator, self.nframes)
        self._data = dpcm.gain_apply(self._data, g[:, None])
        return self

    # -- mixing ----------------------------------------------------------------

    def mix(self, other: "Sample", other_seconds: Optional[float] = None,
            pad_shortest: bool = True) -> "Sample":
        return self.mix_at(0.0, other, other_seconds, pad_shortest=pad_shortest)

    def mix_at(self, seconds: float, other: "Sample",
               other_seconds: Optional[float] = None,
               pad_shortest: bool = True) -> "Sample":
        """Saturating add of ``other`` at a frame offset (device dynamic-
        update-slice; the trackmixer hot loop, SURVEY.md §4.2)."""
        self._check_format(other)
        ofr = other._data
        if other_seconds is not None:
            ofr = ofr[:other._n(other_seconds)]
        start = self._n(seconds)
        end = start + ofr.shape[0]
        if end > self.nframes:
            if pad_shortest:
                pad = jnp.zeros((end - self.nframes, self._nchannels), self._data.dtype)
                self._data = jnp.concatenate([self._data, pad], axis=0)
            else:
                ofr = ofr[:max(0, self.nframes - start)]
                end = start + ofr.shape[0]
        if ofr.shape[0] == 0:
            return self
        region = jax.lax.dynamic_slice_in_dim(self._data, start, ofr.shape[0], 0)
        mixed = dpcm.sat_add(region, ofr)
        self._data = jax.lax.dynamic_update_slice_in_dim(self._data, mixed, start, 0)
        return self

    def echo(self, length: float, amount: int, delay: float, decay: float) -> "Sample":
        """Feed-forward echo (spec: goldref.sample.Sample.echo)."""
        orig = self.copy()
        total = self._n(length)
        if total > self.nframes:
            self.add_silence((total - self.nframes) / self._samplerate)
        else:
            self._data = self._data[:total]
        gain = 1.0
        for k in range(1, amount + 1):
            gain *= decay
            self.mix_at(k * delay, orig.copy().amplify(gain), pad_shortest=False)
        return self

    # -- format conversion ---------------------------------------------------------

    def make_32bit(self, scale_amplitude: bool = True) -> "Sample":
        if self._samplewidth == 4:
            return self
        if scale_amplitude:
            self._data = dpcm.lin2lin(self._data, 4)
        else:
            self._data = self._data.astype(jnp.int32)
        self._samplewidth = 4
        return self

    def make_16bit(self, maximize_amplitude: bool = True) -> "Sample":
        if maximize_amplitude:
            self.amplify_max()
        if self._samplewidth != 2:
            self._data = dpcm.lin2lin(self._data, 2)
            self._samplewidth = 2
        return self

    def _ratecv(self, inrate: int, outrate: int) -> jax.Array:
        """Exact ratecv; stays on device when the int32 path applies."""
        import math as _math
        g = _math.gcd(inrate, outrate)
        outr = outrate // g
        if self._samplewidth <= 2 and outr < (1 << (32 - 8 * self._samplewidth)):
            return dresample.resample_jax(self._data, inrate, outrate)
        y, _ = dresample.resample(np.asarray(self._data), inrate, outrate,
                                  width=self._samplewidth)
        return jnp.asarray(y)

    def resample(self, samplerate: int) -> "Sample":
        if samplerate == self._samplerate:
            return self
        self._data = self._ratecv(self._samplerate, samplerate)
        self._samplerate = samplerate
        return self

    def speed(self, speed: float) -> "Sample":
        if speed == 1.0:
            return self
        self._data = self._ratecv(int(self._samplerate * speed), self._samplerate)
        return self

    def mono(self, left_factor: float = 1.0, right_factor: float = 1.0) -> "Sample":
        if self._nchannels == 1:
            return self
        self._data = dpcm.to_mono(self._data, jnp.float32(left_factor),
                                  jnp.float32(right_factor))
        self._nchannels = 1
        return self

    def stereo(self, left_factor: float = 1.0, right_factor: float = 1.0) -> "Sample":
        if self._nchannels == 2:
            return self
        self._data = dpcm.to_stereo(self._data, jnp.float32(left_factor),
                                    jnp.float32(right_factor))
        self._nchannels = 2
        return self

    def stereo_mix(self, other: "Sample", other_channel: str,
                   other_mix_factor: float = 1.0) -> "Sample":
        assert other_channel in ("L", "R") and other._nchannels == 1
        if self._nchannels == 1:
            self.stereo()
        scaled = other.copy().amplify(other_mix_factor)
        ch = 0 if other_channel == "L" else 1
        n = min(self.nframes, scaled.nframes)
        col = self._data[:n, ch]
        mixed = dpcm.sat_add(col, scaled._data[:n, 0])
        self._data = self._data.at[:n, ch].set(mixed)
        return self

    def pan(self, amount: float = 0.0, lfo=None) -> "Sample":
        if self._nchannels == 1:
            self.stereo()
        if lfo is None:
            amounts = jnp.full((self.nframes,), jnp.float32(amount))
        else:
            amounts = _modulator_gains(lfo, self.nframes)
        self._data = _pan_kernel(self._data, amounts)
        return self

    # -- chunking -------------------------------------------------------------------

    def chunked_frame_data(self, chunksize_frames: int,
                           repeat: bool = False) -> Iterator[bytes]:
        """Yield raw frame bytes chunk by chunk (host copies of device data)."""
        host = self.get_frame_array()
        n = len(host)
        if repeat:
            i = 0
            while True:
                idx = np.arange(i, i + chunksize_frames) % max(n, 1)
                yield host[idx].astype(_NPDT[self._samplewidth]).tobytes()
                i = (i + chunksize_frames) % max(n, 1)
        else:
            for i in range(0, n, chunksize_frames):
                yield host[i:i + chunksize_frames].astype(_NPDT[self._samplewidth]).tobytes()

    # -- misc ------------------------------------------------------------------------

    def normalize(self) -> "Sample":
        """Convert to the global normalization targets (params module)."""
        self.resample(params.norm_samplerate)
        if self._samplewidth != params.norm_samplewidth:
            if params.norm_samplewidth == 2:
                self.make_16bit(maximize_amplitude=False)
            else:
                self._data = dpcm.lin2lin(self._data, params.norm_samplewidth)
                self._samplewidth = params.norm_samplewidth
        if self._nchannels == 1 and params.norm_nchannels == 2:
            self.stereo()
        elif self._nchannels == 2 and params.norm_nchannels == 1:
            self.mono()
        return self

    def _check_format(self, other: "Sample") -> None:
        if (other._samplerate, other._samplewidth, other._nchannels) != \
                (self._samplerate, self._samplewidth, self._nchannels):
            raise ValueError(
                f"sample format mismatch: {other!r} vs {self!r}")


def _modulator_gains(modulator, n: int) -> jax.Array:
    if isinstance(modulator, Sample):
        g = modulator._data[:, 0].astype(jnp.float32) / jnp.float32(MAXVAL[modulator._samplewidth])
    elif hasattr(modulator, "gains"):
        g = jnp.asarray(modulator.gains(n), dtype=jnp.float32)
    else:
        g = jnp.asarray(np.asarray(modulator, dtype=np.float32))
    if g.shape[0] < n:
        g = jnp.concatenate([g, jnp.ones(n - g.shape[0], jnp.float32)])
    return g[:n]


class LevelMeter:
    """Peak / RMS dB level meter with decay (VU meter).

    Rebuild of the reference's ``LevelMeter`` (SURVEY.md §3.1 row 3): call
    :meth:`update` once per chunk; levels are in dB relative to full scale,
    floored at ``lowest``.  The level decays at 30 dB/s between updates and
    the peak markers hold for 0.4 s before falling.  The per-chunk
    peak/RMS reductions run on device (``ops.pcm.vu_levels``).
    """

    DECAY_DB_PER_SEC = 30.0
    PEAK_HOLD_SEC = 0.4

    def __init__(self, rms_mode: bool = False, lowest: float = -60.0):
        assert lowest < 0
        self.rms_mode = rms_mode
        self.lowest = float(lowest)
        self.level_left = self.level_right = lowest
        self.peak_left = self.peak_right = lowest
        self._peak_left_hold = self._peak_right_hold = 0.0

    def reset(self) -> None:
        self.level_left = self.level_right = self.lowest
        self.peak_left = self.peak_right = self.lowest
        self._peak_left_hold = self._peak_right_hold = 0.0

    def update(self, sample: Sample):
        """Process one sample/chunk; returns (level_l, peak_l, level_r, peak_r)."""
        maxvalue = float(sample.maxvalue)
        data = sample.jax_frames
        if sample.nchannels == 1:
            data = jnp.concatenate([data, data], axis=1)
        pl, pr, msl, msr = (float(x) for x in dpcm.vu_levels(data))
        if self.rms_mode:
            ampl_l = math.sqrt(max(msl, 0.0)) / maxvalue
            ampl_r = math.sqrt(max(msr, 0.0)) / maxvalue
        else:
            ampl_l = pl / maxvalue
            ampl_r = pr / maxvalue
        dt = sample.duration
        decay = self.DECAY_DB_PER_SEC * dt
        db_l = 20.0 * math.log10(ampl_l) if ampl_l > 0 else self.lowest
        db_r = 20.0 * math.log10(ampl_r) if ampl_r > 0 else self.lowest
        db_l = max(db_l, self.lowest)
        db_r = max(db_r, self.lowest)
        self.level_left = max(db_l, self.level_left - decay)
        self.level_right = max(db_r, self.level_right - decay)
        self._peak_left_hold += dt
        self._peak_right_hold += dt
        if db_l >= self.peak_left:
            self.peak_left = db_l
            self._peak_left_hold = 0.0
        elif self._peak_left_hold > self.PEAK_HOLD_SEC:
            self.peak_left = max(self.peak_left - decay, db_l)
        if db_r >= self.peak_right:
            self.peak_right = db_r
            self._peak_right_hold = 0.0
        elif self._peak_right_hold > self.PEAK_HOLD_SEC:
            self.peak_right = max(self.peak_right - decay, db_r)
        return self.level_left, self.peak_left, self.level_right, self.peak_right

    def print(self, bar_width: int = 60):
        """Render a console VU bar (like the reference's console meter)."""
        db_mixed = (self.level_left + self.level_right) / 2
        peak_mixed = (self.peak_left + self.peak_right) / 2
        db_level = int(bar_width - bar_width * db_mixed / self.lowest)
        peak_indicator = int(bar_width - bar_width * peak_mixed / self.lowest)
        db_meter = ("#" * db_level).ljust(bar_width)
        db_meter = db_meter[:peak_indicator] + ":" + db_meter[peak_indicator:]
        print(f"{int(db_mixed):d} dB |{db_meter}| 0 dB", end="\r")
