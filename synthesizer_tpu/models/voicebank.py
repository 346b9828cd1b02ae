"""Batched voice-bank render engine — the framework's flagship model.

This is the TPU-first replacement for the reference's per-voice generator
pipeline (BASELINE.json north_star: "batched, fused … render whole voice
banks per chunk").  A bank holds V uniform voices described by parameter
*arrays* (structure-of-arrays); one fused device program renders a whole
[V, chunk] block per step: DDS phase accumulation (u32), sine-LFO FM,
waveform evaluation, per-voice ADSR from note start/duration, equal-gain
pan, and the stereo mixdown as a [N, V] x [V, 2] matmul (MXU).  Long renders
scan over chunks with a single carried array (the per-voice FM phase
accumulator), so output is chunk-size invariant.

Numeric spec matches ``models.spec`` with ``fm_lfo = Const(0)`` when a
voice's FM depth is zero: the per-sample increment is
``int32(clamp(f32(base_inc) * (1 + depth*sin(fm_phase))))`` (see
tests/test_voicebank.py for the oracle equivalence).

Voice waveforms: 0=sine 1=triangle 2=square 3=sawtooth 4=pulse 5=semicircle
6=pointy 7=white_noise 8=harmonics (integer partials 1..H with per-voice
amplitudes).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import spec as S

_TWO_PI = np.float32(2.0 * math.pi)
_TWO_NEG32 = np.float32(2.0 ** -32)

WAVE_IDS = {
    "sine": 0, "triangle": 1, "square": 2, "sawtooth": 3, "pulse": 4,
    "semicircle": 5, "pointy": 6, "white_noise": 7, "harmonics": 8,
}


class VoiceParams(NamedTuple):
    """Structure-of-arrays voice parameters; every field has shape [V]
    (except harm_amps: [V, H])."""
    wave: jax.Array        # i32 waveform id
    base_inc: jax.Array    # u32 DDS increment
    phase0: jax.Array      # u32 initial phase
    amp: jax.Array         # f32
    bias: jax.Array        # f32
    pan: jax.Array         # f32 in [-1, 1]
    start: jax.Array       # i32 note start frame
    gate: jax.Array        # i32 gate duration in frames (before release)
    attack: jax.Array      # f32 seconds
    decay: jax.Array       # f32 seconds
    sustain_level: jax.Array  # f32
    release: jax.Array     # f32 seconds
    fm_inc: jax.Array      # u32 FM LFO increment
    fm_phase0: jax.Array   # u32
    fm_depth: jax.Array    # f32 (0 = no FM)
    pulse_width: jax.Array  # f32
    seed: jax.Array        # u32 noise seed
    harm_amps: jax.Array   # f32 [V, H] partial amplitudes (wave id 8)


@dataclasses.dataclass(frozen=True)
class Voice:
    """Host-side description of one voice (converted into VoiceParams)."""
    wave: str = "sine"
    frequency: float = 440.0
    amplitude: float = 1.0
    phase: float = 0.0
    bias: float = 0.0
    pan: float = 0.0
    start: float = 0.0          # seconds
    duration: float = 1.0       # gate seconds (release follows)
    attack: float = 0.01
    decay: float = 0.05
    sustain_level: float = 0.8
    release: float = 0.05
    fm_frequency: float = 0.0
    fm_depth: float = 0.0
    fm_phase: float = 0.0
    pulse_width: float = 0.5
    seed: int = 0
    harmonics: Sequence[float] = ()   # partial amps for wave="harmonics"


def pack_voices(voices: Sequence[Voice], samplerate: int,
                num_harmonics: int = 8, pad_to: int = 8) -> VoiceParams:
    """Pack host voice descriptions into device parameter arrays.

    Pads the voice count up to a multiple of ``pad_to`` with silent voices
    (amp 0) so shapes stay friendly to tiling and sharding.
    """
    v = len(voices)
    V = max(pad_to, -(-v // pad_to) * pad_to)
    H = num_harmonics

    def arr(fn, dtype):
        out = np.zeros(V, dtype)
        for i, vc in enumerate(voices):
            out[i] = fn(vc)
        return jnp.asarray(out)

    harm = np.zeros((V, H), np.float32)
    for i, vc in enumerate(voices):
        for j, a in enumerate(vc.harmonics[:H]):
            harm[i, j] = a
    return VoiceParams(
        wave=arr(lambda x: WAVE_IDS[x.wave], np.int32),
        base_inc=arr(lambda x: S.phase_increment(x.frequency, samplerate), np.uint32),
        phase0=arr(lambda x: S.phase_offset(x.phase), np.uint32),
        amp=arr(lambda x: x.amplitude, np.float32),
        bias=arr(lambda x: x.bias, np.float32),
        pan=arr(lambda x: x.pan, np.float32),
        start=arr(lambda x: int(x.start * samplerate), np.int32),
        gate=arr(lambda x: int(x.duration * samplerate), np.int32),
        attack=arr(lambda x: x.attack, np.float32),
        decay=arr(lambda x: x.decay, np.float32),
        sustain_level=arr(lambda x: x.sustain_level, np.float32),
        release=arr(lambda x: x.release, np.float32),
        fm_inc=arr(lambda x: S.phase_increment(x.fm_frequency, samplerate), np.uint32),
        fm_phase0=arr(lambda x: S.phase_offset(x.fm_phase), np.uint32),
        fm_depth=arr(lambda x: x.fm_depth, np.float32),
        pulse_width=arr(lambda x: min(max(x.pulse_width, 1.0 / 65536.0),
                                      1.0 - 1.0 / 65536.0), np.float32),
        seed=arr(lambda x: x.seed & 0xFFFFFFFF, np.uint32),
        harm_amps=jnp.asarray(harm),
    )


# ---------------------------------------------------------------------------
# Waveform evaluation (vectorized over [V, N])
# ---------------------------------------------------------------------------

def _phase_x(p):
    return p.astype(jnp.float32) * _TWO_NEG32


def _triangle(x):
    four = jnp.float32(4.0)
    return jnp.where(x < 0.25, four * x,
                     jnp.where(x < 0.75, jnp.float32(2.0) - four * x,
                               four * x - four))


def _noise(idx, seed):
    x = idx.astype(jnp.uint32) * jnp.uint32(0x9E3779B9) + seed[:, None]
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return (x >> 8).astype(jnp.float32) * jnp.float32(2.0 ** -23) - jnp.float32(1.0)


def _wave_select(p: jax.Array, vp: VoiceParams, n: jax.Array,
                 num_harmonics: int) -> jax.Array:
    """Evaluate all bank waveforms at phases p [V, N] and select by id."""
    x = _phase_x(p)
    one = jnp.float32(1.0)
    sine = jnp.sin(_TWO_PI * x)
    tri = _triangle(x)
    square = jnp.where(p < jnp.uint32(1 << 31), one, -one)
    saw = jnp.float32(2.0) * x - one
    wu = (vp.pulse_width[:, None] * jnp.float32(4294967296.0)).astype(jnp.uint32)
    pulse = jnp.where(p < wu, one, -one)
    up = jnp.sqrt(jnp.maximum(jnp.float32(0.0), one - (jnp.float32(4.0) * x - one) ** 2))
    dn = -jnp.sqrt(jnp.maximum(jnp.float32(0.0), one - (jnp.float32(4.0) * x - jnp.float32(3.0)) ** 2))
    semi = jnp.where(x < 0.5, up, dn)
    pointy = tri * tri * tri
    noise = _noise(n[None, :].astype(jnp.uint32), vp.seed)  # sample/hold = off (per sample)

    wid = vp.wave[:, None]
    out = jnp.where(wid == 0, sine,
          jnp.where(wid == 1, tri,
          jnp.where(wid == 2, square,
          jnp.where(wid == 3, saw,
          jnp.where(wid == 4, pulse,
          jnp.where(wid == 5, semi,
          jnp.where(wid == 6, pointy, noise)))))))
    if num_harmonics > 0:
        acc = jnp.zeros_like(sine)
        for k in range(1, num_harmonics + 1):
            pk = p * jnp.uint32(k)
            acc = acc + vp.harm_amps[:, k - 1][:, None] * jnp.sin(_TWO_PI * _phase_x(pk))
        out = jnp.where(wid == 8, acc, out)
    return out


def _adsr(n: jax.Array, vp: VoiceParams, samplerate: int) -> jax.Array:
    """Per-voice ADSR gain at absolute frames n [N] -> [V, N] (f32).

    Sustain duration = max(0, gate/sr - attack - decay); release follows the
    gate; outside [start, start+total) the gain is 0.
    """
    sr = jnp.float32(samplerate)
    t = (n[None, :] - vp.start[:, None]).astype(jnp.float32) / sr
    a = jnp.maximum(vp.attack, 0.0)[:, None]
    d = jnp.maximum(vp.decay, 0.0)[:, None]
    r = jnp.maximum(vp.release, 0.0)[:, None]
    sl = vp.sustain_level[:, None]
    gate = vp.gate.astype(jnp.float32)[:, None] / sr
    s = jnp.maximum(gate - a - d, 0.0)
    t2 = a + d
    t3 = t2 + s
    t4 = t3 + r
    eps = jnp.float32(1e-30)
    g = jnp.where(t < a, t / jnp.maximum(a, eps),
        jnp.where(t < t2, jnp.float32(1.0) + (sl - jnp.float32(1.0)) * (t - a) / jnp.maximum(d, eps),
        jnp.where(t < t3, sl,
        jnp.where(t < t4, sl * (t4 - t) / jnp.maximum(r, eps),
                  jnp.float32(0.0)))))
    g = jnp.where(t < 0, jnp.float32(0.0), g)
    return jnp.maximum(g, jnp.float32(0.0))


def render_block(vp: VoiceParams, fm_phase_carry: jax.Array, n0: jax.Array,
                 blocksize: int, samplerate: int, num_harmonics: int):
    """Render one [V, blocksize] block -> (stereo f32 [blocksize, 2], carry').

    ``fm_phase_carry`` [V] u32 is the carrier phase accumulator (used when
    fm_depth != 0; voices without FM use the exact closed form).
    """
    n = n0 + jnp.arange(blocksize, dtype=jnp.int32)

    # FM: per-sample increments, integer-accumulated (chunk invariant)
    fm_phase = vp.fm_phase0[:, None] + n[None, :].astype(jnp.uint32) * vp.fm_inc[:, None]
    fm = vp.fm_depth[:, None] * jnp.sin(_TWO_PI * _phase_x(fm_phase))
    base = vp.base_inc.astype(jnp.float32)[:, None]
    inc_f = jnp.clip(base * (jnp.float32(1.0) + fm),
                     jnp.float32(-(2**31 - 256)), jnp.float32(2**31 - 256))
    inc = inc_f.astype(jnp.int32).astype(jnp.uint32)
    csum = jnp.cumsum(inc, axis=1)
    p_fm = fm_phase_carry[:, None] + csum - inc
    new_carry = fm_phase_carry + csum[:, -1]

    # No FM: exact closed form
    p_exact = vp.phase0[:, None] + n[None, :].astype(jnp.uint32) * vp.base_inc[:, None]
    has_fm = (vp.fm_depth != 0.0)[:, None]
    p = jnp.where(has_fm, p_fm, p_exact)
    new_carry = jnp.where(vp.fm_depth != 0.0, new_carry, fm_phase_carry)

    w = _wave_select(p, vp, n, num_harmonics)
    v = vp.bias[:, None] + vp.amp[:, None] * w
    env = _adsr(n, vp, samplerate)
    sig = v * env                                  # [V, N]

    # Equal-gain pan (balance law) -> stereo mix as a [N, V] x [V, 2] matmul
    lg = jnp.minimum(jnp.float32(1.0), jnp.float32(1.0) - vp.pan)
    rg = jnp.minimum(jnp.float32(1.0), jnp.float32(1.0) + vp.pan)
    gains = jnp.stack([lg, rg], axis=1)            # [V, 2]
    stereo = jnp.dot(sig.T, gains, preferred_element_type=jnp.float32)  # [N, 2]
    return stereo, new_carry


class VoiceBank:
    """Compiled batched renderer for a fixed (V, chunk, samplerate) shape."""

    def __init__(self, nvoices: int, samplerate: int = 44100,
                 chunk_frames: int = 8192, num_harmonics: int = 8):
        self.nvoices = nvoices
        self.samplerate = samplerate
        self.chunk_frames = chunk_frames
        self.num_harmonics = num_harmonics

        cf, sr, H = chunk_frames, samplerate, num_harmonics

        @jax.jit
        def chunk_fn(vp: VoiceParams, carry, n0):
            return render_block(vp, carry, n0, cf, sr, H)

        self._chunk_fn = chunk_fn

        @functools.partial(jax.jit, static_argnames=("nchunks",))
        def song_fn(vp: VoiceParams, nchunks: int):
            def body(carry, i):
                stereo, carry = render_block(vp, carry, i * cf, cf, sr, H)
                return carry, stereo
            init = jnp.zeros((vp.base_inc.shape[0],), jnp.uint32) + vp.phase0
            _, out = jax.lax.scan(body, init, jnp.arange(nchunks, dtype=jnp.int32))
            return out.reshape(-1, 2)

        self._song_fn = song_fn

    def init_carry(self, vp: VoiceParams) -> jax.Array:
        return vp.phase0

    def render_chunk(self, vp: VoiceParams, carry, n0: int):
        """One streaming chunk: (stereo f32 [chunk, 2], carry')."""
        return self._chunk_fn(vp, carry, jnp.int32(n0))

    def render_song(self, vp: VoiceParams, total_frames: int) -> jax.Array:
        """Offline mixdown: stereo f32 [total_frames, 2] in one jitted scan."""
        nchunks = -(-total_frames // self.chunk_frames)
        out = self._song_fn(vp, nchunks)
        return out[:total_frames]

    def to_int16(self, stereo_f32: jax.Array,
                 master_gain: float = 1.0) -> jax.Array:
        """f32 mix -> saturating int16 (trackmixer's widen-then-narrow path)."""
        v = jnp.rint(stereo_f32 * jnp.float32(32767.0 * master_gain))
        return jnp.clip(v, -32768, 32767).astype(jnp.int16)
