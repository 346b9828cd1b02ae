"""Master-bus effects chain: offline Sample ops + streaming chunk processors.

Beyond-reference subsystem (the reference has no effects rack).  Songs may
declare a master chain in their ``.ini`` (same configparser schema as the
rest of the song format; entries apply in file order):

    [fx]
    chorus   = rate=1.5 depth=0.003
    compress = threshold_db=-15 ratio=4 makeup_db=3
    reverb   = roomsize=0.8 wet=0.3 tail=1.5
    convolve = ir=hall_ir.wav wet=0.4 dry=0.8

Two execution paths share the formulas in :mod:`goldref.effects`:

* **offline** (``Song.mix``): each entry stages the corresponding lazy
  ``Sample`` op, so the whole master chain fuses into the mixdown program;
* **streaming** (``Song.mix_generator`` / trackmixer ``--play``): the
  processors here carry their recurrence state across chunks on device
  (reverb ring buffers, compressor envelope, chorus input history,
  convolution overlap tail), so a streamed song equals the offline render
  within the per-effect budgets (the f32 scans regroup at chunk
  boundaries) and keeps the host-control/device-chunks shape of SURVEY.md
  §7.  Compiled chunk programs are cached per (chunk shape, effect config)
  at module level — fresh processor instances reuse them (the round-2
  per-instance-jit lesson).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops import effects as dfx
from .ops import pcm as dpcm

__all__ = ["StreamingCompressor", "StreamingReverb", "StreamingChorus",
           "StreamingConvolver", "StreamingBiquad", "StreamingGate",
           "StreamingFeedbackEcho", "StreamingWidth", "StreamingLimiter",
           "StreamingPhaser", "StreamingTremolo", "StreamingAutopan",
           "FxChain", "parse_fx_items", "validate_fx_params", "FX_PARAMS"]

#: default reverb decay tail (seconds) — the single source for the
#: streaming processor default AND the chain tail accounting
DEFAULT_REVERB_TAIL = 1.5

_fn_cache: dict = {}


def _cached(key, build):
    fn = _fn_cache.get(key)
    if fn is None:
        fn = _fn_cache[key] = build()
    return fn


# ---------------------------------------------------------------------------
# Streaming processors.  Each has .process(int_chunk [n, ch]) -> int array
# (same shape) and carries its state between calls; feeding zeros drains
# reverb/convolution tails.
# ---------------------------------------------------------------------------

class StreamingCompressor:
    """Chunked twin of ``Sample.compress``: the decaying-max envelope and
    the attack smoother carry their last values across chunks (the same
    associative scans with a carried init)."""

    def __init__(self, samplerate: int, threshold_db: float = -20.0,
                 ratio: float = 4.0, attack: float = 0.005,
                 release: float = 0.1, makeup_db: float = 0.0,
                 knee_db: float = 0.0,
                 makeup_curve=None, threshold_curve=None, ratio_curve=None,
                 attack_curve=None, release_curve=None, knee_curve=None,
                 key_fn=None,
                 tickf: float = 0.0, start_frame: int = 0):
        """Automation curves (fx.compress.*): ``makeup_curve`` (post-gain
        dB), ``threshold_curve`` (dB), ``ratio_curve`` — all enter the
        gain computation elementwise, so per-frame values are exact.
        ``attack_curve``/``release_curve`` (seconds) automate INSIDE the
        recurrences: they become per-frame (alpha, decay) coefficient
        grids, derived on HOST in f64 at absolute frames
        (ops.coeffs.compressor_coeff_grids — the one rule shared by the
        offline and streaming paths, bit-identical at any chunk size or
        seek) and fed to the same associative scans, which compose with
        per-element coefficients (spec:
        goldref.effects.compressor_gains_swept).

        ``key_fn`` (sidechain ducking): a callable ``(n0, n) -> int16
        device array [n, ch]`` providing the KEY signal at absolute
        frames — the detector listens to the key while the gain applies
        to the processed audio (goldref.effects.sidechain_level; the
        song layer feeds a drum instrument's own hits bus here).
        Stateless in the absolute index, so streaming == offline at any
        chunk size or seek."""
        from .ops.coeffs import compressor_coeffs
        alpha, decay = compressor_coeffs(samplerate, attack, release)
        slope = 1.0 if math.isinf(ratio) else 1.0 - 1.0 / ratio
        if not 0.0 <= knee_db <= 24.0:
            raise ValueError("compress knee_db must be in [0, 24]")
        #: STATIC soft-knee flag (the hard-knee program's arithmetic is
        #: untouched when off); the knee VALUE stays a knob
        self._has_knee = knee_db > 0.0 or knee_curve is not None
        self._knobs = np.asarray(
            [threshold_db, slope, alpha, decay,
             float(np.exp2(np.float32(makeup_db) / np.float32(6.0206))),
             knee_db],
            np.float32)
        self._sr = samplerate
        self._env = jnp.float32(0.0)     # e_{-1}
        self._zdev = jnp.float32(0.0)    # z_{-1} = 1 - y_{-1}
        self.tail_frames = 0
        _require_tickf(tickf, makeup_curve, threshold_curve, ratio_curve,
                       attack_curve, release_curve, knee_curve)
        self._curves = {}
        for name, curve in (("makeup", makeup_curve),
                            ("thr", threshold_curve),
                            ("ratio", ratio_curve),
                            ("knee", knee_curve)):
            if curve is not None:
                self._curves[name] = (
                    jnp.asarray([t for t, _ in curve], jnp.float32),
                    jnp.asarray([v for _, v in curve], jnp.float32))
        #: host-evaluated coefficient-grid curves (attack/release seconds)
        self._grid_curves = {}
        if attack_curve is not None:
            self._grid_curves["attack"] = attack_curve
        if release_curve is not None:
            self._grid_curves["release"] = release_curve
        # static fallbacks for the un-automated coefficient of the pair
        self._static_attack = float(attack)
        self._static_release = float(release)
        self._key_fn = key_fn
        self._key_n0 = int(start_frame)
        if self._curves or self._grid_curves:
            self._tickf = float(tickf)
            self._n0 = int(start_frame)

    def _coeff_grids(self, n: int):
        """Per-frame (alpha, decay) f32 grids for [n0, n0+n)."""
        from .ops.coeffs import compressor_coeff_grids, curve_grid
        ac = self._grid_curves.get("attack")
        rc = self._grid_curves.get("release")
        att = (curve_grid(ac, self._n0, n, self._tickf) if ac is not None
               else np.full(n, self._static_attack))
        rel = (curve_grid(rc, self._n0, n, self._tickf) if rc is not None
               else np.full(n, self._static_release))
        return compressor_coeff_grids(att, rel, self._sr)

    def process(self, x: jax.Array) -> jax.Array:
        curves = self._curves
        which = tuple(sorted(curves))
        has_grids = bool(self._grid_curves)
        has_key = self._key_fn is not None
        has_knee = self._has_knee
        key = ("comp", which, has_grids, has_key, has_knee, x.shape,
               str(x.dtype),
               tuple(int(curves[k][0].shape[0]) for k in which))

        def build():
            @jax.jit
            def fn(x, knobs, e0, z0, *extra):
                thr, slope, alpha, decay, makeup = (knobs[i] for i in range(5))
                knee = knobs[5] if has_knee else None
                off = 0
                key_arr = None
                if has_key:
                    key_arr = extra[0]
                    off += 1
                if has_grids:
                    alpha, decay = extra[off], extra[off + 1]
                    off += 2
                if which:
                    n0, tickf = extra[off], extra[off + 1]
                    cvs = extra[off + 2:]
                    n = (n0 + jnp.arange(x.shape[0], dtype=jnp.int32))                         .astype(jnp.float32) / tickf
                    vals = {k: jnp.interp(n, cvs[2 * i], cvs[2 * i + 1])
                            for i, k in enumerate(which)}
                    if "makeup" in vals:
                        makeup = jnp.exp2(vals["makeup"]
                                          / jnp.float32(6.0206))
                    if "thr" in vals:
                        thr = vals["thr"]
                    if "ratio" in vals:
                        slope = (jnp.float32(1.0)
                                 - jnp.float32(1.0)
                                 / jnp.maximum(vals["ratio"],
                                               jnp.float32(1.0)))
                    if "knee" in vals:
                        # keep the grid strictly positive: the soft form
                        # divides by the knee width
                        knee = jnp.maximum(vals["knee"],
                                           jnp.float32(1e-3))
                if has_key:
                    # ducking: the detector listens to the KEY level
                    a = jnp.max(jnp.abs(dfx._norm(key_arr)), axis=1)
                    gains, e, z = dfx.compressor_gains_from_level(
                        a, thr, slope, alpha, decay, e0=e0, z0=z0,
                        with_state=True, knee=knee)
                else:
                    gains, e, z = dfx.compressor_gains_from_coeffs(
                        x, thr, slope, alpha, decay, e0=e0, z0=z0,
                        with_state=True, knee=knee)
                y = dpcm.gain_apply(x, (gains * makeup)[:, None])
                return y, e, z
            return fn

        if which or has_grids or has_key:
            extra = []
            if has_key:
                extra.append(self._key_fn(self._key_n0, int(x.shape[0])))
                self._key_n0 += int(x.shape[0])
            if has_grids:
                alpha_g, decay_g = self._coeff_grids(int(x.shape[0]))
                extra += [jnp.asarray(alpha_g), jnp.asarray(decay_g)]
            if which:
                extra += [jnp.int32(self._n0), jnp.float32(self._tickf)]
                for k in which:
                    extra.extend(curves[k])
            y, self._env, self._zdev = _cached(key, build)(
                x, self._knobs, self._env, self._zdev, *extra)
            if which or has_grids:
                self._n0 += int(x.shape[0])
        else:
            y, self._env, self._zdev = _cached(key, build)(
                x, self._knobs, self._env, self._zdev)
        return y


class StreamingBiquad:
    """Chunked twin of ``Sample.filter``: the (x1, x2, y1, y2) biquad state
    carries across chunks (ops.effects.biquad_apply)."""

    def __init__(self, samplerate: int, nchannels: int, kind: str,
                 cutoff: float, q: float = 0.7071, gain_db: float = 0.0):
        from .ops.coeffs import (biquad_coeffs, eq_band_coeffs, ff_split,
                                 wants_ff_scan)
        if kind in ("lowshelf", "highshelf", "peaking"):
            knobs = eq_band_coeffs(kind, cutoff, gain_db, q, samplerate)
        else:
            knobs = biquad_coeffs(kind, cutoff, q, samplerate)
        # identical routing decision to Sample._stage_biquad, from the
        # identical f64 coefficients — so streaming == offline paths
        self._ff = wants_ff_scan(knobs)
        z = jnp.zeros(nchannels, jnp.float32)
        if self._ff:
            self._knobs = np.asarray([v for c in knobs
                                      for v in ff_split(c)], np.float32)
            self._state = (z, z, z, z, z, z)
        else:
            self._knobs = np.asarray(knobs, np.float32)
            self._state = (z, z, z, z)
        self.tail_frames = 0

    def process(self, x: jax.Array) -> jax.Array:
        key = ("biquad", self._ff, x.shape, str(x.dtype))
        width = dpcm.width_of(x)
        ff = self._ff

        def build():
            @jax.jit
            def fn(x, state, knobs):
                w = dpcm.width_of(x)
                s = x.astype(jnp.float32) / jnp.float32(dpcm.MAXVAL[w])
                if ff:
                    pairs = tuple((knobs[2 * i], knobs[2 * i + 1])
                                  for i in range(5))
                    y, state = dfx.biquad_apply_ff(s, pairs, state)
                else:
                    y, state = dfx.biquad_apply(
                        s, tuple(knobs[i] for i in range(5)), state)
                return dfx.to_int_samples(y, width), state
            return fn

        y, self._state = _cached(key, build)(x, self._state, self._knobs)
        return y


def swept_biquad_chunk(x: jax.Array, n0: int, kind: str, q: float,
                       xs: jax.Array, vs: jax.Array, tickf: float,
                       samplerate: int, state=None):
    """Cutoff-automated biquad (the ``fx.filter.cutoff`` curve): per-frame
    cutoff from the breakpoint curve (linear interp over ticks, ends held,
    clipped to [10, 0.49*sr] Hz), per-frame RBJ coefficients in f32 (the
    same formulas as the graph engine's LFO-swept Biquad), applied through
    the shared companion-matrix scan with carried (x1,x2,y1,y2) state.

    Stateless in the absolute frame index ``n0`` apart from the filter
    state, so the offline whole-signal call (n0=0) and streaming chunks
    agree within the filter's scan-regrouping budget at any chunk size.
    Returns (y_int, new_state)."""
    if kind not in ("lowpass", "highpass", "bandpass"):
        raise ValueError("fx.filter.cutoff automation supports "
                         "lowpass/highpass/bandpass only (shelving kinds "
                         "have a gain coefficient the sweep does not "
                         "carry)")
    key = ("swept_biquad", kind, x.shape, str(x.dtype), samplerate,
           int(xs.shape[0]))

    def build():
        @jax.jit
        def fn(x, n0, qv, xs, vs, tickf, state):
            width = dpcm.width_of(x)
            s = x.astype(jnp.float32) / jnp.float32(dpcm.MAXVAL[width])
            n = (n0 + jnp.arange(x.shape[0], dtype=jnp.int32)) \
                .astype(jnp.float32)
            fc = jnp.clip(jnp.interp(n / tickf, xs, vs),
                          jnp.float32(10.0), jnp.float32(0.49 * samplerate))
            w0 = jnp.float32(2.0 * math.pi / samplerate) * fc
            alpha = jnp.sin(w0) / (jnp.float32(2.0) * qv)
            cw = jnp.cos(w0)
            one = jnp.float32(1.0)
            if kind == "lowpass":
                b0 = (one - cw) * jnp.float32(0.5)
                b1 = one - cw
                b2 = b0
            elif kind == "highpass":
                b0 = (one + cw) * jnp.float32(0.5)
                b1 = -(one + cw)
                b2 = b0
            else:                                    # bandpass
                b0 = alpha
                b1 = jnp.zeros_like(alpha)
                b2 = -alpha
            a0r = one / (one + alpha)
            coeffs = (b0 * a0r, b1 * a0r, b2 * a0r,
                      (jnp.float32(-2.0) * cw) * a0r, (one - alpha) * a0r)
            y, state = dfx.biquad_apply(s, coeffs, state)
            return dfx.to_int_samples(y, width), state
        return fn

    if state is None:
        z = jnp.zeros(x.shape[1], jnp.float32)
        state = (z, z, z, z)
    return _cached(key, build)(x, jnp.int32(n0), jnp.float32(q), xs, vs,
                               jnp.float32(tickf), state)


class SweptEQBand:
    """One parametric-EQ band with a per-frame gain curve
    (``fx.eq.*_db`` automation): coefficient grids derived on HOST in
    f64 at absolute frames (ops.coeffs.eq_coeff_grids — a constant
    curve yields bit-identical f32 coefficients to the static band, and
    output within 1 LSB: vector-vs-scalar coefficient operands contract
    the FMA chain differently), applied through the shared companion
    scan with carried state.  Spec: goldref.effects.eq_swept."""

    def __init__(self, samplerate: int, nchannels: int, kind: str,
                 freq: float, q: float, curve, tickf: float,
                 start_frame: int = 0):
        from .ops.coeffs import eq_band_coeffs, wants_ff_scan
        _require_tickf(tickf, curve)
        self.kind, self.freq, self.q = kind, float(freq), float(q)
        self.curve = curve
        self.tickf = float(tickf)
        self.samplerate = samplerate
        # conditioning routing (the static bands' rule, evaluated at
        # every breakpoint gain): shelf/high-Q bands run the compensated
        # float-float scan with f64-derived coefficient grids
        self._ff = any(
            wants_ff_scan(eq_band_coeffs(kind, freq, g, q, samplerate))
            for _, g in curve)
        z = jnp.zeros(nchannels, jnp.float32)
        self._state = (z, z, z, z, z, z) if self._ff else (z, z, z, z)
        self._n0 = int(start_frame)
        self.tail_frames = 0

    def process(self, x: jax.Array) -> jax.Array:
        from .ops.coeffs import curve_grid, eq_coeff_grids
        n = int(x.shape[0])
        g = curve_grid(self.curve, self._n0, n, self.tickf)
        grids = eq_coeff_grids(self.kind, self.freq, g, self.q,
                               self.samplerate,
                               dtype=np.float64 if self._ff
                               else np.float32)
        y, self._state = _apply_swept_grids(x, self._state, self._ff,
                                            grids)
        self._n0 += n
        return y


def _apply_swept_grids(x, state, ff, grids):
    """Shared per-chunk applier for host-derived per-frame coefficient
    grids: the plain companion scan on f32 grids, or the compensated
    float-float scan on f64-split (hi, lo) pairs.  One cached jit per
    (ff, shape, dtype)."""
    from .ops.coeffs import ff_split
    key = ("swept_grids", ff, x.shape, str(x.dtype))

    def build():
        @jax.jit
        def fn(x, state, *coefs):
            width = dpcm.width_of(x)
            s = x.astype(jnp.float32) / jnp.float32(dpcm.MAXVAL[width])
            if ff:
                pairs = tuple((coefs[2 * i], coefs[2 * i + 1])
                              for i in range(5))
                y, state = dfx.biquad_apply_ff(s, pairs, state)
            else:
                y, state = dfx.biquad_apply(s, coefs, state)
            return dfx.to_int_samples(y, width), state
        return fn

    if ff:
        coefs = [jnp.asarray(part) for gr in grids
                 for part in ff_split(gr)]
    else:
        coefs = [jnp.asarray(gr) for gr in grids]
    return _cached(key, build)(x, state, *coefs)


class SweptGainKindBiquad:
    """``fx.filter.cutoff`` automation for the GAIN kinds (lowshelf/
    highshelf/peaking): the per-frame corner/center-frequency grid
    derives the full five-coefficient RBJ set on host in f64
    (ops.coeffs.eq_freqs_coeff_grids) — the sweep carries the gain
    coefficient that the device-computed lowpass/highpass/bandpass
    sweep cannot — and badly-conditioned corners (low shelves) route
    through the compensated float-float scan.  A constant curve
    reproduces the static filter's coefficients bit-exactly.  Spec:
    goldref.effects.filter_swept_freq."""

    def __init__(self, samplerate: int, nchannels: int, kind: str,
                 q: float, gain_db: float, curve, tickf: float,
                 start_frame: int = 0):
        from .ops.coeffs import eq_band_coeffs, wants_ff_scan
        _require_tickf(tickf, curve)
        self.kind, self.q = kind, float(q)
        self.gain_db = float(gain_db)
        self.curve = curve
        self.tickf = float(tickf)
        self.samplerate = samplerate
        self._ff = any(
            wants_ff_scan(eq_band_coeffs(
                kind, float(np.clip(f, 10.0, samplerate * 0.49)),
                gain_db, q, samplerate))
            for _, f in curve)
        z = jnp.zeros(nchannels, jnp.float32)
        self._state = (z, z, z, z, z, z) if self._ff else (z, z, z, z)
        self._n0 = int(start_frame)
        self.tail_frames = 0

    def process(self, x: jax.Array) -> jax.Array:
        from .ops.coeffs import curve_grid, eq_freqs_coeff_grids
        n = int(x.shape[0])
        f = np.clip(curve_grid(self.curve, self._n0, n, self.tickf),
                    10.0, self.samplerate * 0.49)
        grids = eq_freqs_coeff_grids(self.kind, f, self.gain_db, self.q,
                                     self.samplerate,
                                     dtype=np.float64 if self._ff
                                     else np.float32)
        y, self._state = _apply_swept_grids(x, self._state, self._ff,
                                            grids)
        self._n0 += n
        return y


class StreamingEQ:
    """Chunked twin of ``Sample.eq``: one carried biquad state per
    active band, bands applied in low/mid/high order with the int PCM
    round trip between bands (the staged-op semantics, so streaming ==
    offline bit-exactly given identical chunk contents).  A band with a
    ``*_curve`` breakpoint list runs as a :class:`SweptEQBand` (its
    static gain is ignored); without a curve, zero-gain bands are
    skipped exactly like ``Sample.eq``."""

    def __init__(self, samplerate: int, nchannels: int,
                 low_db: float = 0.0, mid_db: float = 0.0,
                 high_db: float = 0.0, low_freq: float = 120.0,
                 mid_freq: float = 1000.0, mid_q: float = 1.0,
                 high_freq: float = 8000.0,
                 low_curve=None, mid_curve=None, high_curve=None,
                 tickf: float = 0.0, start_frame: int = 0):
        self._procs = []
        for kind, f, g, q, curve in (
                ("lowshelf", low_freq, low_db, 0.7071, low_curve),
                ("peaking", mid_freq, mid_db, mid_q, mid_curve),
                ("highshelf", high_freq, high_db, 0.7071, high_curve)):
            if curve is not None:
                self._procs.append(SweptEQBand(samplerate, nchannels,
                                               kind, f, q, curve, tickf,
                                               start_frame))
            elif g != 0.0:
                self._procs.append(StreamingBiquad(samplerate, nchannels,
                                                   kind, f, q, gain_db=g))
        self.tail_frames = 0

    def process(self, x: jax.Array) -> jax.Array:
        for p in self._procs:
            x = p.process(x)
        return x


class SweptStreamingBiquad:
    """Streaming twin of the cutoff-automation path: tracks the absolute
    frame position across chunks so the curve stays aligned (a seek passes
    its ``start_frame``; the filter state itself starts cold, like every
    other seek-with-fx)."""

    def __init__(self, samplerate: int, nchannels: int, kind: str,
                 q: float, curve, tickf: float, start_frame: int = 0):
        _require_tickf(tickf, curve)
        if kind not in ("lowpass", "highpass", "bandpass"):
            raise ValueError("fx.filter.cutoff automation supports "
                             "lowpass/highpass/bandpass only (shelving "
                             "kinds have a gain coefficient the sweep "
                             "does not carry)")
        self.kind = kind
        self.q = float(q)
        self.xs = jnp.asarray([t for t, _ in curve], jnp.float32)
        self.vs = jnp.asarray([v for _, v in curve], jnp.float32)
        self.tickf = float(tickf)
        self.samplerate = samplerate
        z = jnp.zeros(nchannels, jnp.float32)
        self._state = (z, z, z, z)
        self._n0 = int(start_frame)
        self.tail_frames = 0

    def process(self, x: jax.Array) -> jax.Array:
        y, self._state = swept_biquad_chunk(
            x, self._n0, self.kind, self.q, self.xs, self.vs, self.tickf,
            self.samplerate, self._state)
        self._n0 += int(x.shape[0])
        return y


class StreamingGate:
    """Chunked twin of ``Sample.gate``: detector envelope and smoother
    carry across chunks (the spec starts a stream closed)."""

    def __init__(self, samplerate: int, threshold_db: float = -50.0,
                 range_db: float = 80.0, attack: float = 0.001,
                 release: float = 0.05,
                 threshold_curve=None, tickf: float = 0.0,
                 start_frame: int = 0):
        """``threshold_curve`` (fx.gate.threshold_db automation): the
        threshold enters the open/closed comparison elementwise, so a
        per-frame curve is exact."""
        from .ops.coeffs import gate_coeffs
        alpha, decay, floor_gain = gate_coeffs(samplerate, attack, release,
                                               range_db)
        self._knobs = np.asarray([threshold_db, floor_gain, alpha, decay],
                                 np.float32)
        self._env = jnp.float32(0.0)
        self._z = jnp.float32(floor_gain)
        self.tail_frames = 0
        _require_tickf(tickf, threshold_curve)
        self._swept = threshold_curve is not None
        if self._swept:
            self._txs = jnp.asarray([t for t, _ in threshold_curve],
                                    jnp.float32)
            self._tvs = jnp.asarray([v for _, v in threshold_curve],
                                    jnp.float32)
            self._tickf = float(tickf)
            self._n0 = int(start_frame)

    def process(self, x: jax.Array) -> jax.Array:
        swept = self._swept
        key = ("gate", swept, x.shape, str(x.dtype),
               int(self._txs.shape[0]) if swept else 0)

        def build():
            @jax.jit
            def fn(x, knobs, e0, z0, *curve):
                thr = knobs[0]
                if swept:
                    n0, txs, tvs, tickf = curve
                    n = (n0 + jnp.arange(x.shape[0], dtype=jnp.int32))                         .astype(jnp.float32) / tickf
                    thr = jnp.interp(n, txs, tvs)
                g, e, z = dfx.gate_gains_from_coeffs(
                    x, thr, knobs[1], knobs[2], knobs[3], e0=e0, z0=z0,
                    with_state=True)
                return dpcm.gain_apply(x, g[:, None]), e, z
            return fn

        if swept:
            y, self._env, self._z = _cached(key, build)(
                x, self._knobs, self._env, self._z, jnp.int32(self._n0),
                self._txs, self._tvs, jnp.float32(self._tickf))
            self._n0 += int(x.shape[0])
        else:
            y, self._env, self._z = _cached(key, build)(
                x, self._knobs, self._env, self._z)
        return y


class StreamingReverb:
    """Chunked twin of ``Sample.reverb``: the comb/allpass ring buffers and
    write position carry across chunks (ops.effects.reverb_network_apply).
    ``tail_frames`` is how much silence to feed after the programme to
    drain the configured decay tail."""

    def __init__(self, samplerate: int, nchannels: int,
                 roomsize: float = 0.7, damping: float = 0.5,
                 wet: float = 0.33, dry: float = 0.7, width: float = 1.0,
                 tail: float = DEFAULT_REVERB_TAIL,
                 wet_curve=None, dry_curve=None, roomsize_curve=None,
                 tickf: float = 0.0, start_frame: int = 0):
        """``wet_curve``/``dry_curve`` (fx.reverb.wet/.dry automation):
        tick:value breakpoint lists replacing the static wet/dry with a
        per-frame gain on the OUTPUT stage — the comb/allpass core is
        untouched, so the automated mix stays within the same budget.
        ``roomsize_curve`` (fx.reverb.roomsize) automates INSIDE the comb
        recurrences: a per-frame feedback grid fb_n = 0.7+0.28*roomsize_n
        (host f64, ops.coeffs.reverb_feedback_grid — absolute-frame, so
        offline == streaming by construction) enters each frame's comb
        write elementwise (spec: goldref _reverb_network array feedback)."""
        from .ops.coeffs import reverb_params, reverb_delays
        feedback, damp, wet1, wet2 = reverb_params(roomsize, damping, wet,
                                                   width)
        self._knobs = np.asarray([feedback, damp, wet1, wet2, dry],
                                 np.float32)
        self._sr = samplerate
        self._nch = nchannels
        self._nets = [reverb_delays(samplerate, ch)
                      for ch in range(1 if nchannels == 1 else 2)]
        self._state = tuple(dfx.reverb_zero_state(c, a) for c, a in self._nets)
        self.tail_frames = int(tail * samplerate)
        _require_tickf(tickf, wet_curve, dry_curve, roomsize_curve)
        self._room_curve = roomsize_curve
        self._swept = wet_curve is not None or dry_curve is not None
        if self._swept:
            # a single-point curve interpolates to its constant value, so
            # the un-automated knob just becomes [(0, value)]
            wc = wet_curve if wet_curve is not None else [(0.0, wet)]
            dc = dry_curve if dry_curve is not None else [(0.0, dry)]
            self._wxs = jnp.asarray([t for t, _ in wc], jnp.float32)
            self._wvs = jnp.asarray([v for _, v in wc], jnp.float32)
            self._dxs = jnp.asarray([t for t, _ in dc], jnp.float32)
            self._dvs = jnp.asarray([v for _, v in dc], jnp.float32)
            # wet splits into the Freeverb stereo pair by the width law
            self._w1f = np.float32(width / 2.0 + 0.5)
            self._w2f = np.float32((1.0 - width) / 2.0)
        if self._swept or self._room_curve is not None:
            self._tickf = float(tickf)
            self._n0 = int(start_frame)

    def process(self, x: jax.Array) -> jax.Array:
        nets = self._nets
        nch = self._nch
        width = dpcm.width_of(x)
        swept = self._swept
        has_fb = self._room_curve is not None
        key = ("reverb", swept, has_fb, x.shape, str(x.dtype), self._sr,
               (int(self._wxs.shape[0]), int(self._dxs.shape[0]))
               if swept else ())
        w1f = self._w1f if swept else None
        w2f = self._w2f if swept else None

        def build():
            @jax.jit
            def fn(x, states, knobs, *curve):
                feedback, damp, wet1, wet2, dry = (knobs[i] for i in range(5))
                off = 0
                if has_fb:
                    feedback = curve[0]          # per-frame fb grid [n]
                    off = 1
                if swept:
                    n0, wxs, wvs, dxs, dvs, tickf = curve[off:]
                    n = (n0 + jnp.arange(x.shape[0], dtype=jnp.int32))                         .astype(jnp.float32) / tickf
                    wet_n = jnp.interp(n, wxs, wvs)
                    dry = jnp.interp(n, dxs, dvs)
                    wet1 = wet_n * w1f
                    wet2 = wet_n * w2f
                s = dfx._norm(x)
                from .ops.coeffs import FIXED_GAIN
                mono_in = jnp.sum(s, axis=1) * jnp.float32(FIXED_GAIN)
                new_states, revs = [], []
                for (combs, aps), st in zip(nets, states):
                    st, rev = dfx.reverb_network_apply(st, mono_in, combs,
                                                       aps, feedback, damp)
                    new_states.append(st)
                    revs.append(rev)
                if nch == 1:
                    out = dry * s[:, 0] + (wet1 + wet2) * revs[0]
                    out = out[:, None]
                else:
                    out = jnp.stack(
                        [dry * s[:, 0] + wet1 * revs[0] + wet2 * revs[1],
                         dry * s[:, 1] + wet1 * revs[1] + wet2 * revs[0]],
                        axis=1)
                return dfx.to_int_samples(out, width), tuple(new_states)
            return fn

        if swept or has_fb:
            extra = []
            if has_fb:
                from .ops.coeffs import curve_grid, reverb_feedback_grid
                fbg = reverb_feedback_grid(curve_grid(
                    self._room_curve, self._n0, int(x.shape[0]),
                    self._tickf))
                extra.append(jnp.asarray(fbg))
            if swept:
                extra += [jnp.int32(self._n0), self._wxs, self._wvs,
                          self._dxs, self._dvs, jnp.float32(self._tickf)]
            y, self._state = _cached(key, build)(
                x, self._state, self._knobs, *extra)
            self._n0 += int(x.shape[0])
        else:
            y, self._state = _cached(key, build)(x, self._state, self._knobs)
        return y


class StreamingChorus:
    """Chunked twin of ``Sample.chorus``: carries the input history the
    modulated delays read from, plus the absolute frame index for the
    integer-DDS LFO phase.  Gathers are exact, so chunked output matches
    the whole-signal op within 1 LSB (backend FMA contraction is the only
    difference between the per-shape compilations)."""

    def __init__(self, samplerate: int, nchannels: int, rate: float = 0.5,
                 depth: float = 0.002, delay: float = 0.02, voices: int = 3,
                 wet: float = 0.4, dry: float = 1.0,
                 wet_curve=None, dry_curve=None, rate_curve=None,
                 depth_curve=None, tickf: float = 0.0,
                 start_frame: int = 0):
        """``wet_curve``/``dry_curve`` (fx.chorus.wet/.dry automation):
        per-frame output-stage gains; the modulated-delay reads are
        untouched.  ``rate_curve``/``depth_curve`` automate the LFO
        itself: the rate curve becomes per-frame u32 DDS increments whose
        cumulative phase P_n is mirrored EXACTLY on host
        (ops.coeffs.chorus_inc_grid/chorus_phase_grid — integer mod-2^32
        math, so offline == streaming bit-exactly and a constant curve
        reproduces the static phase n*inc); the depth curve is a
        per-frame f32 grid in the delay formula (spec:
        goldref.effects.chorus_swept).  The history window is sized for
        the curve's MAXIMUM depth."""
        self._sr = samplerate
        self._rate = float(rate)
        self._voices = int(voices)
        self._knobs = np.asarray([depth, delay, wet, dry], np.float32)
        _require_tickf(tickf, wet_curve, dry_curve, rate_curve, depth_curve)
        self._rate_curve = rate_curve
        self._depth_curve = depth_curve
        self._static_depth = float(depth)
        max_depth = (max(v for _, v in depth_curve)
                     if depth_curve is not None else depth)
        hist = int(math.ceil((delay + max_depth) * samplerate)) + 2
        self._hist = jnp.zeros((hist, nchannels), jnp.float32)
        self._n0 = jnp.int32(0)
        #: host-mirrored cumulative LFO phase (rate automation)
        self._p_carry = 0
        self.tail_frames = 0
        self._swept = wet_curve is not None or dry_curve is not None
        if self._swept:
            wc = wet_curve if wet_curve is not None else [(0.0, wet)]
            dc = dry_curve if dry_curve is not None else [(0.0, dry)]
            self._wxs = jnp.asarray([t for t, _ in wc], jnp.float32)
            self._wvs = jnp.asarray([v for _, v in wc], jnp.float32)
            self._dxs = jnp.asarray([t for t, _ in dc], jnp.float32)
            self._dvs = jnp.asarray([v for _, v in dc], jnp.float32)
        if (self._swept or rate_curve is not None
                or depth_curve is not None):
            self._tickf = float(tickf)
            #: fixed start offset for the device-side wet/dry interp (the
            #: jitted fn adds its own advancing n0 counter)
            self._curve_n0 = int(start_frame)
            #: advancing absolute frame for host-evaluated grids
            self._host_n0 = int(start_frame)
            if rate_curve is not None and start_frame:
                # seek: replay the exact phase sum over [0, start_frame)
                # in bounded slabs (a deep seek would otherwise
                # materialize O(start_frame) f64 intermediates at once)
                from .ops.coeffs import chorus_inc_grid, curve_grid
                carry = 0
                SLAB = 1 << 20
                for s0 in range(0, int(start_frame), SLAB):
                    n = min(SLAB, int(start_frame) - s0)
                    inc = chorus_inc_grid(
                        curve_grid(rate_curve, s0, n, tickf), samplerate)
                    carry = (carry + int(inc.astype(np.uint64).sum())) \
                        & 0xFFFFFFFF
                self._p_carry = carry

    def process(self, x: jax.Array) -> jax.Array:
        swept = self._swept
        has_P = self._rate_curve is not None
        has_depth = self._depth_curve is not None
        key = ("chorus", swept, has_P, has_depth, x.shape, str(x.dtype),
               self._sr, self._rate, self._voices, self._hist.shape,
               (int(self._wxs.shape[0]), int(self._dxs.shape[0]))
               if swept else ())
        sr, rate, voices = self._sr, self._rate, self._voices
        width = dpcm.width_of(x)
        H = int(self._hist.shape[0])

        def build():
            @jax.jit
            def fn(x, hist, n0, knobs, *curve):
                depth, delay, wet, dry = (knobs[i] for i in range(4))
                off = 0
                P = None
                if has_P:
                    P = curve[0]
                    off += 1
                if has_depth:
                    depth = curve[off]
                    off += 1
                if swept:
                    cn0, wxs, wvs, dxs, dvs, tickf = curve[off:]
                    n = (cn0 + n0
                         + jnp.arange(x.shape[0], dtype=jnp.int32))                         .astype(jnp.float32) / tickf
                    wet = jnp.interp(n, wxs, wvs)
                    dry = jnp.interp(n, dxs, dvs)
                s = dfx._norm(x)
                out = dfx.chorus_core(s, n0, hist, sr, rate, depth, delay,
                                      voices, wet, dry, P=P)
                ext = jnp.concatenate([hist, s], axis=0)
                new_hist = ext[-H:]
                return (dfx.to_int_samples(out, width), new_hist,
                        n0 + jnp.int32(x.shape[0]))
            return fn

        if swept or has_P or has_depth:
            from .ops.coeffs import (chorus_inc_grid, chorus_phase_grid,
                                     curve_grid)
            n = int(x.shape[0])
            extra = []
            if has_P:
                inc = chorus_inc_grid(
                    curve_grid(self._rate_curve, self._host_n0, n,
                               self._tickf), sr)
                P, self._p_carry = chorus_phase_grid(inc, self._p_carry)
                extra.append(jnp.asarray(P.astype(np.int64)
                                         .astype(np.int32)))
            if has_depth:
                extra.append(jnp.asarray(
                    curve_grid(self._depth_curve, self._host_n0, n,
                               self._tickf).astype(np.float32)))
            if swept:
                extra += [jnp.int32(self._curve_n0),
                          self._wxs, self._wvs, self._dxs, self._dvs,
                          jnp.float32(self._tickf)]
            y, self._hist, self._n0 = _cached(key, build)(
                x, self._hist, self._n0, self._knobs, *extra)
            self._host_n0 += n
        else:
            y, self._hist, self._n0 = _cached(key, build)(
                x, self._hist, self._n0, self._knobs)
        return y


class StreamingConvolver:
    """Chunked twin of ``Sample.convolve``: FFT convolution per chunk with
    the (len(ir)-1)-frame overlap tail carried across chunks.  Feeding
    ``tail_frames`` of silence flushes the final tail."""

    def __init__(self, ir_norm: np.ndarray, wet: float = 1.0,
                 dry: float = 0.0):
        ir = np.asarray(ir_norm, np.float32)
        if ir.ndim == 1:
            ir = ir[:, None]
        self._ir = jnp.asarray(ir)
        self._knobs = np.asarray([wet, dry], np.float32)
        self._tail: Optional[jax.Array] = None   # [m-1, ch] pending output
        self.tail_frames = int(ir.shape[0]) - 1

    def process(self, x: jax.Array) -> jax.Array:
        n, nch = x.shape
        m = int(self._ir.shape[0])
        if self._tail is None:
            self._tail = jnp.zeros((max(m - 1, 0), nch), jnp.float32)
        key = ("conv", x.shape, str(x.dtype), m, int(self._ir.shape[1]))

        def build():
            @jax.jit
            def fn(x, ir, tail, knobs):
                return dfx.convolve_chunk(x, ir, knobs[0], knobs[1], tail)
            return fn

        y, self._tail = _cached(key, build)(x, self._ir, self._tail,
                                            self._knobs)
        return y


# ---------------------------------------------------------------------------
# The chain + the .ini spec
# ---------------------------------------------------------------------------

#: effect name -> (allowed params, params that are not plain floats)
class StreamingFeedbackEcho:
    """Chunked twin of ``Sample.feedback_echo``: the delay line's d-value
    history (the last D frames of the recurrence) carries across chunks,
    so streaming == offline bit-exactly at any chunk size.  Curves
    (fx.echo.feedback/.wet/.dry automation) are host-derived absolute-
    frame grids (ops.coeffs.curve_grid), the recurrence-internal-
    automation rule.  Spec/budget: goldref.effects.feedback_echo."""

    def __init__(self, samplerate: int, nchannels: int, delay: float = None,
                 feedback: float = 0.4, wet: float = 0.5, dry: float = 1.0,
                 tail: float = None, feedback_curve=None, wet_curve=None,
                 dry_curve=None, tickf: float = 0.0, start_frame: int = 0):
        from .ops.coeffs import echo_tail_frames
        if delay is None:
            raise ValueError("[fx] echo needs delay= seconds (or beats= "
                             "inside a song)")
        if not 0.0 <= feedback <= 0.95:
            raise ValueError("echo feedback must be in [0, 0.95]")
        self._D = max(1, int(delay * samplerate))
        self.tail_frames = echo_tail_frames(samplerate, delay, feedback,
                                            wet, tail)
        self._hist = jnp.zeros((self._D, nchannels), jnp.float32)
        self._knobs = np.asarray([feedback, wet, dry], np.float32)
        _require_tickf(tickf, feedback_curve, wet_curve, dry_curve)
        self._curves = (feedback_curve, wet_curve, dry_curve)
        self._swept = any(c is not None for c in self._curves)
        if self._swept:
            self._tickf = float(tickf)
            self._n0 = int(start_frame)

    def process(self, x: jax.Array) -> jax.Array:
        D = self._D
        swept = self._swept
        width = dpcm.width_of(x)
        key = ("fb_echo", swept, x.shape, str(x.dtype), D)

        def build():
            @jax.jit
            def fn(x, hist, knobs, *grids):
                s = dfx._norm(x)
                if swept:
                    fb, wet, dry = (g[:, None] for g in grids)
                    fb = fb[:, 0]
                else:
                    fb, wet, dry = (knobs[i] for i in range(3))
                e, hist = dfx.feedback_echo_core(s, D, fb, hist)
                out = dry * s + wet * e
                return dfx.to_int_samples(out, width), hist
            return fn

        if swept:
            from .ops.coeffs import curve_grid
            n = int(x.shape[0])
            grids = []
            for c, k in zip(self._curves, self._knobs):
                g = curve_grid(c, self._n0, n, self._tickf) \
                    if c is not None else np.full(n, k, np.float64)
                grids.append(jnp.asarray(g.astype(np.float32)))
            y, self._hist = _cached(key, build)(x, self._hist,
                                                self._knobs, *grids)
            self._n0 += n
        else:
            y, self._hist = _cached(key, build)(x, self._hist, self._knobs)
        return y


class StreamingWidth:
    """Chunked twin of ``Sample.stereo_width`` — stateless mid/side
    width; ``amount_curve`` (fx.width.amount automation) is a host
    absolute-frame grid.  Spec/budget: goldref.effects.stereo_width."""

    def __init__(self, samplerate: int, nchannels: int,
                 amount: float = None, amount_curve=None,
                 tickf: float = 0.0, start_frame: int = 0):
        if nchannels != 2:
            raise ValueError("[fx] width needs a stereo song")
        if amount is None and amount_curve is None:
            raise ValueError("[fx] width needs amount=")
        if amount is not None and not 0.0 <= amount <= 4.0:
            raise ValueError("width amount must be in [0, 4]")
        self._amount = float(amount if amount is not None else 1.0)
        _require_tickf(tickf, amount_curve)
        self._curve = amount_curve
        if amount_curve is not None:
            self._tickf = float(tickf)
            self._n0 = int(start_frame)
        self.tail_frames = 0

    def process(self, x: jax.Array) -> jax.Array:
        swept = self._curve is not None
        width = dpcm.width_of(x)
        key = ("width", swept, x.shape, str(x.dtype))

        def build():
            @jax.jit
            def fn(x, a):
                return dfx.stereo_width(x, a)
            return fn

        if swept:
            from .ops.coeffs import curve_grid
            n = int(x.shape[0])
            g = curve_grid(self._curve, self._n0, n, self._tickf)
            self._n0 += n
            return _cached(key, build)(x, jnp.asarray(g.astype(np.float32)))
        return _cached(key, build)(x, jnp.float32(self._amount))


class StreamingLimiter:
    """Chunked twin of ``Sample.limit`` — a HOLDBACK processor: it
    withholds the lookahead window (L frames) of input until the future
    it needs has arrived, so ``process`` may return FEWER frames than it
    was fed (the first chunk is L short; ``flush_frames`` more input at
    the end pushes the remainder out).  Master-chain only — a fixed-size
    track bus cannot ride a holdback (Song.add_track_fx rejects it).
    State: the pending input frames, the release level, and the trailing
    gains of the box attack ramp — streaming == offline exactly (the
    offline path pads by ``flush_frames`` and truncates back).
    Spec/budget: goldref.effects.limiter_gains."""

    def __init__(self, samplerate: int, nchannels: int,
                 ceiling_db: float = -1.0, release: float = 0.05,
                 lookahead: float = 0.005, ceiling_curve=None,
                 release_curve=None, tickf: float = 0.0,
                 start_frame: int = 0):
        from .ops.coeffs import compressor_coeffs
        if not -60.0 <= ceiling_db <= 0.0:
            raise ValueError("limiter ceiling_db must be in [-60, 0]")
        self._sr = samplerate
        self._L = max(1, int(lookahead * samplerate))
        self._decay = float(compressor_coeffs(samplerate, 0.0, release)[1])
        self._ceil = float(ceiling_db)
        self.tail_frames = 0
        self.flush_frames = self._L
        self._pend = None                       # [k<=L, ch] int, lazy dtype
        self._r = jnp.float32(0.0)
        self._gpad = jnp.ones((self._L,), jnp.float32)
        _require_tickf(tickf, ceiling_curve, release_curve)
        self._curve = ceiling_curve
        #: fx.limiter.release automation — per-frame decay grid at the
        #: EMISSION positions (the release recurrence's absolute frames)
        self._rel_curve = release_curve
        self._n0 = int(start_frame)
        self._tickf = float(tickf)

    def process(self, x: jax.Array) -> jax.Array:
        L = self._L
        buf = x if self._pend is None or self._pend.shape[0] == 0 \
            else jnp.concatenate([self._pend, x])
        m = int(buf.shape[0])
        if m <= L:
            self._pend = buf
            return x[:0]
        emit = m - L
        width = dpcm.width_of(x)
        maxval = dpcm.MAXVAL[width]
        swept = self._curve is not None
        rel_swept = self._rel_curve is not None
        key = ("limiter", swept, rel_swept, (m, emit), str(x.dtype), L)

        def build():
            @jax.jit
            def fn(buf, r, gpad, ceil_db, decay, cint):
                a = jnp.max(jnp.abs(dfx._norm(buf)), axis=1)
                gs, r, gpad = dfx.limiter_gains_core(a, ceil_db, decay, L,
                                                     r, gpad)
                y = dpcm.gain_apply(buf[:emit], gs[:, None])
                if cint.ndim:
                    c = cint[:, None].astype(buf.dtype)
                else:
                    c = cint.astype(buf.dtype)
                return jnp.clip(y, -c, c), r, gpad
            return fn

        if swept:
            from .ops.coeffs import curve_grid
            g = curve_grid(self._curve, self._n0, m, self._tickf)
            ceil_db = jnp.asarray(g.astype(np.float32))
            cexp = np.exp2(g[:emit].astype(np.float32)
                           * np.float32(1.0 / 6.0206)).astype(np.float64)
            cint = jnp.asarray(np.rint(cexp * maxval).astype(np.int32))
        else:
            from .ops.coeffs import limiter_ceiling
            ceil_db = jnp.float32(self._ceil)
            cint = jnp.asarray(limiter_ceiling(self._ceil, width))
        if rel_swept:
            from .ops.coeffs import compressor_coeff_grids, curve_grid
            rg = curve_grid(self._rel_curve, self._n0, emit, self._tickf)
            decay = jnp.asarray(compressor_coeff_grids(
                np.zeros(emit), rg, self._sr)[1])
        else:
            decay = jnp.float32(self._decay)
        y, self._r, self._gpad = _cached(key, build)(
            buf, self._r, self._gpad, ceil_db, decay, cint)
        self._pend = buf[emit:]
        self._n0 += emit
        return y


class StreamingPhaser:
    """Chunked twin of ``Sample.phaser``: per-stage biquad states carry
    across chunks; the coefficient grids come from the SAME host
    absolute-frame derivation (ops.coeffs.phaser_coeff_grids), so the
    sweep stays aligned at any chunk size or seek.  Sweep floors below
    ~120 Hz route through the compensated float-float scan
    (ops.coeffs.phaser_wants_ff — same decision as the staged op).
    Curves (fx.phaser.wet/.dry) are host grids on the output stage;
    ``rate_curve``/``depth_curve`` (fx.phaser.rate/.depth) automate the
    LFO itself — the rate curve becomes per-frame u32 DDS increments
    whose cumulative phase is mirrored EXACTLY on host (the chorus-rate
    rule: ops.coeffs.chorus_inc_grid/chorus_phase_grid into
    phaser_coeff_grids_swept; a constant curve reproduces the static
    phase n*inc bit-exactly), the depth curve a per-frame f64 grid in
    the sweep-position formula.  Spec/budget: goldref.effects.phaser."""

    def __init__(self, samplerate: int, nchannels: int, rate: float = 0.5,
                 depth: float = 1.0, min_freq: float = 300.0,
                 max_freq: float = 3000.0, stages: int = 4,
                 q: float = 0.7071, wet: float = 0.5, dry: float = 1.0,
                 wet_curve=None, dry_curve=None, rate_curve=None,
                 depth_curve=None, tickf: float = 0.0,
                 start_frame: int = 0):
        from .ops.coeffs import phaser_wants_ff
        if not 1 <= int(stages) <= 12:
            raise ValueError("phaser stages must be in [1, 12]")
        if min_freq < 30.0 or max_freq <= min_freq:
            raise ValueError("phaser needs 30 <= min_freq < max_freq")
        self._sr = samplerate
        self._params = (float(rate), float(depth), float(min_freq),
                        float(max_freq), float(q))
        self._stages = int(stages)
        self._ff = phaser_wants_ff(min_freq)
        z = jnp.zeros(nchannels, jnp.float32)
        st = (z, z, z, z, z, z) if self._ff else (z, z, z, z)
        self._states = tuple(st for _ in range(self._stages))
        self._wet, self._dry = float(wet), float(dry)
        _require_tickf(tickf, wet_curve, dry_curve, rate_curve,
                       depth_curve)
        self._curves = (wet_curve, dry_curve)
        self._swept = any(c is not None for c in self._curves)
        self._rate_curve = rate_curve
        self._depth_curve = depth_curve
        self._n0 = int(start_frame)
        self._tickf = float(tickf)
        #: host-mirrored cumulative LFO phase (rate automation)
        self._p_carry = 0
        if rate_curve is not None and start_frame:
            # seek: replay the exact phase sum over [0, start_frame) in
            # bounded slabs (the chorus-rate rule)
            from .ops.coeffs import chorus_inc_grid, curve_grid
            carry = 0
            SLAB = 1 << 20
            for s0 in range(0, int(start_frame), SLAB):
                k = min(SLAB, int(start_frame) - s0)
                inc = chorus_inc_grid(
                    curve_grid(rate_curve, s0, k, tickf), samplerate)
                carry = (carry + int(inc.astype(np.uint64).sum())) \
                    & 0xFFFFFFFF
            self._p_carry = carry
        self.tail_frames = 0

    def process(self, x: jax.Array) -> jax.Array:
        from .ops.coeffs import curve_grid, ff_split, phaser_coeff_grids
        ff = self._ff
        stages = self._stages
        swept = self._swept
        width = dpcm.width_of(x)
        n = int(x.shape[0])
        key = ("phaser", ff, stages, swept, x.shape, str(x.dtype))

        def build():
            @jax.jit
            def fn(x, states, wet, dry, *coefs):
                s = dfx._norm(x)
                if ff:
                    grids = tuple((coefs[2 * i], coefs[2 * i + 1])
                                  for i in range(5))
                else:
                    grids = tuple(coefs)
                y, states = dfx.phaser_apply(s, grids, states, ff)
                if wet.ndim:
                    wet, dry = wet[:, None], dry[:, None]
                out = dry * s + wet * y
                return dfx.to_int_samples(out, width), states
            return fn

        rate, depth, fmin, fmax, q = self._params
        gd = np.float64 if ff else np.float32
        if self._rate_curve is not None or self._depth_curve is not None:
            from .ops.coeffs import (chorus_inc_grid, chorus_phase_grid,
                                     phaser_coeff_grids_swept)
            if self._rate_curve is not None:
                inc = chorus_inc_grid(
                    curve_grid(self._rate_curve, self._n0, n,
                               self._tickf), self._sr)
                P, self._p_carry = chorus_phase_grid(inc, self._p_carry)
            else:
                # static rate: the absolute-phase formula (stateless)
                inc0 = int(round(rate / self._sr * 4294967296.0)) \
                    & 0xFFFFFFFF
                P = (np.arange(self._n0, self._n0 + n, dtype=np.uint64)
                     * np.uint64(inc0)) & np.uint64(0xFFFFFFFF)
            dgrid = (curve_grid(self._depth_curve, self._n0, n,
                                self._tickf)
                     if self._depth_curve is not None
                     else np.full(n, depth, np.float64))
            grids = phaser_coeff_grids_swept(P, dgrid, fmin, fmax, q,
                                             self._sr, dtype=gd)
        else:
            grids = phaser_coeff_grids(self._n0, n, self._sr, rate, depth,
                                       fmin, fmax, q, dtype=gd)
        if ff:
            coefs = [jnp.asarray(part) for g in grids
                     for part in ff_split(g)]
        else:
            coefs = [jnp.asarray(g) for g in grids]
        if swept:
            wc, dc = self._curves
            wet = curve_grid(wc, self._n0, n, self._tickf) \
                if wc is not None else np.full(n, self._wet, np.float64)
            dry = curve_grid(dc, self._n0, n, self._tickf) \
                if dc is not None else np.full(n, self._dry, np.float64)
            wet = jnp.asarray(wet.astype(np.float32))
            dry = jnp.asarray(dry.astype(np.float32))
        else:
            wet, dry = jnp.float32(self._wet), jnp.float32(self._dry)
        y, self._states = _cached(key, build)(x, self._states, wet, dry,
                                              *coefs)
        self._n0 += n
        return y


class _StreamingLFOGain:
    """Shared chunked twin for the host-grid LFO gain fx (tremolo /
    autopan): the grid derives at absolute frames (static rate — fully
    stateless, seek-exact) or from a host-mirrored cumulative u32 phase
    (rate automation — the chorus-rate rule with slab seek replay);
    depth curves are per-frame grids.  Subclasses pick the grid fn and
    the device applier."""

    _GRID = None      # (P, depth) -> grid
    _APPLY = None     # staticmethod(x, grid) -> y

    def __init__(self, samplerate: int, nchannels: int, rate: float,
                 depth: float, rate_curve=None, depth_curve=None,
                 tickf: float = 0.0, start_frame: int = 0):
        if not 0.0 <= depth <= 1.0:
            raise ValueError("depth must be in [0, 1]")
        if not 0.0 < rate <= 20.0:
            raise ValueError("rate must be in (0, 20] Hz")
        self._sr = samplerate
        self._rate, self._depth = float(rate), float(depth)
        _require_tickf(tickf, rate_curve, depth_curve)
        self._rate_curve = rate_curve
        self._depth_curve = depth_curve
        self._tickf = float(tickf)
        self._n0 = int(start_frame)
        self._p_carry = 0
        self.tail_frames = 0
        if rate_curve is not None and start_frame:
            from .ops.coeffs import chorus_inc_grid, curve_grid
            carry = 0
            SLAB = 1 << 20
            for s0 in range(0, int(start_frame), SLAB):
                k = min(SLAB, int(start_frame) - s0)
                inc = chorus_inc_grid(
                    curve_grid(rate_curve, s0, k, tickf), samplerate)
                carry = (carry + int(inc.astype(np.uint64).sum())) \
                    & 0xFFFFFFFF
            self._p_carry = carry

    def process(self, x: jax.Array) -> jax.Array:
        from .ops.coeffs import (chorus_inc_grid, chorus_phase_grid,
                                 curve_grid, static_phase)
        n = int(x.shape[0])
        if self._rate_curve is not None:
            inc = chorus_inc_grid(
                curve_grid(self._rate_curve, self._n0, n, self._tickf),
                self._sr)
            P, self._p_carry = chorus_phase_grid(inc, self._p_carry)
        else:
            P = static_phase(self._n0, n, self._sr, self._rate)
        depth = (curve_grid(self._depth_curve, self._n0, n, self._tickf)
                 .astype(np.float32)
                 if self._depth_curve is not None else self._depth)
        grid = jnp.asarray(type(self)._GRID(P, depth))
        self._n0 += n
        key = (type(self).__name__, x.shape, str(x.dtype))

        def build():
            apply = type(self)._APPLY

            @jax.jit
            def fn(x, grid):
                return apply(x, grid)
            return fn

        return _cached(key, build)(x, grid)


class StreamingTremolo(_StreamingLFOGain):
    """Chunked twin of ``Sample.tremolo`` (fx.tremolo.rate/.depth
    automation; spec goldref.effects.tremolo)."""

    def __init__(self, samplerate: int, nchannels: int, rate: float = 5.0,
                 depth: float = 0.5, **kw):
        super().__init__(samplerate, nchannels, rate, depth, **kw)


class StreamingAutopan(_StreamingLFOGain):
    """Chunked twin of ``Sample.autopan`` (fx.autopan.rate/.depth
    automation; spec goldref.effects.autopan)."""

    def __init__(self, samplerate: int, nchannels: int, rate: float = 0.5,
                 depth: float = 1.0, **kw):
        if nchannels != 2:
            raise ValueError("[fx] autopan needs a stereo song")
        super().__init__(samplerate, nchannels, rate, depth, **kw)


def _init_lfo_grids():
    from .ops import effects as _dfx
    from .ops.coeffs import autopan_pan_grid, tremolo_gain_grid
    StreamingTremolo._GRID = staticmethod(tremolo_gain_grid)
    StreamingTremolo._APPLY = staticmethod(_dfx.tremolo)
    StreamingAutopan._GRID = staticmethod(autopan_pan_grid)
    StreamingAutopan._APPLY = staticmethod(_dfx.autopan)


_init_lfo_grids()


FX_PARAMS: Dict[str, Tuple[Tuple[str, ...], Dict[str, type]]] = {
    "compress": (("threshold_db", "ratio", "attack", "release", "makeup_db",
                  "knee_db", "sidechain"),
                 {"sidechain": str}),
    "reverb": (("roomsize", "damping", "wet", "dry", "width", "tail"), {}),
    "chorus": (("rate", "rate_beats", "depth", "delay", "voices", "wet",
                "dry"),
               {"voices": int}),
    "convolve": (("ir", "wet", "dry"), {"ir": str}),
    "filter": (("kind", "cutoff", "q", "gain_db"), {"kind": str}),
    "eq": (("low_db", "mid_db", "high_db", "low_freq", "mid_freq",
            "mid_q", "high_freq"), {}),
    "gate": (("threshold_db", "range_db", "attack", "release"), {}),
    "echo": (("delay", "beats", "feedback", "wet", "dry", "tail"), {}),
    "width": (("amount",), {}),
    "limiter": (("ceiling_db", "release", "lookahead"), {}),
    "phaser": (("rate", "rate_beats", "depth", "min_freq", "max_freq",
                "stages", "q", "wet", "dry"), {"stages": int}),
    "tremolo": (("rate", "rate_beats", "depth"), {}),
    "autopan": (("rate", "rate_beats", "depth"), {}),
}

# effects whose streaming twin withholds lookahead frames (variable-length
# process() output) — master-chain only, rejected on fixed-size track buses
HOLDBACK_FX = ("limiter",)

FILTER_KINDS = ("lowpass", "highpass", "bandpass",
                "lowshelf", "highshelf", "peaking")


def validate_fx_params(name: str, params: dict) -> dict:
    """Validate one effect's parameter dict against FX_PARAMS (keys and
    value types); returns the coerced dict.  Shared by the ini parser and
    the programmatic Song.add_fx path."""
    if name not in FX_PARAMS:
        raise ValueError(f"unknown effect {name!r} in [fx] "
                         f"(have: {', '.join(sorted(FX_PARAMS))})")
    allowed, types = FX_PARAMS[name]
    out: dict = {}
    for k, v in params.items():
        if k not in allowed:
            raise ValueError(f"[fx] {name}: unknown parameter {k!r} "
                             f"(have: {', '.join(allowed)})")
        t = types.get(k, float)
        out[k] = v if t is str else t(v)
    if name == "convolve" and "ir" not in out:
        raise ValueError("[fx] convolve needs ir=<wav file>")
    if name == "filter":
        if not {"kind", "cutoff"} <= set(out):
            raise ValueError("[fx] filter needs kind= and cutoff=")
        if out["kind"] not in FILTER_KINDS:
            raise ValueError(f"[fx] filter: unknown kind {out['kind']!r}")
    if name == "echo":
        if ("delay" in out) == ("beats" in out):
            raise ValueError("[fx] echo needs exactly one of delay= "
                             "(seconds) or beats= (tempo-synced)")
    if name == "width" and "amount" not in out:
        raise ValueError("[fx] width needs amount=")
    if name in ("chorus", "phaser", "tremolo", "autopan") \
            and "rate" in out and "rate_beats" in out:
        raise ValueError(f"[fx] {name}: give rate= Hz or rate_beats= "
                         f"(tempo-synced), not both")
    return out


def parse_fx_items(items: Sequence[Tuple[str, str]]) -> List[Tuple[str, dict]]:
    """Parse ``[fx]`` section items: each value is whitespace-separated
    ``key=value`` pairs.  Pure parsing — ``ir`` stays a filename string so
    callers control path resolution (the render server validates it against
    its sample root exactly like instrument files)."""
    out: List[Tuple[str, dict]] = []
    for name, valstr in items:
        params: dict = {}
        for tok in valstr.split():
            if "=" not in tok:
                raise ValueError(f"[fx] {name}: expected key=value, "
                                 f"got {tok!r}")
            k, v = tok.split("=", 1)
            params[k] = v
        out.append((name, validate_fx_params(name, params)))
    return out




def _fx_curves(automation):
    """The automation curves the fx machinery understands, parsed ONCE —
    shared by FxChain (streaming) and run_fx_chain_ops (offline) so the
    two paths cannot drift apart when a key is added."""
    auto = automation or {}
    return dict(
        cutoff_curve=auto.get("fx.filter.cutoff"),
        rev_wet=auto.get("fx.reverb.wet"),
        rev_dry=auto.get("fx.reverb.dry"),
        rev_room=auto.get("fx.reverb.roomsize"),
        cho_wet=auto.get("fx.chorus.wet"),
        cho_dry=auto.get("fx.chorus.dry"),
        cho_rate=auto.get("fx.chorus.rate"),
        cho_depth=auto.get("fx.chorus.depth"),
        comp_curves=dict(
            makeup_curve=auto.get("fx.compress.makeup_db"),
            threshold_curve=auto.get("fx.compress.threshold_db"),
            ratio_curve=auto.get("fx.compress.ratio"),
            attack_curve=auto.get("fx.compress.attack"),
            release_curve=auto.get("fx.compress.release"),
            knee_curve=auto.get("fx.compress.knee_db")),
        gate_thr=auto.get("fx.gate.threshold_db"),
        eq_low=auto.get("fx.eq.low_db"),
        eq_mid=auto.get("fx.eq.mid_db"),
        eq_high=auto.get("fx.eq.high_db"),
        echo_fb=auto.get("fx.echo.feedback"),
        echo_wet=auto.get("fx.echo.wet"),
        echo_dry=auto.get("fx.echo.dry"),
        width_amt=auto.get("fx.width.amount"),
        lim_ceil=auto.get("fx.limiter.ceiling_db"),
        lim_rel=auto.get("fx.limiter.release"),
        pha_wet=auto.get("fx.phaser.wet"),
        pha_dry=auto.get("fx.phaser.dry"),
        pha_rate=auto.get("fx.phaser.rate"),
        pha_depth=auto.get("fx.phaser.depth"),
        trem_rate=auto.get("fx.tremolo.rate"),
        trem_depth=auto.get("fx.tremolo.depth"),
        ap_rate=auto.get("fx.autopan.rate"),
        ap_depth=auto.get("fx.autopan.depth"),
    )


def _require_tickf(tickf: float, *curves):
    """Guard the curve-time base: a curve with the default tickf=0 would
    silently freeze at its last breakpoint (n/0 = inf in the interp)."""
    if any(c is not None for c in curves) and not tickf > 0.0:
        raise ValueError("automation curves need tickf > 0 (the frames "
                         "per tick that curve ticks are measured in)")


class FxChain:
    """An ordered master-bus chain for the STREAMING path.  Built from the
    parsed ``[fx]`` spec plus resolved IR samples; processes int chunks in
    order, carrying each effect's device state.  ``tail_frames`` is the
    silence to feed after the programme so reverb/convolution tails drain
    (each effect's tail also rings through the effects after it)."""

    def __init__(self, fx: Sequence[Tuple[str, dict]], samplerate: int,
                 nchannels: int,
                 ir_samples: Optional[Dict[str, "object"]] = None,
                 automation: Optional[Dict[str, list]] = None,
                 tickf: float = 0.0, start_frame: int = 0,
                 sidechain_keys: Optional[Dict[str, "object"]] = None):
        """``sidechain_keys``: name -> ``key_fn(n0, n) -> int16 [n, ch]``
        providers consumed by ``compress`` entries with ``sidechain=name``
        (the song layer passes each drum instrument's own hits bus)."""
        cv = _fx_curves(automation)
        cutoff_curve = cv["cutoff_curve"]
        rev_wet, rev_dry = cv["rev_wet"], cv["rev_dry"]
        rev_room = cv["rev_room"]
        cho_wet, cho_dry = cv["cho_wet"], cv["cho_dry"]
        cho_rate, cho_depth = cv["cho_rate"], cv["cho_depth"]
        comp_curves = cv["comp_curves"]
        gate_thr = cv["gate_thr"]
        self.processors = []
        for name, p in fx:
            if name == "compress":
                q = dict(p)
                sc = q.pop("sidechain", None)
                key_fn = None
                if sc is not None:
                    key_fn = (sidechain_keys or {}).get(sc)
                    if key_fn is None:
                        raise ValueError(
                            f"compress sidechain={sc!r}: no key provider "
                            f"(the song layer supplies drum-instrument "
                            f"buses)")
                swept_comp = any(v is not None
                                 for v in comp_curves.values())
                if key_fn is not None and swept_comp:
                    # the offline staged sidechain op takes no curves —
                    # keep the two paths' capabilities identical
                    raise ValueError(
                        "sidechain compression cannot be combined with "
                        "fx.compress.* automation curves (pick one)")
                if swept_comp or key_fn is not None:
                    proc = StreamingCompressor(
                        samplerate, tickf=tickf, start_frame=start_frame,
                        key_fn=key_fn, **comp_curves, **q)
                else:
                    proc = StreamingCompressor(samplerate, **q)
            elif name == "filter":
                if cutoff_curve is not None:
                    # fx.filter.cutoff automation: the curve replaces the
                    # entry's static cutoff; gain kinds ride host-derived
                    # frequency-varying grids (they carry gain_db)
                    if p["kind"] in ("lowshelf", "highshelf", "peaking"):
                        proc = SweptGainKindBiquad(
                            samplerate, nchannels, p["kind"],
                            p.get("q", 0.7071), p.get("gain_db", 0.0),
                            cutoff_curve, tickf, start_frame)
                    else:
                        proc = SweptStreamingBiquad(
                            samplerate, nchannels, p["kind"],
                            p.get("q", 0.7071), cutoff_curve, tickf,
                            start_frame)
                else:
                    proc = StreamingBiquad(samplerate, nchannels, **p)
            elif name == "eq":
                eq_c = (cv["eq_low"], cv["eq_mid"], cv["eq_high"])
                if any(c is not None for c in eq_c):
                    proc = StreamingEQ(samplerate, nchannels,
                                       low_curve=eq_c[0],
                                       mid_curve=eq_c[1],
                                       high_curve=eq_c[2], tickf=tickf,
                                       start_frame=start_frame, **p)
                else:
                    proc = StreamingEQ(samplerate, nchannels, **p)
            elif name == "gate":
                if gate_thr is not None:
                    proc = StreamingGate(samplerate,
                                         threshold_curve=gate_thr,
                                         tickf=tickf,
                                         start_frame=start_frame, **p)
                else:
                    proc = StreamingGate(samplerate, **p)
            elif name == "reverb":
                if (rev_wet is not None or rev_dry is not None
                        or rev_room is not None):
                    proc = StreamingReverb(samplerate, nchannels,
                                           wet_curve=rev_wet,
                                           dry_curve=rev_dry,
                                           roomsize_curve=rev_room,
                                           tickf=tickf,
                                           start_frame=start_frame, **p)
                else:
                    proc = StreamingReverb(samplerate, nchannels, **p)
            elif name == "chorus":
                if (cho_wet is not None or cho_dry is not None
                        or cho_rate is not None or cho_depth is not None):
                    proc = StreamingChorus(samplerate, nchannels,
                                           wet_curve=cho_wet,
                                           dry_curve=cho_dry,
                                           rate_curve=cho_rate,
                                           depth_curve=cho_depth,
                                           tickf=tickf,
                                           start_frame=start_frame, **p)
                else:
                    proc = StreamingChorus(samplerate, nchannels, **p)
            elif name == "echo":
                ec = (cv["echo_fb"], cv["echo_wet"], cv["echo_dry"])
                if any(c is not None for c in ec):
                    proc = StreamingFeedbackEcho(
                        samplerate, nchannels, feedback_curve=ec[0],
                        wet_curve=ec[1], dry_curve=ec[2], tickf=tickf,
                        start_frame=start_frame, **p)
                else:
                    proc = StreamingFeedbackEcho(samplerate, nchannels, **p)
            elif name == "width":
                wa = cv["width_amt"]
                if wa is not None:
                    proc = StreamingWidth(samplerate, nchannels,
                                          amount_curve=wa, tickf=tickf,
                                          start_frame=start_frame, **p)
                else:
                    proc = StreamingWidth(samplerate, nchannels, **p)
            elif name == "limiter":
                lc, lr = cv["lim_ceil"], cv["lim_rel"]
                if lc is not None or lr is not None:
                    proc = StreamingLimiter(samplerate, nchannels,
                                            ceiling_curve=lc,
                                            release_curve=lr, tickf=tickf,
                                            start_frame=start_frame, **p)
                else:
                    proc = StreamingLimiter(samplerate, nchannels, **p)
            elif name == "phaser":
                pc = (cv["pha_wet"], cv["pha_dry"], cv["pha_rate"],
                      cv["pha_depth"])
                if any(c is not None for c in pc):
                    proc = StreamingPhaser(samplerate, nchannels,
                                           wet_curve=pc[0], dry_curve=pc[1],
                                           rate_curve=pc[2],
                                           depth_curve=pc[3],
                                           tickf=tickf,
                                           start_frame=start_frame, **p)
                else:
                    proc = StreamingPhaser(samplerate, nchannels, **p)
            elif name in ("tremolo", "autopan"):
                cls = (StreamingTremolo if name == "tremolo"
                       else StreamingAutopan)
                rc = cv[("trem_rate" if name == "tremolo" else "ap_rate")]
                dc = cv[("trem_depth" if name == "tremolo"
                         else "ap_depth")]
                if rc is not None or dc is not None:
                    proc = cls(samplerate, nchannels, rate_curve=rc,
                               depth_curve=dc, tickf=tickf,
                               start_frame=start_frame, **p)
                else:
                    proc = cls(samplerate, nchannels,
                               start_frame=start_frame, **p)
            elif name == "convolve":
                q = dict(p)
                ir = (ir_samples or {})[q.pop("ir")]
                # same contract the offline Sample.convolve op enforces —
                # a Song must either render on both paths or fail on both
                if ir.samplerate != samplerate:
                    raise ValueError("impulse response samplerate mismatch")
                if ir.nchannels not in (1, nchannels):
                    raise ValueError("impulse response channel mismatch")
                irn = (ir.get_frame_array().astype(np.float32)
                       / np.float32(dpcm.MAXVAL[ir.samplewidth]))
                proc = StreamingConvolver(irn, **q)
            else:                                   # pragma: no cover
                raise ValueError(name)
            self.processors.append(proc)
        # the ONE tail/flush authority, shared with apply_fx_sample
        self.tail_frames = chain_tail_frames(fx, samplerate, ir_samples)
        self.flush_frames = chain_flush_frames(fx, samplerate)
        self.samplerate = samplerate
        self.nchannels = nchannels

    def process(self, x: jax.Array) -> jax.Array:
        for p in self.processors:
            x = p.process(x)
        return x


def chain_tail_frames(fx: Sequence[Tuple[str, dict]], samplerate: int,
                      ir_samples: Optional[Dict[str, "object"]] = None) -> int:
    """Total decay tail of the chain: reverb tails + echo trains +
    convolution IR tails."""
    from .ops.coeffs import echo_tail_frames
    total = 0
    for name, p in fx:
        if name == "reverb":
            total += int(p.get("tail", DEFAULT_REVERB_TAIL) * samplerate)
        elif name == "echo":
            if "delay" not in p:
                raise ValueError("[fx] echo beats= needs a song tempo to "
                                 "resolve — use delay= seconds here")
            total += echo_tail_frames(samplerate, p["delay"],
                                      p.get("feedback", 0.4),
                                      p.get("wet", 0.5), p.get("tail"))
        elif name == "convolve":
            total += (ir_samples or {})[p["ir"]].nframes - 1
    return total


def chain_flush_frames(fx: Sequence[Tuple[str, dict]],
                       samplerate: int) -> int:
    """Total lookahead holdback of the chain (HOLDBACK_FX entries): the
    EXTRA silence to feed past the decay tail so holdback processors
    emit their final frames; the offline path pads by the same amount
    and truncates back, so streaming == offline exactly."""
    total = 0
    for name, p in fx:
        if name == "limiter":
            total += max(1, int(p.get("lookahead", 0.005) * samplerate))
    return total


def apply_fx_sample(sample, fx: Sequence[Tuple[str, dict]],
                    ir_samples: Optional[Dict[str, "object"]] = None,
                    automation: Optional[Dict[str, list]] = None,
                    tickf: float = 0.0, sidechain_keys=None):
    """Apply the chain OFFLINE by staging the lazy Sample ops (the whole
    chain fuses into the sample's device program).  Returns the sample.

    Chain semantics (matching the streaming FxChain + silence feed): the
    programme is first extended by the chain's total tail, then EVERY
    effect runs over the full extended length — so an early effect's decay
    rings through the effects after it, exactly as a streamed signal
    would.  Length-extending ops are therefore applied tail-less here
    (reverb with tail=0; convolve truncated back), the shared pad having
    already reserved their decay room.  HOLDBACK_FX entries (the limiter)
    get ``chain_flush_frames`` of extra pad so their lookahead reads the
    same upstream decay the stream feeds them, and truncate it back —
    streaming == offline exactly."""
    tail = chain_tail_frames(fx, sample.samplerate, ir_samples)
    flush = chain_flush_frames(fx, sample.samplerate)
    sample.pad_frames(tail + flush)
    return run_fx_chain_ops(sample, fx, ir_samples,
                            automation=automation, tickf=tickf,
                            sidechain_keys=sidechain_keys)


def run_fx_chain_ops(sample, fx: Sequence[Tuple[str, dict]],
                     ir_samples: Optional[Dict[str, "object"]] = None,
                     automation: Optional[Dict[str, list]] = None,
                     tickf: float = 0.0, sidechain_keys=None):
    """The op loop of ``apply_fx_sample`` WITHOUT the tail pad — for
    callers that already reserved the chain's decay room in ``sample``
    (e.g. a song's per-synth-track bus, rendered out to the padded song
    length).  Length is preserved.

    With ``automation`` curves, the automated entries run eagerly as
    whole-signal calls (n0=0) of the SAME code the streaming path uses —
    fx.filter.cutoff as the swept biquad, fx.reverb.wet/.dry through the
    streaming reverb with per-frame output gains; everything else still
    stages/fuses."""
    cv = _fx_curves(automation)
    cutoff_curve = cv["cutoff_curve"]
    rev_wet, rev_dry = cv["rev_wet"], cv["rev_dry"]
    rev_room = cv["rev_room"]
    cho_wet, cho_dry = cv["cho_wet"], cv["cho_dry"]
    cho_rate, cho_depth = cv["cho_rate"], cv["cho_depth"]
    comp_curves = cv["comp_curves"]
    comp_swept = any(v is not None for v in comp_curves.values())
    gate_thr = cv["gate_thr"]
    eq_curves = (cv["eq_low"], cv["eq_mid"], cv["eq_high"])
    for name, p in fx:
        if name == "convolve":
            q = dict(p)
            ir = (ir_samples or {})[q.pop("ir")]
            n = sample.nframes
            sample.convolve(ir, **q).truncate_frames(n)
        elif name == "compress" and p.get("sidechain"):
            # ducking: the key is a whole-length Sample of the named
            # instrument's own hits bus; the staged sidechain op fuses
            q = dict(p)
            sc = q.pop("sidechain")
            key = (sidechain_keys or {}).get(sc)
            if key is None:
                raise ValueError(
                    f"compress sidechain={sc!r}: no key provider")
            if comp_swept:
                raise ValueError(
                    "sidechain compression cannot be combined with "
                    "fx.compress.* automation curves (pick one)")
            sample.compress(sidechain=key, **q)
        elif name == "reverb" and (rev_wet is not None
                                   or rev_dry is not None
                                   or rev_room is not None):
            q = dict(p)
            q["tail"] = 0.0
            proc = StreamingReverb(sample.samplerate, sample.nchannels,
                                   wet_curve=rev_wet, dry_curve=rev_dry,
                                   roomsize_curve=rev_room,
                                   tickf=tickf, start_frame=0, **q)
            sample._replace_frames(proc.process(sample.jax_frames))
        elif name == "reverb":
            q = dict(p)
            q["tail"] = 0.0
            sample.reverb(**q)
        elif name == "chorus" and (cho_wet is not None
                                   or cho_dry is not None
                                   or cho_rate is not None
                                   or cho_depth is not None):
            proc = StreamingChorus(sample.samplerate, sample.nchannels,
                                   wet_curve=cho_wet, dry_curve=cho_dry,
                                   rate_curve=cho_rate,
                                   depth_curve=cho_depth,
                                   tickf=tickf, start_frame=0, **p)
            sample._replace_frames(proc.process(sample.jax_frames))
        elif name == "compress" and comp_swept:
            proc = StreamingCompressor(sample.samplerate, tickf=tickf,
                                       start_frame=0, **comp_curves, **p)
            sample._replace_frames(proc.process(sample.jax_frames))
        elif name == "gate" and gate_thr is not None:
            proc = StreamingGate(sample.samplerate,
                                 threshold_curve=gate_thr, tickf=tickf,
                                 start_frame=0, **p)
            sample._replace_frames(proc.process(sample.jax_frames))
        elif name == "eq" and any(c is not None for c in eq_curves):
            proc = StreamingEQ(sample.samplerate, sample.nchannels,
                               low_curve=eq_curves[0],
                               mid_curve=eq_curves[1],
                               high_curve=eq_curves[2], tickf=tickf,
                               start_frame=0, **p)
            sample._replace_frames(proc.process(sample.jax_frames))
        elif name == "filter" and cutoff_curve is not None:
            if p["kind"] in ("lowshelf", "highshelf", "peaking"):
                proc = SweptGainKindBiquad(
                    sample.samplerate, sample.nchannels, p["kind"],
                    p.get("q", 0.7071), p.get("gain_db", 0.0),
                    cutoff_curve, tickf, start_frame=0)
                sample._replace_frames(proc.process(sample.jax_frames))
            else:
                xs = jnp.asarray([t for t, _ in cutoff_curve],
                                 jnp.float32)
                vs = jnp.asarray([v for _, v in cutoff_curve],
                                 jnp.float32)
                y, _ = swept_biquad_chunk(
                    sample.jax_frames, 0, p["kind"], p.get("q", 0.7071),
                    xs, vs, tickf, sample.samplerate)
                sample._replace_frames(y)
        elif name == "echo":
            ec = (cv["echo_fb"], cv["echo_wet"], cv["echo_dry"])
            if any(c is not None for c in ec):
                proc = StreamingFeedbackEcho(
                    sample.samplerate, sample.nchannels,
                    feedback_curve=ec[0], wet_curve=ec[1],
                    dry_curve=ec[2], tickf=tickf, start_frame=0, **p)
                sample._replace_frames(proc.process(sample.jax_frames))
            else:
                q = dict(p)
                q.pop("tail", None)
                # the shared pad already reserved the echo's decay room
                sample.feedback_echo(q.pop("delay"), tail=0.0, **q)
        elif name == "width":
            wa = cv["width_amt"]
            if wa is not None:
                proc = StreamingWidth(sample.samplerate, sample.nchannels,
                                      amount_curve=wa, tickf=tickf,
                                      start_frame=0, **p)
                sample._replace_frames(proc.process(sample.jax_frames))
            else:
                sample.stereo_width(p["amount"])
        elif name == "limiter":
            # run the STREAMING holdback processor over the whole signal
            # (apply_fx_sample padded the flush room): emits len-L frames,
            # truncating the pad back — identical to the streamed chain
            lc, lr = cv["lim_ceil"], cv["lim_rel"]
            proc = StreamingLimiter(sample.samplerate, sample.nchannels,
                                    ceiling_curve=lc, release_curve=lr,
                                    tickf=tickf, start_frame=0, **p) \
                if (lc is not None or lr is not None) else \
                StreamingLimiter(sample.samplerate, sample.nchannels, **p)
            sample._replace_frames(proc.process(sample.jax_frames))
        elif name == "phaser":
            pc = (cv["pha_wet"], cv["pha_dry"], cv["pha_rate"],
                  cv["pha_depth"])
            if any(c is not None for c in pc):
                proc = StreamingPhaser(sample.samplerate, sample.nchannels,
                                       wet_curve=pc[0], dry_curve=pc[1],
                                       rate_curve=pc[2],
                                       depth_curve=pc[3],
                                       tickf=tickf, start_frame=0, **p)
                sample._replace_frames(proc.process(sample.jax_frames))
            else:
                sample.phaser(**p)
        elif name in ("tremolo", "autopan"):
            rc = cv[("trem_rate" if name == "tremolo" else "ap_rate")]
            dc = cv[("trem_depth" if name == "tremolo" else "ap_depth")]
            if rc is not None or dc is not None:
                cls = (StreamingTremolo if name == "tremolo"
                       else StreamingAutopan)
                proc = cls(sample.samplerate, sample.nchannels,
                           rate_curve=rc, depth_curve=dc, tickf=tickf,
                           start_frame=0, **p)
                sample._replace_frames(proc.process(sample.jax_frames))
            else:
                getattr(sample, name)(**p)
        else:
            getattr(sample, name)(**p)
    return sample
