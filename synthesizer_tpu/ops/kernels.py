"""Fused Pallas voice-bank render kernel.

The Pallas/Mosaic twin of ``models.voicebank.render_block``: one kernel
renders the whole song (or one streaming chunk) with a sequential grid over
output tiles; every tile evaluates phase -> FM -> waveform -> ADSR -> pan
mix for all voice groups entirely in VMEM and writes a [2, TILE] stereo
slab.  This is the "native" hot path promised by SURVEY.md §3.3 (Pallas
row) and BASELINE.json's fused-kernel north star.

Mosaic quirks handled here (probed on the axon TPU v5 lite):

* no uint32<->float casts: the DDS phase lives in *signed* int32 turn
  units (two's-complement wrap == mod 2^32); waveforms are rewritten in
  the folded v in [-0.5, 0.5] domain (see each helper);
* unsigned comparisons (pulse width) become sign-bit-flipped signed ones;
* logical shifts via jax.lax.shift_right_logical.

Numeric contract: identical formulas to the XLA path, with int32->f32
phase conversion instead of uint32->f32 (differences <= 2^-24 turn; the
integer comparisons square/pulse are bit-identical).  Pinned against the
XLA engine in tests/test_pallas_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.voicebank import BankLayout, VoiceParams
from .trig import _C as _SIN_COEFFS

_TWO_NEG32 = np.float32(2.0 ** -32)


def _sin_v(v):
    """sin(2*pi*v) for folded v in [-0.5, 0.5] (shared minimax poly)."""
    v2 = v * v
    acc = _SIN_COEFFS[-1]
    for c in _SIN_COEFFS[-2::-1]:
        acc = acc * v2 + c
    return acc * v


def _fold(x):
    return x - jnp.rint(x)


def _phase_v(p_i32):
    """int32 phase -> folded turn fraction v in [-0.5, 0.5]."""
    return _fold(p_i32.astype(jnp.float32) * _TWO_NEG32)


def _kernel(n0_ref,                      # SMEM [1] i32: absolute frame offset
            wavep,                       # VMEM param refs ([V,1] / [V,H])...
            base_inc, phase0, amp, bias, start, gate,
            attack, decay, sustain_level, release,
            fm_inc, fm_phase0, fm_depth, fm_r, fm_c0,
            pulse_width, seed, noise_hold, harm_amps, damping,
            glide_inc0, glide_d, glide_frames,
            out_ref,                     # [2, TILE]
            *, tile: int, samplerate: int, layout: BankLayout,
            use_glide: bool = False):
    t = pl.program_id(0)
    n = (n0_ref[0] + t * tile
         + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1))   # [1, T]
    nf = n.astype(jnp.float32)
    H = layout.num_harmonics

    acc_l = jnp.zeros((1, tile), jnp.float32)
    acc_r = jnp.zeros((1, tile), jnp.float32)

    for (wid, has_fm, gstart, gcount) in layout.groups:
        if wid == 11:
            # wavetable groups render on the XLA side of the hybrid
            # (render_stereo_pallas adds them): the per-voice table
            # gather does not lower on this platform's Mosaic backend —
            # jax-level pallas lowering accepts the same-shape
            # take_along_axis form, but the axon remote compiler crashes
            # on the gather op (probed on hardware; the battery's
            # pallas/wavetable_gather_probe check keeps this cited and
            # trips if a compiler upgrade ever makes it compile)
            continue
        sl = slice(gstart, gstart + gcount)
        inc = base_inc[sl]              # [g, 1] i32
        p = phase0[sl] + n * inc        # [g, T] i32 wrap == u32 mod 2^32

        if use_glide and wid != 12:
            # portamento: linear-in-increment integer chirp, closed form
            # (voicebank._phases docstring) in the i32 wrap domain.  tri(m)
            # halves the even factor BEFORE the wrapped multiply; negative
            # note-relative m is envelope-masked garbage, same as XLA.
            # pluck (wid 12) is excluded exactly like the XLA engine: its
            # spectral decay rates are tied to ONE pitch, so glide voices
            # render at the target pitch (voicebank._phases).
            m = n - start[sl]                          # [g, T] i32
            even = (m & jnp.int32(1)) == 0
            a = jnp.where(even, jax.lax.shift_right_logical(m, 1), m)
            b = jnp.where(even, m - jnp.int32(1),
                          jax.lax.shift_right_logical(m - jnp.int32(1), 1))
            gi0, gd = glide_inc0[sl], glide_d[sl]      # [g, 1] i32
            G = glide_frames[sl]
            Ge = (G & jnp.int32(1)) == 0
            Ga = jnp.where(Ge, jax.lax.shift_right_logical(G, 1), G)
            Gb = jnp.where(Ge, G - jnp.int32(1),
                           jax.lax.shift_right_logical(G - jnp.int32(1), 1))
            during = gi0 * m + gd * (a * b)
            phase_g = gi0 * G + gd * (Ga * Gb)
            inc_g = gi0 + gd * G
            after = phase_g + (m - G) * inc_g
            pg = phase0[sl] + jnp.where(m < G, during, after)
            p = jnp.where(G > 0, pg, p)

        if has_fm:
            fi = fm_inc[sl]
            fp = fm_phase0[sl] + n * fi
            x_half = _phase_v(fp - jax.lax.shift_right_logical(fi, 1))
            cosv = _sin_v(_fold(x_half + jnp.float32(0.25)))
            s_n = (fm_c0[sl] - cosv) * fm_r[sl]
            delta = inc.astype(jnp.float32) * fm_depth[sl] * s_n
            q = delta * _TWO_NEG32
            frac = q - jnp.rint(q)
            dunits = (frac * jnp.float32(4294967296.0)).astype(jnp.int32)
            fm_on = (fm_depth[sl] != 0.0) & (fi != 0)
            p = jnp.where(fm_on, p + dunits, p)

        one = jnp.float32(1.0)
        if wid == 0:                                   # sine
            w = _sin_v(_phase_v(p))
        elif wid == 1:                                 # triangle
            v = _phase_v(p)
            w = jnp.where(jnp.abs(v) <= 0.25, jnp.float32(4.0) * v,
                          jnp.sign(v) * (jnp.float32(2.0) - jnp.float32(4.0) * jnp.abs(v)))
        elif wid == 2:                                 # square: p_u < 2^31
            w = jnp.where(p >= 0, one, -one)
        elif wid == 3:                                 # sawtooth: 2x - 1
            v = _phase_v(p)
            w = jnp.float32(2.0) * v - jnp.where(p >= 0, one, -one)
        elif wid == 4:                                 # pulse: p_u < width_u
            wu = (pulse_width[sl] * jnp.float32(4294967296.0)).astype(jnp.int32)
            sign = jnp.int32(-2**31)
            w = jnp.where((p ^ sign) < (wu ^ sign), one, -one)
        elif wid == 5:                                 # semicircle
            v = _phase_v(p)
            up = jnp.sqrt(jnp.maximum(jnp.float32(0.0),
                                      one - (jnp.float32(4.0) * v - one) ** 2))
            dn = -jnp.sqrt(jnp.maximum(jnp.float32(0.0),
                                       one - (jnp.float32(4.0) * v + one) ** 2))
            w = jnp.where(p >= 0, up, dn)
        elif wid == 6:                                 # pointy = tri^3
            v = _phase_v(p)
            tri = jnp.where(jnp.abs(v) <= 0.25, jnp.float32(4.0) * v,
                            jnp.sign(v) * (jnp.float32(2.0) - jnp.float32(4.0) * jnp.abs(v)))
            w = tri * tri * tri
        elif wid == 7:                                 # white noise (hash)
            idx = n // noise_hold[sl]                  # sample-and-hold
            x = idx * jnp.int32(0x9E3779B9 - 2**32) + seed[sl]
            x = x ^ jax.lax.shift_right_logical(x, 16)
            x = x * jnp.int32(0x7FEB352D)
            x = x ^ jax.lax.shift_right_logical(x, 15)
            x = x * jnp.int32(0x846CA68B - 2**32)
            x = x ^ jax.lax.shift_right_logical(x, 16)
            w = (jax.lax.shift_right_logical(x, 8).astype(jnp.float32)
                 * jnp.float32(2.0 ** -23) - one)
        elif wid == 8:                                 # harmonic stack
            w = jnp.zeros(p.shape, jnp.float32)
            for k in range(1, H + 1):
                w = w + harm_amps[sl, k - 1:k] * _sin_v(_phase_v(p * jnp.int32(k)))
        elif wid in (9, 10):                           # polyBLEP saw/square
            v = _phase_v(p)
            x = v + jnp.where(v < 0, one, jnp.float32(0.0))   # t in [0, 1)
            # dt tracks the INSTANTANEOUS chirp increment during a glide
            # (residual placed at the current pitch, not the landing one);
            # u32-in-i32 bitcast: a negative i32 view means u32 >= 2^31,
            # corrected by +1.0 after the 2^-32 scale
            if use_glide:
                mg = n - start[sl]
                mcl = jnp.clip(mg, 0, glide_frames[sl])
                ii = glide_inc0[sl] + mcl * glide_d[sl]        # i32 wrap
                ii = jnp.where(glide_frames[sl] > 0, ii, base_inc[sl])
            else:
                ii = base_inc[sl]
            dt = jnp.maximum(ii.astype(jnp.float32) * _TWO_NEG32
                             + jnp.where(ii < 0, one, jnp.float32(0.0)),
                             jnp.float32(1e-9))

            def blep(t):
                u0 = t / dt
                lo = (u0 + u0) - u0 * u0 - one
                u1 = (t - one) / dt
                hi = u1 * u1 + (u1 + u1) + one
                return jnp.where(t < dt, lo,
                                 jnp.where(t > one - dt, hi, jnp.float32(0.0)))

            if wid == 9:
                w = (jnp.float32(2.0) * x - one) - blep(x)
            else:
                naive = jnp.where(p >= 0, one, -one)
                x2 = jnp.where(x < 0.5, x + jnp.float32(0.5), x - jnp.float32(0.5))
                w = naive + blep(x) - blep(x2)
        elif wid == 12:                                # pluck (spectral KS)
            # spec: goldref/spec.py.  Per-voice constants recompute per
            # tile ([g,1] ops — cheap); the k loop is static over H.
            sign = jnp.int32(-2**31)

            def hash_i32(idx_i32):
                x = idx_i32 * jnp.int32(0x9E3779B9 - 2**32) + seed[sl]
                x = x ^ jax.lax.shift_right_logical(x, 16)
                x = x * jnp.int32(0x7FEB352D)
                x = x ^ jax.lax.shift_right_logical(x, 15)
                x = x * jnp.int32(0x846CA68B - 2**32)
                return x ^ jax.lax.shift_right_logical(x, 16)

            K = max(1, H)
            # inc is bitcast u32 in i32; any ACTIVE harmonic needs
            # k*inc_u < 2^31, so inc_u < 2^31 and the i32 value is the
            # true magnitude wherever the mask is on
            ratio = jnp.clip(inc.astype(jnp.float32) * _TWO_NEG32,
                             jnp.float32(0.0), jnp.float32(0.5))
            nrel = jnp.maximum((n - start[sl]).astype(jnp.float32),
                               jnp.float32(0.0))                  # [g, T]
            us, actives = [], []
            denom = jnp.zeros(inc.shape, jnp.float32)
            for k in range(1, K + 1):
                uk = (jax.lax.shift_right_logical(
                    hash_i32(jnp.full(inc.shape, k, jnp.int32)), 8)
                    .astype(jnp.float32) * jnp.float32(2.0 ** -23) - one)
                lim = jnp.int32((2**31 - 1) // k)
                ak = ((inc ^ sign) <= (lim ^ sign)) & (inc != 0)  # unsigned
                us.append(uk)
                actives.append(ak)
                denom = denom + jnp.where(ak, jnp.abs(uk), jnp.float32(0.0))
            denom = jnp.maximum(denom, jnp.float32(1e-30))
            w = jnp.zeros(p.shape, jnp.float32)
            for k in range(1, K + 1):
                phi = hash_i32(jnp.full(inc.shape, K + k, jnp.int32))
                # cos(pi*k*ratio) via the shared sine poly:
                # cos(pi*y) = sin(2*pi*(0.25 - y/2))
                gk = _sin_v(_fold(jnp.float32(0.25)
                                  - jnp.float32(0.5 * k) * ratio))
                alpha = (damping[sl] * ratio
                         * jnp.log(jnp.maximum(gk, jnp.float32(1e-30))))
                pk = p * jnp.int32(k) + phi
                term = ((us[k - 1] / denom) * jnp.exp(nrel * alpha)
                        * _sin_v(_phase_v(pk)))
                w = w + jnp.where(actives[k - 1], term, jnp.float32(0.0))
        else:
            raise ValueError(f"bad wave id {wid} in pallas layout")

        # ADSR (same piecewise form as models.voicebank._adsr)
        sr = jnp.float32(samplerate)
        tt = (nf - start[sl].astype(jnp.float32)) / sr
        a = jnp.maximum(attack[sl], 0.0)
        d = jnp.maximum(decay[sl], 0.0)
        r = jnp.maximum(release[sl], 0.0)
        slv = sustain_level[sl]
        gatef = gate[sl].astype(jnp.float32) / sr
        s = jnp.maximum(gatef - a - d, 0.0)
        t2 = a + d
        t3 = t2 + s
        t4 = t3 + r
        eps = jnp.float32(1e-30)
        g = jnp.where(tt < a, tt / jnp.maximum(a, eps),
            jnp.where(tt < t2, one + (slv - one) * (tt - a) / jnp.maximum(d, eps),
            jnp.where(tt < t3, slv,
            jnp.where(tt < t4, slv * (t4 - tt) / jnp.maximum(r, eps),
                      jnp.float32(0.0)))))
        g = jnp.maximum(jnp.where(tt < 0, jnp.float32(0.0), g), jnp.float32(0.0))

        sig = (bias[sl] + amp[sl] * w) * g            # [g, T]
        lg = jnp.minimum(one, one - wavep[sl])        # wavep carries pan (f32)
        rg = jnp.minimum(one, one + wavep[sl])
        acc_l = acc_l + jnp.sum(sig * lg, axis=0, keepdims=True)
        acc_r = acc_r + jnp.sum(sig * rg, axis=0, keepdims=True)

    out_ref[0:1, :] = acc_l
    out_ref[1:2, :] = acc_r


def _col_i32(x) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.int32).reshape(-1, 1)


def _col_f32(x) -> jax.Array:
    return x.astype(jnp.float32).reshape(-1, 1)


@functools.partial(jax.jit, static_argnames=("nframes", "samplerate",
                                             "layout", "tile", "use_glide"))
def render_stereo_pallas(vp: VoiceParams, n0: jax.Array, *, nframes: int,
                         samplerate: int, layout: BankLayout,
                         tile: int = 8192,
                         use_glide: bool = False) -> jax.Array:
    """Render [nframes, 2] f32 starting at absolute frame n0 (one kernel)."""
    padded = -(-nframes // tile) * tile
    ntiles = padded // tile
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    args = [
        _col_f32(vp.pan),               # 'wavep' slot carries pan
        _col_i32(vp.base_inc), _col_i32(vp.phase0),
        _col_f32(vp.amp), _col_f32(vp.bias),
        _col_i32(vp.start), _col_i32(vp.gate),
        _col_f32(vp.attack), _col_f32(vp.decay),
        _col_f32(vp.sustain_level), _col_f32(vp.release),
        _col_i32(vp.fm_inc), _col_i32(vp.fm_phase0),
        _col_f32(vp.fm_depth), _col_f32(vp.fm_r), _col_f32(vp.fm_c0),
        _col_f32(vp.pulse_width), _col_i32(vp.seed),
        _col_i32(vp.noise_hold),
        vp.harm_amps.astype(jnp.float32),
        _col_f32(vp.damping),
        _col_i32(vp.glide_inc0), _col_i32(vp.glide_d),
        _col_i32(vp.glide_frames),
    ]
    kernel = functools.partial(_kernel, tile=tile, samplerate=samplerate,
                               layout=layout, use_glide=use_glide)
    out = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem() for _ in args],
        out_specs=pl.BlockSpec((2, tile), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, padded), jnp.float32),
        interpret=jax.default_backend() == "cpu",   # CI runs on CPU
    )(jnp.asarray(n0, jnp.int32).reshape(1), *args)
    stereo = out.T

    # hybrid side-path (round 3, closes the wavetable SKIP): table-lookup
    # groups evaluate as normal XLA inside the SAME jitted program (the
    # gather lowers fine outside Mosaic) and add onto the kernel's mix —
    # still one device program, identical _one_wave formulas
    wt_groups = [g for g in layout.groups if g[0] == 11]
    if wt_groups:
        from ..models.voicebank import render_block, _slice_params
        n0_i = jnp.asarray(n0, jnp.int32)

        def wt_tile(_, i):
            acc = jnp.zeros((tile, 2), jnp.float32)
            for (wid, has_fm, gs, gc) in wt_groups:
                sub = _slice_params(vp, gs, gc)
                sub_layout = BankLayout(((wid, has_fm, 0, gc),), gc,
                                        layout.num_harmonics)
                acc = acc + render_block(sub, n0_i + i * tile, tile,
                                         samplerate, layout.num_harmonics,
                                         layout=sub_layout,
                                         use_glide=use_glide)
            return 0, acc

        _, wt = jax.lax.scan(wt_tile, 0, jnp.arange(ntiles, dtype=jnp.int32))
        stereo = stereo + wt.reshape(-1, 2)
    return stereo[:nframes]
