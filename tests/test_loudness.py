"""BS.1770-4 loudness (LUFS) and true peak (dBTP): coefficient
conformance (product copy == oracle copy == the published 48 kHz ITU
tables), EBU-3341-style first-principles anchors, device vs f64-oracle
differentials, gating behavior, and the normalize_lufs workflow.
"""

import math

import numpy as np
import pytest

import goldref.sample as gs
import goldref.spec as goldspec
from synthesizer_tpu.ops import coeffs as C
from synthesizer_tpu.ops import loudness as dl
from synthesizer_tpu.sample import Sample

SR = 48000


def sine(freq, dbfs, seconds, sr=SR, nch=2, phase=0.0):
    t = np.arange(int(seconds * sr))
    a = (10 ** (dbfs / 20) * 32767.0
         * np.sin(2 * np.pi * freq / sr * t + phase))
    a16 = np.rint(a).astype(np.int16)
    return np.repeat(a16[:, None], nch, 1)


def pair(frames, sr=SR):
    gold = gs.Sample(frames.copy(), sr, 2, frames.shape[1])
    dev = Sample.from_raw_frames(frames.tobytes(), 2, sr,
                                 frames.shape[1])
    return gold, dev


# ---------------------------------------------------------------------------
# Coefficient conformance + published-table anchors
# ---------------------------------------------------------------------------

def test_kweight_coeffs_copies_match():
    for sr in (8000, 22050, 44100, 48000, 96000):
        assert C.kweight_coeffs(sr) == goldspec.kweight_coeffs(sr)


def test_kweight_48k_matches_itu_tables():
    """The re-derivation reproduces the BS.1770-4 published 48 kHz
    coefficients (both stages)."""
    s1, s2 = C.kweight_coeffs(48000)
    pub1 = (1.53512485958697, -2.69169618940638, 1.19839281085285,
            -1.69065929318241, 0.73248077421585)
    pub2 = (1.0, -2.0, 1.0, -1.99004745483398, 0.99007225036621)
    assert max(abs(a - b) for a, b in zip(s1, pub1)) < 1e-12
    assert max(abs(a - b) for a, b in zip(s2, pub2)) < 1e-12


def test_true_peak_filter_copies_match():
    np.testing.assert_array_equal(C.true_peak_filter(),
                                  goldspec.true_peak_filter())


def test_true_peak_filter_legs_unit_dc():
    h = C.true_peak_filter()
    for p in range(4):
        assert abs(h[p::4].sum() - 1.0) < 1e-12


# ---------------------------------------------------------------------------
# First-principles anchors (EBU tech 3341 cases, scaled to CI lengths)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dbfs", [-23.0, -33.0])
def test_stereo_997_sine_reads_its_dbfs(dbfs):
    """EBU 3341 cases 1-2: a stereo 997 Hz sine at X dBFS measures
    X LUFS (the -0.691 offset cancels the K-filter's gain at 997 Hz)."""
    gold, dev = pair(sine(997.0, dbfs, 2.0))
    assert abs(gold.loudness_lufs() - dbfs) < 0.1
    assert abs(dev.loudness_lufs() - dbfs) < 0.1


def test_relative_gate_ignores_quiet_tail():
    """Loud 997 Hz programme followed by a -30 LU quieter stretch: the
    relative gate drops the quiet blocks, so the integrated value stays
    at the loud level (within the block-boundary smear)."""
    loud = sine(997.0, -23.0, 3.0)
    quiet = sine(997.0, -53.0, 2.0)
    gold, dev = pair(np.concatenate([loud, quiet]))
    # the 3 blocks straddling the loud->quiet edge smear a few tenths
    assert abs(gold.loudness_lufs() + 23.0) < 0.4
    assert abs(dev.loudness_lufs() + 23.0) < 0.4


def test_absolute_gate_and_short_signals():
    _, dev = pair(sine(997.0, -85.0, 1.0))      # below the -70 gate
    assert dev.loudness_lufs() == float("-inf")
    _, dev = pair(sine(997.0, -23.0, 0.3))      # < one 400 ms block
    assert dev.loudness_lufs() == float("-inf")
    _, dev = pair(np.zeros((SR, 2), np.int16))
    assert dev.loudness_lufs() == float("-inf")
    assert dev.true_peak_dbtp() == float("-inf")


def test_true_peak_sees_intersample_peak():
    """fs/4 sine at phase pi/4: every sample sits at 1/sqrt(2) of the
    true amplitude, so the sampled peak under-reads by 3 dB while the
    4x-oversampled true peak recovers it (within the FIR's ripple)."""
    frames = sine(SR / 4.0, -6.0, 0.5, phase=np.pi / 4)
    gold, dev = pair(frames)
    sampled_db = 20 * np.log10(np.abs(frames).max() / 32767.0)
    assert sampled_db < -8.9                    # under-read, as expected
    assert abs(dev.true_peak_dbtp() + 6.0) < 0.15
    assert abs(gold.true_peak_dbtp() + 6.0) < 0.15


def test_true_peak_at_least_sampled_peak(rng):
    a = rng.integers(-28000, 28000, size=(9000, 2)).astype(np.int16)
    _, dev = pair(a)
    assert dev.true_peak_dbtp() >= 20 * np.log10(np.abs(a).max() / 32767.0)


# ---------------------------------------------------------------------------
# Device vs f64 oracle
# ---------------------------------------------------------------------------

def test_device_matches_oracle_on_programme(rng):
    """Music-ish programme (tones + noise bursts, quiet stretches for the
    gate to chew on): device f32 scan-based measurement within 0.01 LU /
    0.01 dB of the sequential f64 oracle."""
    n = 3 * SR
    t = np.arange(n) / SR
    sig = (0.3 * np.sin(2 * np.pi * 220 * t)
           + 0.15 * np.sin(2 * np.pi * 997 * t)
           + 0.05 * rng.standard_normal(n))
    env = np.ones(n)
    env[SR:2 * SR] = 0.02                       # a quiet middle second
    a16 = np.rint(np.clip(sig * env, -1, 1) * 20000).astype(np.int16)
    frames = np.stack([a16, np.roll(a16, 7)], axis=1)
    gold, dev = pair(frames)
    assert abs(dev.loudness_lufs() - gold.loudness_lufs()) < 0.01
    assert abs(dev.true_peak_dbtp() - gold.true_peak_dbtp()) < 0.01


def test_mono_weighting(rng):
    """A mono programme sums one channel (weight 1.0): duplicating it to
    stereo adds exactly +3.01 LU."""
    a = rng.integers(-20000, 20000, size=(2 * SR, 1)).astype(np.int16)
    _, mono = pair(a)
    _, stereo = pair(np.repeat(a, 2, 1))
    d = stereo.loudness_lufs() - mono.loudness_lufs()
    assert abs(d - 10 * np.log10(2.0)) < 0.02


# ---------------------------------------------------------------------------
# normalize_lufs workflow
# ---------------------------------------------------------------------------

def test_normalize_lufs_hits_target(rng):
    a = (rng.standard_normal((2 * SR, 2)) * 3000).astype(np.int16)
    _, dev = pair(a)
    dev.normalize_lufs(-18.0)
    assert abs(dev.loudness_lufs() + 18.0) < 0.1


def test_normalize_lufs_caps_at_true_peak():
    """A high-crest-factor signal (quiet bed + lone -6 dBFS click) asked
    up to a loud target stops at the true-peak ceiling instead: only
    ~5 dB of headroom exists, far short of the ~29 dB the target wants."""
    frames = sine(997.0, -30.0, 1.0)
    frames[SR // 2, :] = np.int16(0.5 * 32767)
    _, dev = pair(frames)
    before = dev.loudness_lufs()
    dev.normalize_lufs(-1.0, true_peak_db=-1.0)
    assert dev.true_peak_dbtp() <= -1.0 + 0.1
    after = dev.loudness_lufs()
    assert after < -20.0                        # did NOT reach the target
    assert after > before                       # but did gain what it could


def test_normalize_lufs_silence_unchanged():
    z = np.zeros((SR, 2), np.int16)
    _, dev = pair(z)
    out = dev.normalize_lufs(-14.0).get_frame_array()
    np.testing.assert_array_equal(out, z)


def test_normalize_stays_chainable(rng):
    a = (rng.standard_normal((SR, 2)) * 3000).astype(np.int16)
    _, dev = pair(a)
    out = dev.normalize_lufs(-20.0).amplify(0.5).get_frame_array()
    assert out.shape == (SR, 2)
    li = Sample.from_raw_frames(out.tobytes(), 2, SR, 2).loudness_lufs()
    assert abs(li + 26.0) < 0.15                # -20 then -6.02


# ---------------------------------------------------------------------------
# EBU R128 meter set: momentary / short-term / LRA
# ---------------------------------------------------------------------------

def test_stats_constant_tone():
    """A stationary tone: integrated == momentary == short-term (within
    block smear) and LRA ~ 0."""
    gold, dev = pair(sine(997.0, -23.0, 4.0))
    s = dev.loudness_stats()
    assert abs(s["integrated"] + 23.0) < 0.1
    assert abs(s["momentary_max"] + 23.0) < 0.1
    assert abs(s["short_term_max"] + 23.0) < 0.1
    assert s["lra"] < 0.2


def test_stats_two_level_lra():
    """EBU 3342-style two-level programme: 5 s at -33 then 5 s at -23
    spans an LRA of ~10 LU (p95 - p10 of the bimodal short-term
    distribution; edges smear a little)."""
    frames = np.concatenate([sine(997.0, -33.0, 5.0),
                             sine(997.0, -23.0, 5.0)])
    gold, dev = pair(frames)
    s = dev.loudness_stats()
    g = gold.loudness_stats()
    assert abs(s["lra"] - 10.0) < 1.5, s
    for k in ("integrated", "lra", "momentary_max", "short_term_max"):
        assert abs(s[k] - g[k]) < 0.02, (k, s[k], g[k])


def test_stats_burst_raises_momentary_over_short_term():
    """A lone 30 ms burst lifts the 400 ms momentary meter far above the
    3 s short-term one (the transient dilutes 7.5x more in the longer
    window — the classic reason the momentary meter exists)."""
    frames = sine(997.0, -30.0, 4.0)
    frames[2 * SR:2 * SR + 1440, :] = np.int16(0.9 * 32767)
    _, dev = pair(frames)
    s = dev.loudness_stats()
    assert s["momentary_max"] > s["short_term_max"] + 3.0, s


def test_stats_short_programme_edges():
    _, dev = pair(sine(997.0, -23.0, 1.0))      # >= 400 ms, < 3 s
    s = dev.loudness_stats()
    assert math.isfinite(s["momentary_max"])
    assert s["short_term_max"] == float("-inf")
    assert s["lra"] == 0.0
    _, dev = pair(np.zeros((SR // 5, 2), np.int16))
    s = dev.loudness_stats()
    assert s["momentary_max"] == float("-inf")
    assert s["integrated"] == float("-inf")


# ---------------------------------------------------------------------------
# Live meter: StreamingLoudness (chunk-fed twin of loudness_stats) and the
# LevelMeter(loudness=True) integration
# ---------------------------------------------------------------------------

def programme(seconds=5.0):
    rng = np.random.default_rng(0x10FD)
    frames = np.concatenate([sine(997.0, -33.0, seconds / 2),
                             sine(440.0, -23.0, seconds / 2)])
    frames += rng.integers(-400, 400, size=frames.shape).astype(np.int16)
    return frames


@pytest.mark.parametrize("chunk", [1470, 4800, 37])
def test_live_meter_matches_whole_signal(chunk):
    import jax.numpy as jnp
    frames = programme()
    _, dev = pair(frames)
    whole = dev.loudness_stats()
    sl = dl.StreamingLoudness(SR, 2)
    for i in range(0, len(frames), chunk):
        sl.update(jnp.asarray(frames[i:i + chunk]))
    live = sl.stats()
    for k in ("integrated", "lra", "momentary_max", "short_term_max"):
        assert abs(live[k] - whole[k]) < 0.02, (k, live[k], whole[k])


def test_live_meter_host_path_matches_device_path():
    import jax.numpy as jnp
    frames = programme(4.0)
    a = dl.StreamingLoudness(SR, 2)
    b = dl.StreamingLoudness(SR, 2)
    traces_a, traces_b = [], []
    for i in range(0, len(frames), 2400):
        traces_a.append(a.update(jnp.asarray(frames[i:i + 2400])))
        traces_b.append(b.update_host(frames[i:i + 2400]))
    for (ma, sa), (mb, sb) in zip(traces_a, traces_b):
        if math.isfinite(ma) or math.isfinite(mb):
            assert abs(ma - mb) < 0.02, (ma, mb)
        if math.isfinite(sa) or math.isfinite(sb):
            assert abs(sa - sb) < 0.02, (sa, sb)
    sta, stb = a.stats(), b.stats()
    for k in ("integrated", "lra", "momentary_max", "short_term_max"):
        assert abs(sta[k] - stb[k]) < 0.02, (k, sta[k], stb[k])


def test_live_meter_momentary_tracks_level_change():
    """-33 dBFS then -23 dBFS: the momentary readout follows within its
    400 ms window; maxima reflect the loud half; the EBU anchor value
    holds live (a -23 dBFS 997 Hz sine reads -23 LUFS momentary)."""
    frames = np.concatenate([sine(997.0, -33.0, 2.0),
                             sine(997.0, -23.0, 2.0)])
    sl = dl.StreamingLoudness(SR, 2)
    mid = late = None
    hop = SR // 10
    for i in range(0, len(frames), hop):
        m, _ = sl.update_host(frames[i:i + hop])
        if i == len(frames) // 2 - hop:
            mid = m
        late = m
    assert mid is not None and abs(mid + 33.0) < 0.2, mid
    assert abs(late + 23.0) < 0.2, late
    assert abs(sl.momentary_max + 23.0) < 0.2, sl.momentary_max


def test_live_meter_chunk_boundaries_vs_hop_grid():
    """Chunks that never align with the 100 ms hop grid (prime sizes)
    still land every hop energy on the same absolute grid as the
    whole-signal meter."""
    frames = programme(2.0)
    sl = dl.StreamingLoudness(SR, 2)
    for i in range(0, len(frames), 997):
        sl.update_host(frames[i:i + 997])
    hs_live = np.asarray(sl._hops)
    hs_whole = dl.kweighted_hop_sums(
        Sample.from_raw_frames(frames.tobytes(), 2, SR, 2).jax_frames, SR)
    assert hs_live.shape == hs_whole.shape
    rel = (np.abs(hs_live - hs_whole)
           / np.maximum(np.abs(hs_whole), 1e-12)).max()
    # f64 host pipeline vs f32 device hop sums: ~1e-3 relative is the
    # precision gap; a grid MISALIGNMENT would be order-1 relative
    assert rel < 5e-3, rel


def test_levelmeter_loudness_integration():
    from synthesizer_tpu.sample import LevelMeter
    frames = sine(997.0, -23.0, 1.0)
    lm = LevelMeter(loudness=True)
    # device path: feed as Sample chunks
    step = SR // 5
    for i in range(0, len(frames), step):
        lm.update(Sample.from_raw_frames(
            frames[i:i + step].tobytes(), 2, SR, 2))
    assert abs(lm.momentary_lufs + 23.0) < 0.2, lm.momentary_lufs
    # host path on a fresh meter (realtime mixer chunks)
    lm2 = LevelMeter(loudness=True)
    for i in range(0, len(frames), 1470):
        lm2.update_frames(frames[i:i + 1470], SR)
    assert abs(lm2.momentary_lufs + 23.0) < 0.2, lm2.momentary_lufs
    assert lm2.short_term_lufs == float("-inf")    # < 3 s heard
    lm2.reset()
    assert lm2.momentary_lufs == float("-inf")
    # plain meters never build the loudness machinery
    lm3 = LevelMeter()
    lm3.update_frames(frames[:1470], SR)
    assert lm3.loudness_meter is None
