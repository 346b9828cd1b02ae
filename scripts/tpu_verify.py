#!/usr/bin/env python3
"""On-hardware verification battery: proves the 1-LSB contract on the chip.

The CI suite runs on CPU (and Pallas in interpret mode); this script runs
the same differential checks against the REAL device — the checks that
caught the MXU bf16 bug.  Run standalone (pays the axon bootstrap) or pipe
through scripts/tpu_run.sh on the warm process.

Prints one PASS/FAIL line per check and exits nonzero on any failure.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

FAILURES = []


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
    if not ok:
        FAILURES.append(name)


def main() -> int:
    import jax
    import goldref.osc as go
    from synthesizer_tpu.models import graph as G
    from synthesizer_tpu.models import spec as S
    from synthesizer_tpu.models.voicebank import Voice, VoiceBank, pack_voices

    SR = 44100
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})")

    # 1. config-1 sine vs host oracle
    node = S.Osc("sine", 440.0, 0.9999)
    want = go.to_int_samples(go.render_oracle(node, 2 * SR, SR), 2)
    got = np.asarray(G.to_int_device(G.render_patch(node, 2 * SR, SR, 32768), 2))
    d = np.abs(got.astype(np.int64) - want.astype(np.int64)).max()
    check("sine_440_vs_oracle", d <= 1, f"max {d} LSB")

    # 2. FM + envelope patch vs host oracle
    patch = S.Envelope(S.Osc("sine", 880.0, 0.8,
                             fm_lfo=S.Osc("sine", 6.0, 0.02)),
                       0.02, 0.05, 1.0, 0.6, 0.2)
    want = go.to_int_samples(go.render_oracle(patch, SR, SR), 2)
    got = np.asarray(G.to_int_device(G.render_patch(patch, SR, SR, 16384), 2))
    d = np.abs(got.astype(np.int64) - want.astype(np.int64)).max()
    check("fm_envelope_vs_oracle", d <= 1, f"max {d} LSB")

    # 3. voice bank vs per-voice oracle (mixed waveforms, short + long gates)
    sys.path.insert(0, "/root/repo/tests")
    import test_voicebank as T
    rng = np.random.default_rng(123)
    voices = [T.rand_voice(rng) for _ in range(12)]
    n = 8192
    vp, layout = pack_voices(voices, SR, num_harmonics=4, sort_by_wave=True)
    bank = VoiceBank.for_voices(voices, SR, chunk_frames=1024, num_harmonics=4,
                                layout=layout, nvoices=layout.nvoices)
    got = np.asarray(bank.render_song(vp, n))
    want = np.zeros((n, 2), np.float32)
    for v in voices:
        want = want + T.oracle_voice(v, n)
    g16 = np.clip(np.rint(got * 32767), -32768, 32767)
    w16 = np.clip(np.rint(want * 32767), -32768, 32767)
    d = np.abs(g16 - w16)
    tol = 2 + len(voices) // 4
    check("voicebank_vs_oracle", (d > tol).mean() < 1e-4,
          f"max {d.max():.0f} LSB, frac>tol {(d > tol).mean():.1e}")

    # 4. XLA engine vs compiled Pallas kernel (this caught the bf16 MXU bug)
    p = np.asarray(bank.render_song(vp, n, engine="pallas"))
    dd = np.abs(got - p).max()
    check("xla_vs_pallas_engines", dd < 1e-4, f"max f32 diff {dd:.2e}")

    # 5. chunk invariance on the chip
    a = np.asarray(VoiceBank(0, SR, chunk_frames=512, num_harmonics=4,
                             ).render_song(pack_voices(voices, SR, num_harmonics=4), n))
    b = np.asarray(VoiceBank(0, SR, chunk_frames=4096, num_harmonics=4,
                             ).render_song(pack_voices(voices, SR, num_harmonics=4), n))
    check("chunk_invariance", np.array_equal(a, b))

    print(f"\n{'ALL PASS' if not FAILURES else f'FAILURES: {FAILURES}'}")
    return 1 if FAILURES else 0


if __name__ == "__main__":
    sys.exit(main())
