"""Voice-axis sharding over the 8-device CPU mesh + graft entry points."""

import numpy as np
import pytest

import jax

from synthesizer_tpu.models.voicebank import VoiceBank, pack_voices
from synthesizer_tpu.parallel.mesh import (render_song_sharded,
                                           shard_voice_params, voice_mesh)

import sys
sys.path.insert(0, "/root/repo")
import __graft_entry__ as graft  # noqa: E402

SR = 8000


def test_sharded_matches_single_device():
    voices = graft._demo_voices(64)
    vp = pack_voices(voices, SR, num_harmonics=4)
    total = 2048
    single = np.asarray(VoiceBank(64, SR, chunk_frames=512,
                                  num_harmonics=4).render_song(vp, total))
    mesh = voice_mesh(8)
    sharded = np.asarray(render_song_sharded(vp, total, SR, chunk_frames=512,
                                             num_harmonics=4, mesh=mesh))
    # identical voices, different f32 summation order across shards
    np.testing.assert_allclose(sharded, single, atol=2e-5)


def test_mesh_uses_requested_devices():
    mesh = voice_mesh(4)
    assert mesh.devices.size == 4


def test_indivisible_voice_count_raises():
    vp = pack_voices(graft._demo_voices(12), SR, pad_to=4)  # 12 voices
    with pytest.raises(ValueError):
        render_song_sharded(vp, 256, SR, chunk_frames=128,
                            mesh=voice_mesh(8))


def test_graft_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2048, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_dryrun_multichip():
    graft.dryrun_multichip(8)
