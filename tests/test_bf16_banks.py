"""bfloat16 (re, im)-pair RIR partition-spectra banks: the throughput
option unblocked once the TPU tunnel accepted bf16 programs.

The bank stores packed partition spectra as [2, ..., B] bfloat16 — the
(re, im) pair on a LEADING axis (ops/partitioned.spectra_to_bf16_pair; a
trailing pair axis tile-pads 42.7x and OOMs) — instead of complex64,
halving the bytes of the
per-step HBM gather that dominates the env step. Arithmetic stays f32; the
only loss is bf16 rounding of the RIR spectrum, bounded here against the
f32 bank on the same world (reference convolution semantics:
soundspaces/simulator.py:608-647)."""

import jax.numpy as jnp
import numpy as np

from soundspaces_tpu.env import (
    AudioNavEnv,
    DeviceScene,
    EnvConfig,
    make_episode_bank,
)
from soundspaces_tpu.ops.partitioned import (
    bf16_pair_to_c64,
    spectra_to_bf16_pair,
)
from soundspaces_tpu.scene import make_synthetic_assets


def _worlds():
    assets = make_synthetic_assets(
        num_nodes_hint=40,
        sampling_rate=8000,
        rir_max_len=2000,
        image_size=32,
        num_sounds=2,
        max_secs=2,
        seed=3,
    )
    f32 = DeviceScene.from_assets(assets, precompute_rir_fft=True)
    bf16 = DeviceScene.from_assets(
        assets, precompute_rir_fft=True, rir_fft_dtype=jnp.bfloat16
    )
    episodes = make_episode_bank(assets, 32, seed=1, min_geodesic_hops=2)
    return assets, f32, bf16, episodes


def test_pair_roundtrip_is_bf16_rounding():
    rng = np.random.default_rng(0)
    spec = (rng.standard_normal((3, 5, 16)) + 1j * rng.standard_normal(
        (3, 5, 16)
    )).astype(np.complex64)
    pair = spectra_to_bf16_pair(jnp.asarray(spec))
    assert pair.dtype == jnp.bfloat16 and pair.shape == (2, 3, 5, 16)
    back = np.asarray(bf16_pair_to_c64(pair))
    assert back.shape == spec.shape
    # bf16 has an 8-bit mantissa: elementwise relative error < 2^-8
    np.testing.assert_allclose(back.real, spec.real, rtol=2**-8, atol=1e-6)
    np.testing.assert_allclose(back.imag, spec.imag, rtol=2**-8, atol=1e-6)


def test_bf16_bank_audio_close_to_f32_bank():
    _, scene_f32, scene_bf16, episodes = _worlds()
    n_envs = 8
    env32 = AudioNavEnv(
        EnvConfig(sensors=("audiogoal", "spectrogram")),
        scene_f32,
        episodes,
        n_envs,
    )
    env16 = AudioNavEnv(
        EnvConfig(sensors=("audiogoal", "spectrogram")),
        scene_bf16,
        episodes,
        n_envs,
    )
    import jax

    key = jax.random.PRNGKey(0)
    s32, o32 = env32.reset(key)
    s16, o16 = env16.reset(key)
    for t in range(3):
        a = jax.random.randint(jax.random.fold_in(key, t), (n_envs,), 0, 4)
        s32, o32, *_ = env32.step(s32, a)
        s16, o16, *_ = env16.step(s16, a)
    wav32 = np.asarray(o32["audiogoal"])
    wav16 = np.asarray(o16["audiogoal"])
    scale = np.abs(wav32).max()
    assert scale > 0
    # bounded bf16 rounding of the RIR spectrum only — not a different signal
    err = np.abs(wav16 - wav32).max() / scale
    assert err < 2e-2, err
    sp32 = np.asarray(o32["spectrogram"])
    sp16 = np.asarray(o16["spectrogram"])
    sperr = np.abs(sp16 - sp32).max() / max(np.abs(sp32).max(), 1e-6)
    assert sperr < 2e-2, sperr


def test_bf16_bank_continuous_crossfade_close_to_f32():
    """The continuous (SS2.0) fft-bank path with the bf16 pair bank stays
    within bf16 rounding of the f32 complex bank (crossfaded audio)."""
    import jax

    from soundspaces_tpu.env.continuous import (
        ContinuousAudioNavEnv,
        ContinuousConfig,
    )

    assets = make_synthetic_assets(
        num_nodes_hint=40, sampling_rate=4410, rir_max_len=1500, image_size=8,
        num_sounds=2, max_secs=2, seed=41,
    )
    cfg = ContinuousConfig(sensors=("audiogoal",), use_crossfade=True)
    episodes = make_episode_bank(assets, 32, seed=42, min_geodesic_hops=2)
    env32 = ContinuousAudioNavEnv(
        cfg, DeviceScene.from_assets(assets, precompute_rir_fft=True),
        episodes, num_envs=2,
    )
    env16 = ContinuousAudioNavEnv(
        cfg,
        DeviceScene.from_assets(
            assets, precompute_rir_fft=True, rir_fft_dtype=jnp.bfloat16
        ),
        episodes, num_envs=2,
    )
    s32, o32 = env32.reset(jax.random.PRNGKey(11))
    s16, o16 = env16.reset(jax.random.PRNGKey(11))
    for t in range(3):
        a = jnp.array([1, 2 if t % 2 else 1], jnp.int32)
        w32, w16 = np.asarray(o32["audiogoal"]), np.asarray(o16["audiogoal"])
        scale = max(np.abs(w32).max(), 1e-6)
        assert np.abs(w16 - w32).max() / scale < 2e-2
        s32, o32, *_ = env32.step(s32, a)
        s16, o16, *_ = env16.step(s16, a)


def test_bf16_bank_shards_on_node_axis():
    """shard_scene_banks places the bf16 pair bank's NODE axis (shifted by
    the leading (re, im) axis) on the mesh, same as the complex bank."""
    import jax
    from jax.sharding import Mesh

    from soundspaces_tpu.env.sharding import shard_scene_banks

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-virtual-device CPU mesh")
    assets = make_synthetic_assets(
        num_nodes_hint=80, sampling_rate=4000, rir_max_len=1500,
        image_size=8, num_sounds=2, max_secs=2, seed=5,
    )
    scene = DeviceScene.from_assets(
        assets, precompute_rir_fft=True, rir_fft_dtype=jnp.bfloat16
    )
    n = scene.points.shape[0]
    mesh = Mesh(np.array(jax.devices()[:8]), ("bank",))
    sharded = shard_scene_banks(mesh, scene, "bank")
    shard_shapes = [
        s.data.shape for s in sharded.rir_part_fft.addressable_shards
    ]
    # [2, 4, N/8, G, C, P, B] per device: node axis is index 2
    assert shard_shapes[0][0] == 2
    assert shard_shapes[0][2] == n // 8
