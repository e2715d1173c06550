"""Augmentation op tests: exact SNR, RIR alignment/power, speed perturb."""

import numpy as np
import jax.numpy as jnp
import pytest

from pkr_tpu.data.augment import (WavAugmenter, add_noise_snr, reverberate,
                                  speed_perturb)


def test_add_noise_exact_snr():
    rng = np.random.default_rng(0)
    n = 8000
    sig = (1000 * np.sin(2 * np.pi * 220 * np.arange(n) / 16000)).astype(np.float32)
    noise = rng.standard_normal(4000).astype(np.float32) * 50
    for snr in (15.0, 5.0, 0.0):
        out = np.asarray(add_noise_snr(
            jnp.asarray(sig), jnp.asarray(n), jnp.asarray(noise),
            jnp.asarray(4000), jnp.asarray(snr), jnp.asarray(123)))
        added = out - sig
        got_snr = 10 * np.log10((sig ** 2).sum() / (added ** 2).sum())
        assert abs(got_snr - snr) < 0.05, (snr, got_snr)


def test_add_noise_respects_length_mask():
    sig = np.zeros(100, np.float32)
    sig[:50] = 1.0
    noise = np.ones(30, np.float32)
    out = np.asarray(add_noise_snr(jnp.asarray(sig), jnp.asarray(50),
                                   jnp.asarray(noise), jnp.asarray(30),
                                   jnp.asarray(10.0), jnp.asarray(0)))
    assert np.abs(out[50:]).sum() == 0


def test_reverberate_identity_rir():
    """A unit impulse RIR (with leading zeros) must return the signal
    time-aligned and power-preserved."""
    rng = np.random.default_rng(1)
    sig = rng.standard_normal(2000).astype(np.float32) * 100
    rir = np.zeros(64, np.float32)
    rir[17] = 1.0  # delayed impulse → shift-output realigns
    out = np.asarray(reverberate(jnp.asarray(sig), jnp.asarray(2000),
                                 jnp.asarray(rir), jnp.asarray(64)))
    np.testing.assert_allclose(out, sig, rtol=1e-4, atol=1e-2)


def test_reverberate_power_normalized():
    rng = np.random.default_rng(2)
    sig = rng.standard_normal(4000).astype(np.float32) * 500
    rir = np.exp(-np.arange(256) / 40).astype(np.float32) * rng.standard_normal(256).astype(np.float32)
    rir[0] = 1.0
    out = np.asarray(reverberate(jnp.asarray(sig), jnp.asarray(4000),
                                 jnp.asarray(rir), jnp.asarray(256)))
    assert abs((out ** 2).sum() / (sig ** 2).sum() - 1.0) < 1e-3
    assert not np.allclose(out, sig)  # actually reverberated


def test_speed_perturb_lengths_and_pitch():
    n = 16000
    t = np.arange(n) / 16000
    sig = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    fast = speed_perturb(sig, 1.1)
    slow = speed_perturb(sig, 0.9)
    assert len(fast) == int(round(n / 1.1))
    assert len(slow) == int(round(n / 0.9))
    # zero crossings scale with speed factor (pitch shift)
    zc = lambda x: int(np.sum(np.abs(np.diff(np.sign(x))) > 1))
    assert abs(zc(fast) / (len(fast) / 16000) - 110 * 2) < 8  # 100 Hz → 110 Hz
    assert abs(zc(slow) / (len(slow) / 16000) - 90 * 2) < 8


def test_wav_augmenter_policy():
    rng = np.random.default_rng(3)
    wavs = rng.standard_normal((4, 3000)).astype(np.float32) * 100
    lengths = np.array([3000, 2500, 3000, 1000])
    noise = (rng.standard_normal((2, 1000)).astype(np.float32) * 50,
             np.array([1000, 800]))
    rirs = (np.concatenate([np.ones((1, 1), np.float32),
                            np.zeros((1, 63), np.float32)], axis=1),
            np.array([64]))
    aug = WavAugmenter(noise=noise, rirs=rirs, seed=0)
    out = aug(wavs.copy(), lengths)
    assert out.shape == wavs.shape
    assert np.isfinite(out).all()
    # padded tails stay silent for augmented rows
    assert np.abs(out[3, 1000:]).max() <= np.abs(wavs[3, 1000:]).max() + 1e-5
