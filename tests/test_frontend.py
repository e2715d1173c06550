"""Feature-frontend parity tests.

The oracle below is an independent numpy transcription of the *algorithm*
Kaldi documents (framing/window/preemph/FFT/mel — the steps spelled out in
/root/reference/kaldi.py:42-185,363-526), written naively step-by-step.  The
production code computes the same thing as fused matmuls; agreement to f32
tolerance validates the folding.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pkr_tpu.frontend import (
    FbankConfig,
    MfccConfig,
    VadConfig,
    FrontendConfig,
    fbank,
    mfcc,
    num_frames,
    mel_banks,
    energy_vad,
    sliding_cmvn,
    select_voiced,
    wav_to_train_feats,
)
from pkr_tpu.frontend.features import _dct_matrix, _lifter_coeffs, _window_function


# ---------------------------------------------------------------- oracle


def oracle_frames(wav, cfg):
    n = len(wav)
    win, shift = cfg.window_size, cfg.window_shift
    if cfg.snip_edges:
        m = max(0, 1 + (n - win) // shift)
        return np.stack([wav[i * shift:i * shift + win] for i in range(m)])
    m = (n + shift // 2) // shift
    pad = win // 2 - shift // 2
    padded = np.concatenate([wav[:pad][::-1], wav, wav[::-1]])
    return np.stack([padded[i * shift:i * shift + win] for i in range(m)])


def oracle_fbank(wav, cfg):
    """Literal Kaldi algorithm, float64 numpy, dither=0."""
    frames = oracle_frames(wav, cfg).astype(np.float64)
    eps = float(np.finfo(np.float32).eps)
    if cfg.remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)
    log_e = np.log(np.maximum((frames ** 2).sum(axis=1), eps))
    if cfg.preemphasis != 0.0:
        shifted = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - cfg.preemphasis * shifted
    frames = frames * _window_function(cfg)
    padded = np.zeros((frames.shape[0], cfg.padded_window_size))
    padded[:, : cfg.window_size] = frames
    spec = np.fft.rfft(padded, axis=1)
    power = np.abs(spec) ** 2
    mel = power @ mel_banks(cfg).astype(np.float64).T
    out = np.log(np.maximum(mel, eps))
    if cfg.use_energy:
        out = np.concatenate([log_e[:, None], out], axis=1)
    return out


def make_wav(n=16000 * 2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    sig = (3000 * np.sin(2 * np.pi * 220 * t)
           + 1500 * np.sin(2 * np.pi * 1200 * t + 0.7)
           + 300 * rng.standard_normal(n))
    return sig.astype(np.float32)


CFG = FbankConfig(dither=0.0)


# ----------------------------------------------------------------- tests


def test_num_frames_snip_edges_false():
    # (n + shift//2) // shift  (kaldi.py:68)
    assert num_frames(32000, CFG) == (32000 + 80) // 160 == 200
    assert num_frames(31999, CFG) == (31999 + 80) // 160
    assert num_frames(400, CFG) == 3


def test_fbank_matches_oracle():
    wav = make_wav()
    ref = oracle_fbank(wav, CFG)
    got, mask = fbank(jnp.asarray(wav), jnp.asarray(len(wav)), CFG)
    got = np.asarray(got[0])[: ref.shape[0]]
    assert bool(np.all(np.asarray(mask[0])[: ref.shape[0]]))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_fbank_odd_length_and_short():
    for n in (16000 + 37, 400, 1000):
        wav = make_wav(n, seed=n)
        ref = oracle_fbank(wav, CFG)
        got, mask = fbank(jnp.asarray(wav), jnp.asarray(n), CFG)
        m = int(np.asarray(mask[0]).sum())
        assert m == ref.shape[0]
        np.testing.assert_allclose(np.asarray(got[0])[:m], ref, rtol=2e-4, atol=2e-4)


def test_fbank_padded_batch_matches_unpadded():
    """An utterance processed inside a longer padded buffer must produce
    identical valid frames — the static-shape contract."""
    n1, n2 = 12000, 16000
    w1, w2 = make_wav(n1, 1), make_wav(n2, 2)
    batch = np.zeros((2, n2), np.float32)
    batch[0, :n1] = w1
    batch[1] = w2
    feats, mask = fbank(jnp.asarray(batch), jnp.asarray([n1, n2]), CFG)
    solo, _ = fbank(jnp.asarray(w1), jnp.asarray(n1), CFG)
    m1 = int(np.asarray(mask[0]).sum())
    assert m1 == num_frames(n1, CFG)
    np.testing.assert_allclose(np.asarray(feats[0])[:m1], np.asarray(solo[0])[:m1],
                               rtol=1e-5, atol=1e-5)
    ref = oracle_fbank(w1, CFG)
    np.testing.assert_allclose(np.asarray(feats[0])[:m1], ref, rtol=2e-4, atol=2e-4)


def test_fbank_use_energy():
    cfg = FbankConfig(dither=0.0, use_energy=True)
    wav = make_wav(8000)
    ref = oracle_fbank(wav, cfg)
    got, _ = fbank(jnp.asarray(wav), jnp.asarray(len(wav)), cfg)
    assert got.shape[-1] == 41
    np.testing.assert_allclose(np.asarray(got[0])[: ref.shape[0]], ref, rtol=2e-4, atol=2e-4)


def test_dither_statistics():
    cfg = FbankConfig(dither=1.0)
    wav = np.zeros(8000, np.float32)  # silence: output driven purely by dither
    got, _ = fbank(jnp.asarray(wav), jnp.asarray(len(wav)), cfg, rng=jax.random.key(0))
    g = np.asarray(got[0])
    assert np.isfinite(g).all()
    # dithered silence ≈ log mel energies of unit-variance noise: small values,
    # but far above log(eps) ≈ -16
    assert g.mean() > 0.0 and g.mean() < 8.0
    got2, _ = fbank(jnp.asarray(wav), jnp.asarray(len(wav)), cfg, rng=jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(got2[0]), g)  # deterministic per key


def test_mel_banks_shape_and_partition():
    banks = mel_banks(CFG)
    assert banks.shape == (40, 257)
    assert banks[:, -1].sum() == 0.0  # Nyquist column zero (kaldi.py:508)
    # interior fft bins within [low, high] are covered (sum of triangles > 0)
    freqs = np.arange(257) * 16000.0 / 512
    inside = (freqs > 150) & (freqs < 7400)
    assert (banks.sum(axis=0)[inside] > 0).all()


def test_mel_banks_vtln():
    warped = mel_banks(FbankConfig(vtln_warp=1.1))
    base = mel_banks(CFG)
    assert warped.shape == base.shape
    assert np.abs(warped - base).max() > 0.01
    # warp factor >1 compresses the spectrum: centers move down in frequency
    assert np.argmax(warped[20]) <= np.argmax(base[20])


def test_mfcc_matches_oracle():
    cfg = MfccConfig(dither=0.0)
    wav = make_wav(16000)
    base = oracle_fbank(wav, FbankConfig(dither=0.0))
    dct = _dct_matrix(cfg.num_ceps, cfg.num_mel_bins).astype(np.float64)
    ref = base @ dct * _lifter_coeffs(cfg.num_ceps, cfg.cepstral_lifter)
    # C0 := raw log energy (use_energy=True, kaldi.py:617-637)
    frames = oracle_frames(wav, cfg).astype(np.float64)
    frames = frames - frames.mean(axis=1, keepdims=True)
    ref[:, 0] = np.log(np.maximum((frames ** 2).sum(axis=1), np.finfo(np.float32).eps))
    got, mask = mfcc(jnp.asarray(wav), jnp.asarray(len(wav)), cfg)
    m = int(np.asarray(mask[0]).sum())
    # 2e-3 tolerance: the recipe's unusual 40-ceps/22-lifter config multiplies
    # high-order cepstra by up to 9.5x, amplifying f32-vs-f64 DCT rounding;
    # C0 (the VAD's input, the only consumer) is checked exactly below
    np.testing.assert_allclose(np.asarray(got[0])[:m], ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got[0])[:m, 0], ref[:, 0], rtol=1e-5, atol=1e-5)


def test_energy_vad_matches_bruteforce():
    rng = np.random.default_rng(7)
    T = 97
    loge = rng.uniform(0, 20, size=T).astype(np.float32)
    cfg = VadConfig()
    thresh = cfg.energy_threshold + cfg.energy_mean_scale * loge.mean()
    ref = np.zeros(T, np.float32)
    for t in range(T):
        lo, hi = max(0, t - 2), min(T, t + 3)
        num = (loge[lo:hi] > thresh).sum()
        ref[t] = 1.0 if num >= (hi - lo) * cfg.proportion_threshold else 0.0
    got = energy_vad(jnp.asarray(loge), jnp.ones(T, bool), cfg)
    np.testing.assert_array_equal(np.asarray(got[0]), ref)
    # padded version identical on the valid prefix
    pad = np.zeros(128, np.float32)
    pad[:T] = loge
    got2 = energy_vad(jnp.asarray(pad), jnp.arange(128) < T, cfg)
    np.testing.assert_array_equal(np.asarray(got2[0])[:T], ref)
    assert np.asarray(got2[0])[T:].sum() == 0


def test_sliding_cmvn_matches_bruteforce():
    rng = np.random.default_rng(8)
    T, F, W = 417, 5, 300
    x = rng.standard_normal((T, F)).astype(np.float32)

    def brute(x, W):
        T = len(x)
        out = np.zeros_like(x)
        for t in range(T):
            start = t - W // 2
            end = start + W
            if start < 0:
                end -= start
                start = 0
            if end > T:
                start -= end - T
                end = T
                start = max(start, 0)
            out[t] = x[t] - x[start:end].mean(axis=0)
        return out

    ref = brute(x, W)
    got = sliding_cmvn(jnp.asarray(x), jnp.ones(T, bool), W)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=1e-4, atol=1e-4)
    # short utterance (< window): global mean subtraction
    ref2 = brute(x[:100], W)
    pad = np.zeros((T, F), np.float32)
    pad[:100] = x[:100]
    got2 = sliding_cmvn(jnp.asarray(pad), jnp.arange(T) < 100, W)
    np.testing.assert_allclose(np.asarray(got2[0])[:100], ref2, rtol=1e-4, atol=1e-4)
    assert np.abs(np.asarray(got2[0])[100:]).sum() == 0


def test_sliding_cmvn_noncenter_matches_kaldi_bruteforce():
    """center=False: Kaldi's causal window is [t-W, t+1) (W+1 frames in
    steady state) with min-window=100 look-ahead at the start (a literal
    transcription of SlidingWindowCmnInternal's placement)."""
    rng = np.random.default_rng(9)
    T, F, W, MINW = 520, 5, 300, 100
    x = rng.standard_normal((T, F)).astype(np.float32)

    def brute(x):
        T = len(x)
        out = np.zeros_like(x)
        for t in range(T):
            start = max(0, t - W)
            end = min(T, max(t + 1, min(MINW, T)))
            out[t] = x[t] - x[start:end].mean(axis=0)
        return out

    got = sliding_cmvn(jnp.asarray(x), jnp.ones(T, bool), W, center=False)
    np.testing.assert_allclose(np.asarray(got[0]), brute(x),
                               rtol=1e-4, atol=1e-4)
    # steady-state window really is W+1 frames
    t = 400
    manual = x[t] - x[t - W:t + 1].mean(axis=0)
    np.testing.assert_allclose(np.asarray(got[0])[t], manual,
                               rtol=1e-4, atol=1e-4)
    # frame 0 is NOT zero (it sees min_window frames, not just itself)
    assert np.abs(np.asarray(got[0])[0]).sum() > 1e-3


def test_sliding_cmvn_noncenter_window_below_min_window():
    """cmn_window < min_window: Kaldi extends to min_window ONLY while the
    causal start is clamped (t < window) — the right-shift leaves
    window_end = window+1, clamped to min(window+1, min_window); mid-stream
    frames t in [window, min_window) keep the plain [t-W, t+1) window
    (round-2 advisor finding)."""
    rng = np.random.default_rng(11)
    T, F, W, MINW = 260, 4, 50, 100
    x = rng.standard_normal((T, F)).astype(np.float32)

    def brute(x):
        out = np.zeros_like(x)
        for t in range(T):
            start, end = t - W, t + 1
            if start < 0:  # shift right; non-center then clamps the end
                end, start = end - start, 0
                end = max(t + 1, min(end, MINW))
            end = min(end, T)
            out[t] = x[t] - x[start:end].mean(axis=0)
        return out

    got = sliding_cmvn(jnp.asarray(x), jnp.ones(T, bool), W, center=False)
    np.testing.assert_allclose(np.asarray(got[0]), brute(x),
                               rtol=1e-4, atol=1e-4)
    # the frame just past the clamp regime uses W+1 frames, NOT min_window
    t = W + 5
    manual = x[t] - x[t - W:t + 1].mean(axis=0)
    np.testing.assert_allclose(np.asarray(got[0])[t], manual,
                               rtol=1e-4, atol=1e-4)


def test_frame_signal_negative_pad_trims_front():
    """frame_shift > frame_length (pad < 0): the reference trims the front
    of the waveform (kaldi.py:74-77), it does not mirror."""
    from pkr_tpu.frontend.features import frame_signal

    cfg = FbankConfig(frame_length_ms=25.0, frame_shift_ms=30.0)
    assert cfg.window_size // 2 - cfg.window_shift // 2 < 0
    rng = np.random.default_rng(10)
    n = 16000
    wav = rng.standard_normal(n).astype(np.float32)
    frames, mask = frame_signal(jnp.asarray(wav), jnp.asarray(n), cfg)
    pad = cfg.window_size // 2 - cfg.window_shift // 2
    shift, win = cfg.window_shift, cfg.window_size
    nf = int(mask.sum())
    assert nf > 2
    trimmed = wav[-pad:]
    for t in range(nf - 1):  # last frame reads the end mirror; skip it
        ref = trimmed[t * shift:t * shift + win]
        if len(ref) < win:
            break
        np.testing.assert_array_equal(np.asarray(frames)[t], ref)


def test_select_voiced_compacts():
    T, F = 10, 3
    feats = np.arange(T * F, dtype=np.float32).reshape(1, T, F)
    voiced = np.array([[1, 0, 1, 1, 0, 0, 1, 0, 0, 0]], np.float32)
    mask = np.ones((1, T), bool)
    out, new_mask = select_voiced(jnp.asarray(feats), jnp.asarray(voiced), jnp.asarray(mask))
    assert int(np.asarray(new_mask).sum()) == 4
    np.testing.assert_array_equal(np.asarray(out[0])[:4], feats[0][[0, 2, 3, 6]])
    assert np.abs(np.asarray(out[0])[4:]).sum() == 0


def test_full_pipeline_runs_and_masks():
    wav = np.stack([make_wav(20000, 1), np.zeros(20000, np.float32)])
    wav[1, :8000] = make_wav(8000, 2)
    feats, mask, vad = wav_to_train_feats(
        jnp.asarray(wav), jnp.asarray([20000, 8000]), rng=jax.random.key(0))
    feats, mask, vad = map(np.asarray, (feats, mask, vad))
    assert feats.shape[0] == 2 and feats.shape[2] == 40
    # voiced count = surviving frames
    assert mask[0].sum() == vad[0].sum()
    assert mask[1].sum() == vad[1].sum()
    assert mask[1].sum() <= num_frames(8000, CFG)
    # sine+noise content is mostly voiced under the energy VAD
    assert vad[0].sum() > 0.5 * num_frames(20000, CFG)
    # padded region contributes nothing
    assert np.abs(feats[1][~mask[1]]).sum() == 0


@pytest.mark.parametrize("window", ["hanning", "hamming", "rectangular", "blackman"])
def test_fbank_window_types_match_oracle(window):
    cfg = FbankConfig(dither=0.0, window_type=window)
    wav = make_wav(8000, seed=42)
    ref = oracle_fbank(wav, cfg)
    got, mask = fbank(jnp.asarray(wav), jnp.asarray(len(wav)), cfg)
    m = int(np.asarray(mask[0]).sum())
    np.testing.assert_allclose(np.asarray(got[0])[:m], ref, rtol=3e-4, atol=3e-4)


def test_fbank_nyquist_and_magnitude_variants():
    # high_freq=0 → Nyquist (kaldi.py:377-378); use_power=False → magnitude
    for cfg in (FbankConfig(dither=0.0, high_freq=0.0),
                FbankConfig(dither=0.0, use_power=False),
                FbankConfig(dither=0.0, use_log_fbank=False),
                FbankConfig(dither=0.0, snip_edges=True)):
        wav = make_wav(8000, seed=7)
        ref = oracle_fbank_variant(wav, cfg)
        got, mask = fbank(jnp.asarray(wav), jnp.asarray(len(wav)), cfg)
        m = int(np.asarray(mask[0]).sum())
        assert m == ref.shape[0], (cfg, m, ref.shape)
        np.testing.assert_allclose(np.asarray(got[0])[:m], ref, rtol=3e-4,
                                   atol=3e-4, err_msg=str(cfg))


def oracle_fbank_variant(wav, cfg):
    """oracle_fbank generalized to use_power/use_log_fbank variants."""
    frames = oracle_frames(wav, cfg).astype(np.float64)
    eps = float(np.finfo(np.float32).eps)
    if cfg.remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if cfg.preemphasis != 0.0:
        shifted = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - cfg.preemphasis * shifted
    frames = frames * _window_function(cfg)
    padded = np.zeros((frames.shape[0], cfg.padded_window_size))
    padded[:, : cfg.window_size] = frames
    power = np.abs(np.fft.rfft(padded, axis=1)) ** 2
    if not cfg.use_power:
        power = np.sqrt(power)
    mel = power @ mel_banks(cfg).astype(np.float64).T
    if cfg.use_log_fbank:
        mel = np.log(np.maximum(mel, eps))
    return mel
