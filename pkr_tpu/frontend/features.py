"""Kaldi-compatible fbank/MFCC features as fused TPU matmuls.

Semantics match Kaldi's compute-fbank-feats / compute-mfcc-feats with the
recipe's configuration (conf/fbank.conf, conf/mfcc.conf: 16 kHz, 25 ms povey
window, 10 ms shift, snip-edges=false, 40 mel bins 20-7600 Hz; reference
behavioural spec: /root/reference/kaldi.py:42-185,363-526,550-650).

TPU-first design — this is NOT the Kaldi dataflow:

  Kaldi:  frame → dither → de-DC → preemph → window → zero-pad 512 → FFT
          → |.|² → mel → log              (scalar C++ loops / torch.rfft)

  Here:   the per-frame linear chain  diag(window) · Preemph · DeDC  is
          folded together with the real DFT basis into two constant
          (window_size × num_fft_bins) matrices, so the whole front-end is

              frames @ A_cos, frames @ A_sin        (two MXU matmuls)
              power = re² + im²                     (VPU)
              power @ melbank.T  → log              (third MXU matmul)

  No FFT, no zero-padding, no per-frame loops; everything batches over
  (B, T) frames and stays in f32 on the MXU (the GEMM-native NDFT idea —
  cf. MelT, arXiv:2606.01009 — taken further by folding the whole framing
  chain into the basis).  Framing itself is slice-based and realizes
  snip-edges=false mirror padding with per-utterance true lengths, so
  variable-length batches keep static shapes.

Dither uses jax.random.normal per element (a true Gaussian); Kaldi draws
from its own RNG so bit-level parity of dithered features is impossible by
construction — parity tests use dither=0, as does any Kaldi-vs-Kaldi rerun.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS_F32 = float(np.finfo(np.float32).eps)
MEL_HIGH_FACTOR = 1127.0


@dataclass(frozen=True)
class FbankConfig:
    sample_frequency: float = 16000.0
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    num_mel_bins: int = 40
    low_freq: float = 20.0
    high_freq: float = 7600.0  # conf/fbank.conf:4 (0.0 would mean Nyquist)
    dither: float = 1.0
    preemphasis: float = 0.97
    remove_dc_offset: bool = True
    window_type: str = "povey"
    raw_energy: bool = True
    energy_floor: float = 0.0
    snip_edges: bool = False  # conf/fbank.conf:6
    round_to_power_of_two: bool = True
    use_energy: bool = False
    use_log_fbank: bool = True
    use_power: bool = True
    vtln_low: float = 100.0
    vtln_high: float = -500.0
    vtln_warp: float = 1.0
    blackman_coeff: float = 0.42

    @property
    def window_size(self) -> int:
        return int(self.sample_frequency * self.frame_length_ms * 0.001)

    @property
    def window_shift(self) -> int:
        return int(self.sample_frequency * self.frame_shift_ms * 0.001)

    @property
    def padded_window_size(self) -> int:
        w = self.window_size
        if not self.round_to_power_of_two:
            return w
        return 1 << (w - 1).bit_length()

    @property
    def num_fft_bins(self) -> int:
        return self.padded_window_size // 2 + 1


@dataclass(frozen=True)
class MfccConfig(FbankConfig):
    num_ceps: int = 40  # conf/mfcc.conf:6
    cepstral_lifter: float = 22.0
    use_energy: bool = True  # Kaldi compute-mfcc-feats default; C0 = log energy


def num_frames(num_samples, cfg: FbankConfig):
    """Frame count; works on ints and traced arrays.
    snip_edges=false: (n + shift//2) // shift  (kaldi.py:68)."""
    shift, win = cfg.window_shift, cfg.window_size
    if cfg.snip_edges:
        return jnp.maximum(0, 1 + (num_samples - win) // shift) if not isinstance(
            num_samples, int) else max(0, 1 + (num_samples - win) // shift)
    return (num_samples + shift // 2) // shift


# ---------------------------------------------------------------------------
# constant matrices (host-side numpy, cached per config)
# ---------------------------------------------------------------------------


def _window_function(cfg: FbankConfig) -> np.ndarray:
    n = cfg.window_size
    a = 2 * math.pi / (n - 1)
    x = np.arange(n, dtype=np.float64)
    if cfg.window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a * x)
    elif cfg.window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * x)
    elif cfg.window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a * x)) ** 0.85
    elif cfg.window_type == "rectangular":
        w = np.ones(n)
    elif cfg.window_type == "blackman":
        w = (cfg.blackman_coeff - 0.5 * np.cos(a * x)
             + (0.5 - cfg.blackman_coeff) * np.cos(2 * a * x))
    else:
        raise ValueError(f"unknown window {cfg.window_type}")
    return w


def _mel_scale(freq):
    return MEL_HIGH_FACTOR * np.log1p(np.asarray(freq, np.float64) / 700.0)


def _inverse_mel_scale(mel):
    return 700.0 * (np.exp(np.asarray(mel, np.float64) / MEL_HIGH_FACTOR) - 1.0)


def _vtln_warp_freq(vtln_low: float, vtln_high: float, low: float, high: float,
                    warp: float, freq: np.ndarray) -> np.ndarray:
    """Kaldi's piecewise-linear VTLN warp (kaldi.py:276-342 semantics)."""
    l = vtln_low * max(1.0, warp)
    h = vtln_high * min(1.0, warp)
    scale = 1.0 / warp
    fl, fh = scale * l, scale * h
    scale_left = (fl - low) / (l - low)
    scale_right = (high - fh) / (high - h)
    res = np.where(freq >= h, high + scale_right * (freq - high), freq)
    res = np.where(freq < h, scale * freq, res)
    res = np.where(freq < l, low + scale_left * (freq - low), res)
    res = np.where((freq < low) | (freq > high), freq, res)
    return res


def mel_banks(cfg: FbankConfig) -> np.ndarray:
    """Triangular mel filterbank, shape (num_mel_bins, num_fft_bins).

    Matches Kaldi MelBanks: centers uniformly spaced on the mel scale between
    mel(low) and mel(high) with (num_bins+1) intervals; the Nyquist bin column
    is zero (kaldi.py:363-429,508)."""
    nfft = cfg.padded_window_size
    nyquist = 0.5 * cfg.sample_frequency
    high = cfg.high_freq if cfg.high_freq > 0 else cfg.high_freq + nyquist
    vtln_high = cfg.vtln_high if cfg.vtln_high >= 0 else cfg.vtln_high + nyquist
    mel_low, mel_high = _mel_scale(cfg.low_freq), _mel_scale(high)
    delta = (mel_high - mel_low) / (cfg.num_mel_bins + 1)

    b = np.arange(cfg.num_mel_bins, dtype=np.float64)[:, None]
    left, center, right = mel_low + b * delta, mel_low + (b + 1) * delta, mel_low + (b + 2) * delta
    if cfg.vtln_warp != 1.0:
        def warp(m):
            return _mel_scale(_vtln_warp_freq(cfg.vtln_low, vtln_high, cfg.low_freq,
                                              high, cfg.vtln_warp, _inverse_mel_scale(m)))
        left, center, right = warp(left), warp(center), warp(right)

    fft_bin_width = cfg.sample_frequency / nfft
    mel = _mel_scale(fft_bin_width * np.arange(nfft // 2, dtype=np.float64))[None, :]
    up = (mel - left) / (center - left)
    down = (right - mel) / (right - center)
    if cfg.vtln_warp != 1.0:
        bins = np.zeros_like(up)
        up_idx = (mel > left) & (mel <= center)
        down_idx = (mel > center) & (mel < right)
        bins[up_idx] = up[up_idx]
        bins[down_idx] = down[down_idx]
    else:
        bins = np.maximum(0.0, np.minimum(up, down))
    out = np.zeros((cfg.num_mel_bins, cfg.num_fft_bins), dtype=np.float32)
    out[:, : nfft // 2] = bins
    return out


@functools.lru_cache(maxsize=16)
def _frontend_matrices(cfg: FbankConfig) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(A_cos, A_sin, melbank): the fused per-frame linear chain.

    A = DFT_basis^T · diag(window) · Preemph · DeDC, shape (win, nfft_bins),
    so that for a raw (dithered) frame x:  re = x @ A_cos, im = x @ A_sin
    equals rfft(zero_pad(window * preemph(de_dc(x)))) exactly.
    """
    win = cfg.window_size
    nfft = cfg.padded_window_size
    nbins = cfg.num_fft_bins

    chain = np.eye(win, dtype=np.float64)
    if cfg.remove_dc_offset:
        chain = chain - np.full((win, win), 1.0 / win)
    if cfg.preemphasis != 0.0:
        pre = np.eye(win) - cfg.preemphasis * np.eye(win, k=-1)
        pre[0, 0] = 1.0 - cfg.preemphasis  # x[0] -= p*x[0] (kaldi.py:164-168)
        chain = pre @ chain
    chain = np.diag(_window_function(cfg)) @ chain

    k = np.arange(nbins, dtype=np.float64)[:, None]  # (nbins, 1)
    n = np.arange(win, dtype=np.float64)[None, :]  # (1, win)
    ang = 2.0 * math.pi * k * n / nfft
    a_cos = (np.cos(ang) @ chain).T.astype(np.float32)  # (win, nbins)
    a_sin = (-np.sin(ang) @ chain).T.astype(np.float32)
    return a_cos, a_sin, mel_banks(cfg)


# ---------------------------------------------------------------------------
# framing
# ---------------------------------------------------------------------------


def frame_signal(wav: jnp.ndarray, length: jnp.ndarray, cfg: FbankConfig,
                 max_frames: Optional[int] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Extract frames from a (possibly padded) 1-D waveform with true length.

    Returns (frames (T_max, win), frame_mask (T_max,)).  snip-edges=false
    mirrors the signal at both true edges with edge duplication
    ([x2 x1 x0 | x0 x1 ...] — kaldi.py:61-81).

    TPU note: NO general gather anywhere — XLA lowers arbitrary gathers to
    per-element loops on TPU (measured ~80 ms/batch vs <1 ms for this
    formulation).  Instead:
      - the padded signal is reshaped into shift-sized rows and each frame is
        the concatenation of ceil(win/shift) consecutive row slices
        (pure reshape/slice/concat, all static);
      - the start mirror is a static flip (it never depends on the true
        length);
      - the end mirror is flip(dynamic_slice(wav, n-win, win)) written back
        with one dynamic_update_slice at position pad+n.
    Requires length >= window_size, which Kaldi itself asserts
    (kaldi.py:128).
    """
    n_static = wav.shape[0]
    shift, win = cfg.window_shift, cfg.window_size
    if max_frames is None:
        max_frames = int(num_frames(n_static, cfg))
    mask = jnp.arange(max_frames) < num_frames(length, cfg)

    if cfg.snip_edges:
        pad = 0
        base = jnp.concatenate([wav, jnp.zeros((win + shift,), wav.dtype)])
    else:
        pad = win // 2 - shift // 2
        if pad >= 0:
            start_mirror = wav[:pad][::-1]
            base = jnp.concatenate(
                [start_mirror, wav, jnp.zeros((win + shift,), wav.dtype)])
        else:
            # frame_shift > frame_length: the reference TRIMS the front
            # (kaldi.py:74-77 waveform[-pad:]) — a python slice here since
            # pad is static; wav[:pad][::-1] would instead prepend almost
            # the whole reversed waveform and silently corrupt every frame
            base = jnp.concatenate(
                [wav[-pad:], jnp.zeros((win + shift,), wav.dtype)])
        # end mirror: positions [n, n+win) read wav[2n-1-i] = flip(wav[n-win:n])
        end_patch = jax.lax.dynamic_slice(
            wav, (jnp.maximum(length - win, 0),), (win,))[::-1]
        base = jax.lax.dynamic_update_slice(
            base, end_patch, (jnp.maximum(pad + length, 0),))

    n_rows = -(-win // shift)  # ceil
    total_rows = max_frames + n_rows
    need = total_rows * shift
    if need > base.shape[0]:
        base = jnp.concatenate([base, jnp.zeros((need - base.shape[0],), wav.dtype)])
    rows = base[:need].reshape(total_rows, shift)
    frames = jnp.concatenate(
        [rows[j:j + max_frames] for j in range(n_rows)], axis=1)[:, :win]
    return frames, mask


# ---------------------------------------------------------------------------
# fbank / mfcc
# ---------------------------------------------------------------------------


def _log_energy(frames_dc: jnp.ndarray, cfg: FbankConfig) -> jnp.ndarray:
    e = jnp.maximum(jnp.sum(frames_dc * frames_dc, axis=-1), EPS_F32)
    loge = jnp.log(e)
    if cfg.energy_floor > 0.0:
        loge = jnp.maximum(loge, math.log(cfg.energy_floor))
    return loge


def _fbank_frames(frames: jnp.ndarray, cfg: FbankConfig,
                  rng: Optional[jax.Array]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """frames (..., win) → (log-mel (..., n_mels), log_energy (...))."""
    a_cos, a_sin, banks = _frontend_matrices(cfg)
    a_cos, a_sin = jnp.asarray(a_cos), jnp.asarray(a_sin)
    x = frames.astype(jnp.float32)
    if cfg.dither != 0.0 and rng is not None:
        x = x + cfg.dither * jax.random.normal(rng, x.shape, jnp.float32)
    if cfg.raw_energy:
        # raw energy is measured after de-DC but before preemph/window
        xdc = x - jnp.mean(x, axis=-1, keepdims=True) if cfg.remove_dc_offset else x
        loge = _log_energy(xdc, cfg)
    # HIGHEST precision: the TPU MXU's default f32 path accumulates in
    # bf16 passes, which is fine for the model but breaks Kaldi parity here
    re = jnp.dot(x, a_cos, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    im = jnp.dot(x, a_sin, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    power = re * re + im * im
    if not cfg.use_power:
        power = jnp.sqrt(power)
    mel = jnp.dot(power, jnp.asarray(banks).T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    if cfg.use_log_fbank:
        mel = jnp.log(jnp.maximum(mel, EPS_F32))
    if not cfg.raw_energy:
        raise NotImplementedError("raw_energy=False not supported (unused by recipes)")
    return mel, loge


@functools.partial(jax.jit, static_argnames=("cfg", "max_frames"))
def fbank(wav: jnp.ndarray, length: jnp.ndarray, cfg: FbankConfig = FbankConfig(),
          rng: Optional[jax.Array] = None, max_frames: Optional[int] = None
          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched log-mel filterbank.

    Args:
      wav: (B, N) float32 waveform in int16 scale (Kaldi convention: raw
        sample values, NOT normalized to ±1 — dither=1.0 assumes this scale).
      length: (B,) true sample counts.
      rng: PRNG key for dither (None → no dither).
    Returns:
      feats (B, T_max, num_mel_bins [+1 energy]), mask (B, T_max) bool.
    """
    if wav.ndim == 1:
        wav, length = wav[None], jnp.atleast_1d(length)
    frames, mask = jax.vmap(lambda w, l: frame_signal(w, l, cfg, max_frames))(wav, length)
    rngs = None
    if rng is not None and cfg.dither != 0.0:
        rngs = rng
    mel, loge = _fbank_frames(frames, cfg, rngs)
    if cfg.use_energy:
        mel = jnp.concatenate([loge[..., None], mel], axis=-1)
    return mel, mask


def _dct_matrix(num_ceps: int, num_bins: int) -> np.ndarray:
    """Orthonormal DCT-II with Kaldi's C0 convention, shape (num_bins, num_ceps)."""
    n = np.arange(num_bins, dtype=np.float64)
    k = np.arange(num_bins, dtype=np.float64)[:, None]
    m = np.sqrt(2.0 / num_bins) * np.cos(math.pi / num_bins * (n + 0.5) * k)  # (k, n)
    m = m.T  # right-multiply form: (num_bins, num_bins)
    m[:, 0] = math.sqrt(1.0 / num_bins)
    return m[:, :num_ceps].astype(np.float32)


def _lifter_coeffs(num_ceps: int, q: float) -> np.ndarray:
    i = np.arange(num_ceps, dtype=np.float64)
    return (1.0 + 0.5 * q * np.sin(math.pi * i / q)).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "max_frames"))
def mfcc(wav: jnp.ndarray, length: jnp.ndarray, cfg: MfccConfig = MfccConfig(),
         rng: Optional[jax.Array] = None, max_frames: Optional[int] = None
         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched MFCC (DCT of log-mels, liftered; C0 = raw log energy when
    use_energy, which is what the energy VAD consumes — kaldi.py:602-650)."""
    if wav.ndim == 1:
        wav, length = wav[None], jnp.atleast_1d(length)
    frames, mask = jax.vmap(lambda w, l: frame_signal(w, l, cfg, max_frames))(wav, length)
    base = replace(cfg, use_energy=False, use_log_fbank=True, use_power=True)
    mel, loge = _fbank_frames(frames, base, rng if cfg.dither != 0.0 else None)
    dct = jnp.asarray(_dct_matrix(cfg.num_ceps, cfg.num_mel_bins))
    feats = jnp.dot(mel, dct, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    if cfg.cepstral_lifter != 0.0:
        feats = feats * jnp.asarray(_lifter_coeffs(cfg.num_ceps, cfg.cepstral_lifter))
    if cfg.use_energy:
        feats = feats.at[..., 0].set(loge)
    return feats, mask
