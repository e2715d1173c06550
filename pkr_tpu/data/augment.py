"""On-device waveform augmentation: additive noise / music / babble at SNR,
RIR reverberation, speed perturbation.

Replaces the reference's augmentation machinery — steps/data/
augment_data_dir.py + reverberate_data_dir.py, which rewrite wav.scp entries
into `wav-reverberate` C++ pipe commands executed per-utterance at feature
time (SURVEY §2.5) — with batched jittable ops that run just before the
fused frontend, so augmented features never touch the disk.

Semantics preserved from wav-reverberate:
- additive signals are tiled/cropped to the target length at a random start
  offset and scaled to an exact SNR in dB against the signal energy
  (run.sh:136-144 SNR grids: noise 15:10:5:0, music 15:10:8:5,
  babble 20:17:15:13, babble mixes 3-7 speech sources);
- RIR convolution via rFFT, output shifted so the direct path (RIR peak)
  stays time-aligned (--shift-output=true) and power-normalized to the dry
  signal's energy (--normalize-output default);
- speed perturbation by sox-style resampling (factors 0.9/1.0/1.1,
  utils/perturb_data_dir_speed.sh) implemented as linear interpolation.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _energy(x: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
    mask = jnp.arange(x.shape[-1]) < length
    return jnp.sum((x * mask) ** 2, axis=-1)


@functools.partial(jax.jit, static_argnames=())
def add_noise_snr(signal: jnp.ndarray, sig_len: jnp.ndarray,
                  noise: jnp.ndarray, noise_len: jnp.ndarray,
                  snr_db: jnp.ndarray, start: jnp.ndarray) -> jnp.ndarray:
    """Mix one noise source into one signal at an exact SNR.

    signal (N,), noise (M,) with true lengths; the noise is read circularly
    from `start` so any start offset and length work under static shapes.
    """
    n = signal.shape[-1]
    idx = (start + jnp.arange(n)) % jnp.maximum(noise_len, 1)
    tiled = noise[idx]
    e_sig = jnp.maximum(_energy(signal, sig_len), 1e-10)
    e_noise = jnp.maximum(_energy(tiled, sig_len), 1e-10)
    scale = jnp.sqrt(e_sig / (e_noise * 10.0 ** (snr_db / 10.0)))
    mask = jnp.arange(n) < sig_len
    return signal + scale * tiled * mask


@jax.jit
def reverberate(signal: jnp.ndarray, sig_len: jnp.ndarray,
                rir: jnp.ndarray, rir_len: jnp.ndarray) -> jnp.ndarray:
    """FFT convolution with an impulse response; direct-path aligned and
    power-normalized (wav-reverberate --shift-output --normalize-output)."""
    n = signal.shape[-1]
    m = rir.shape[-1]
    fft_n = 1
    while fft_n < n + m:
        fft_n *= 2
    rir_mask = jnp.arange(m) < rir_len
    rir = rir * rir_mask
    S = jnp.fft.rfft(signal, fft_n)
    H = jnp.fft.rfft(rir, fft_n)
    wet_full = jnp.fft.irfft(S * H, fft_n)
    # shift so the RIR's peak (direct path) maps t→t
    peak = jnp.argmax(jnp.abs(rir))
    idx = jnp.arange(n) + peak
    wet = wet_full[idx]
    e_dry = jnp.maximum(_energy(signal, sig_len), 1e-10)
    e_wet = jnp.maximum(_energy(wet, sig_len), 1e-10)
    out = wet * jnp.sqrt(e_dry / e_wet)
    return out * (jnp.arange(n) < sig_len)


def speed_perturb(signal: np.ndarray, factor: float) -> np.ndarray:
    """sox speed semantics: playback-rate change (resample, new length
    n/factor).  Host-side numpy: this runs once per utterance at dataset
    build, not in the jit path."""
    n = len(signal)
    new_n = int(round(n / factor))
    pos = np.arange(new_n) * factor
    i0 = np.clip(pos.astype(np.int64), 0, n - 1)
    i1 = np.clip(i0 + 1, 0, n - 1)
    frac = (pos - i0).astype(signal.dtype)
    return signal[i0] * (1 - frac) + signal[i1] * frac


class WavAugmenter:
    """Random augmentation policy over a batch, reference SNR grids.

    Draws one of {none, noise, music, babble, reverb} per utterance
    (augment_data_dir.py composes a 2x corpus: clean + one augmentation each;
    run.sh:162-164) and applies it on device.
    """

    SNR = {"noise": (15.0, 10.0, 5.0, 0.0),
           "music": (15.0, 10.0, 8.0, 5.0),
           "babble": (20.0, 17.0, 15.0, 13.0)}

    def __init__(self, noise: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                 music: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                 speech: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                 rirs: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                 seed: int = 0):
        """Each pool is (padded matrix (K, L), lengths (K,))."""
        self.pools = {}
        if noise is not None:
            self.pools["noise"] = noise
        if music is not None:
            self.pools["music"] = music
        if speech is not None:
            self.pools["babble"] = speech
        self.rirs = rirs
        self.rng = np.random.default_rng(seed)

    def kinds(self):
        out = list(self.pools)
        if self.rirs is not None:
            out.append("reverb")
        return out

    def __call__(self, wavs: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """Augment a (B, N) batch in place-ish; one random kind per row."""
        kinds = self.kinds()
        if not kinds:
            return wavs
        out = jnp.asarray(wavs)
        lengths = jnp.asarray(lengths)
        choice = self.rng.integers(0, len(kinds) + 1, size=len(wavs))  # +1 → clean
        for b in range(len(wavs)):
            if choice[b] == len(kinds):
                continue
            kind = kinds[choice[b]]
            if kind == "reverb":
                mats, lens = self.rirs
                k = self.rng.integers(0, len(mats))
                row = reverberate(out[b], lengths[b],
                                  jnp.asarray(mats[k]), jnp.asarray(lens[k]))
            elif kind == "babble":
                mats, lens = self.pools["babble"]
                row = out[b]
                n_src = self.rng.integers(3, 8)
                snr = self.rng.choice(self.SNR["babble"])
                for _ in range(n_src):
                    k = self.rng.integers(0, len(mats))
                    row = add_noise_snr(row, lengths[b], jnp.asarray(mats[k]),
                                        jnp.asarray(lens[k]),
                                        jnp.asarray(snr + 3.0 * np.log(n_src)),
                                        jnp.asarray(self.rng.integers(0, max(lens[k], 1))))
            else:
                mats, lens = self.pools[kind]
                k = self.rng.integers(0, len(mats))
                snr = self.rng.choice(self.SNR[kind])
                row = add_noise_snr(out[b], lengths[b], jnp.asarray(mats[k]),
                                    jnp.asarray(lens[k]), jnp.asarray(snr),
                                    jnp.asarray(self.rng.integers(0, max(lens[k], 1))))
            out = out.at[b].set(row)
        return np.asarray(out)
