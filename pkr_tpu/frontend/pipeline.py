"""Fused wav → training-features pipeline.

One jitted program replacing the reference's stages 1+4 (feature_pre.sh:77-106
and 188-197): fbank extraction, MFCC-energy VAD, sliding CMVN and
voiced-frame selection — four separate C++ binary pipes over ark files in the
reference, a single on-device dataflow here.

Fusion insight: the recipe's MFCC pass exists only to feed coefficient 0 to
the energy VAD, and with Kaldi's use-energy default, C0 *is* the raw frame
log-energy (kaldi.py:617-637).  So the pipeline frames the signal once and
derives fbank + VAD energy from the same frames; the full MFCC matmul chain
is never needed on the training path.  (Each Kaldi binary re-dithered
independently; we give the VAD energy its own dither draw to match that
setup in distribution.)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pkr_tpu.frontend.features import FbankConfig, _fbank_frames, frame_signal
from pkr_tpu.frontend.vad import VadConfig, energy_vad
from pkr_tpu.frontend.cmvn import sliding_cmvn, select_voiced


@dataclass(frozen=True)
class FrontendConfig:
    fbank: FbankConfig = field(default_factory=FbankConfig)
    vad: VadConfig = field(default_factory=VadConfig)
    cmn_window: int = 300
    cmn_center: bool = True
    cmn_norm_vars: bool = False


@functools.partial(jax.jit, static_argnames=("cfg", "max_frames", "apply_vad"))
def wav_to_train_feats(wav: jnp.ndarray, length: jnp.ndarray,
                       rng: Optional[jax.Array] = None,
                       cfg: FrontendConfig = FrontendConfig(),
                       max_frames: Optional[int] = None,
                       apply_vad: bool = True
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(B, N) int16-scale waveforms + (B,) lengths → CMVN'd voiced fbank.

    Returns (feats (B, T_max, n_mels), mask (B, T_max), vad (B, T_max)).
    With apply_vad=False the un-selected CMVN features and the VAD decisions
    are returned (the decode/"liveshow" paths keep all frames).
    """
    if wav.ndim == 1:
        wav, length = wav[None], jnp.atleast_1d(length)
    fb_cfg = cfg.fbank
    frames, mask = jax.vmap(lambda w, l: frame_signal(w, l, fb_cfg, max_frames))(wav, length)

    k_fb = k_vad = None
    if rng is not None and fb_cfg.dither != 0.0:
        k_fb, k_vad = jax.random.split(rng)

    mel, _ = _fbank_frames(frames, fb_cfg, k_fb)

    # VAD energy: independent dither draw on the same frames (the reference's
    # compute-mfcc-feats re-dithers; C0 = log raw energy of the de-DC'd frame)
    x = frames.astype(jnp.float32)
    if k_vad is not None:
        x = x + fb_cfg.dither * jax.random.normal(k_vad, x.shape, jnp.float32)
    if fb_cfg.remove_dc_offset:
        x = x - jnp.mean(x, axis=-1, keepdims=True)
    from pkr_tpu.frontend.features import _log_energy

    loge = _log_energy(x, fb_cfg)  # honors energy_floor, one implementation

    vad = energy_vad(loge, mask, cfg.vad)
    feats = sliding_cmvn(mel, mask, cfg.cmn_window, cfg.cmn_center, cfg.cmn_norm_vars)
    if apply_vad:
        feats, mask = select_voiced(feats, vad, mask)
    return feats, mask, vad
