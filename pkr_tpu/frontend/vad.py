"""Energy-based voice activity detection (Kaldi compute-vad semantics).

Replicates ComputeVadEnergy as configured by conf/vad.conf
(--vad-energy-threshold=5.5 --vad-energy-mean-scale=0.5
--vad-proportion-threshold=0.12 --vad-frames-context=2), the binary invoked
at local/compute_vad_decision.sh:63-69.  Decision per frame t: within the
±context window, the fraction of frames whose log-energy (MFCC C0) exceeds
``threshold + mean_scale * mean(log_energy)`` must reach the proportion
threshold.

Vectorized as a small stack of shifted masks — no frame loop; batched and
mask-aware so padded batches give identical results to per-utterance runs.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VadConfig:
    energy_threshold: float = 5.5
    energy_mean_scale: float = 0.5
    frames_context: int = 2
    proportion_threshold: float = 0.12


@functools.partial(jax.jit, static_argnames=("cfg",))
def energy_vad(log_energy: jnp.ndarray, mask: jnp.ndarray,
               cfg: VadConfig = VadConfig()) -> jnp.ndarray:
    """(B, T) log energies + (B, T) valid mask → (B, T) float32 0/1 decisions.

    Invalid (padded) frames get 0 and do not influence any window.
    """
    if log_energy.ndim == 1:
        log_energy, mask = log_energy[None], mask[None]
    maskf = mask.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(maskf, axis=-1, keepdims=True), 1.0)
    thresh = cfg.energy_threshold
    if cfg.energy_mean_scale != 0.0:
        mean_e = jnp.sum(log_energy * maskf, axis=-1, keepdims=True) / n_valid
        thresh = thresh + cfg.energy_mean_scale * mean_e
    above = (log_energy > thresh).astype(jnp.float32) * maskf

    num = jnp.zeros_like(above)
    den = jnp.zeros_like(above)
    c = cfg.frames_context
    for off in range(-c, c + 1):
        shifted_above = jnp.roll(above, off, axis=-1)
        shifted_mask = jnp.roll(maskf, off, axis=-1)
        t = jnp.arange(above.shape[-1])
        # roll wraps; frames whose source index fell outside [0, T) don't count
        in_range = ((t - off >= 0) & (t - off < above.shape[-1]))[None, :].astype(jnp.float32)
        num = num + shifted_above * in_range
        den = den + shifted_mask * in_range
    voiced = (num >= den * cfg.proportion_threshold).astype(jnp.float32) * maskf
    return voiced
