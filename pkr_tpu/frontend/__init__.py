"""On-device feature pipeline: wav → fbank/MFCC → VAD → sliding CMVN.

Replaces the external Kaldi C++ binaries compute-fbank-feats,
compute-mfcc-feats, compute-vad, apply-cmvn-sliding and
select-voiced-frames (SURVEY.md §2.6) with fused, batched JAX ops.
"""

from pkr_tpu.frontend.features import (
    FbankConfig,
    MfccConfig,
    frame_signal,
    fbank,
    mfcc,
    num_frames,
    mel_banks,
)
from pkr_tpu.frontend.vad import VadConfig, energy_vad
from pkr_tpu.frontend.cmvn import sliding_cmvn, select_voiced
from pkr_tpu.frontend.pipeline import FrontendConfig, wav_to_train_feats

__all__ = [
    "FbankConfig",
    "MfccConfig",
    "VadConfig",
    "FrontendConfig",
    "frame_signal",
    "fbank",
    "mfcc",
    "num_frames",
    "mel_banks",
    "energy_vad",
    "sliding_cmvn",
    "select_voiced",
    "wav_to_train_feats",
]
