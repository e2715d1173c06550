"""Host-side input pipeline: balanced samplers, chunking, prefetch."""

from pkr_tpu.data.sampler import (
    BalancedRepetitionSampler,
    SpeakerBalancedSampler,
    load_utt2spkid,
)
from pkr_tpu.data.loader import FeatureSource, TrainLoader, EvalLoader, bucket_lengths

__all__ = [
    "BalancedRepetitionSampler",
    "SpeakerBalancedSampler",
    "load_utt2spkid",
    "FeatureSource",
    "TrainLoader",
    "EvalLoader",
    "bucket_lengths",
]
