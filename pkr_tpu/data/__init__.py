"""Host-side input pipeline: balanced samplers, chunking, prefetch."""

from pkr_tpu.data.sampler import (
    BalancedRepetitionSampler,
    SpeakerBalancedSampler,
    load_utt2spkid,
)
from pkr_tpu.data.loader import FeatureSource, TrainLoader, EvalLoader, bucket_lengths
from pkr_tpu.data.device_cache import DeviceFeatureCache, DeviceCacheLoader
from pkr_tpu.data.materialize import MaterializedSource, materialize

__all__ = [
    "BalancedRepetitionSampler",
    "SpeakerBalancedSampler",
    "load_utt2spkid",
    "FeatureSource",
    "TrainLoader",
    "EvalLoader",
    "bucket_lengths",
    "DeviceFeatureCache",
    "DeviceCacheLoader",
    "MaterializedSource",
    "materialize",
]
