"""Flax model zoo: ResNet/SE/Thin/Bottleneck trunks, DenseNet trunks,
and the speaker-embedding model with softmax/AAM heads."""

from pkr_tpu.models.resnet import (
    ResNet,
    ThinResNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    se_resnet34,
    thin_resnet34,
)
from pkr_tpu.models.speaker_model import SpeakerModel

__all__ = [
    "ResNet",
    "ThinResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
    "se_resnet34",
    "thin_resnet34",
    "SpeakerModel",
]
