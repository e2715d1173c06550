"""pkr_tpu — a TPU-native (JAX/Flax/Pallas/pjit) speaker-verification framework.

A ground-up rebuild of the capabilities of the ZihanLiao/pytorch-kaldi-resnet
recipe stack (Kaldi C++ binaries + shell/Perl scaffolding + PyTorch DDP) as a
single JAX program:

- ``pkr_tpu.io``        Kaldi ark/scp interop + the data-dir model
                        (replaces kaldi_io.py and utils/*_data_dir.sh)
- ``pkr_tpu.frontend``  fused on-device wav→fbank/MFCC→VAD→CMVN pipeline
                        (replaces compute-fbank-feats / compute-vad /
                        apply-cmvn-sliding / select-voiced-frames C++ binaries)
- ``pkr_tpu.models``    Flax ResNet/SE/Thin/DenseNet trunks, stats pooling,
                        softmax/AAM heads (replaces scripts/model.py,
                        scripts/densenet.py)
- ``pkr_tpu.data``      balanced samplers, chunking, host-side pipeline
                        (replaces scripts/datasets.py + DistributedSampler)
- ``pkr_tpu.parallel``  device meshes and sharding rules (replaces
                        torch.distributed / NCCL / mp.spawn)
- ``pkr_tpu.train``     pjit data-parallel training loop, checkpointing
                        (replaces scripts/train_resnet.py, imagenet_main.py)
- ``pkr_tpu.eval``      extraction, cosine / adaptive-S-norm / PLDA scoring,
                        EER/minDCF (replaces scripts/decode.py + scoring
                        scripts + ivector-* Kaldi binaries)
- ``pkr_tpu.recipes``   stage-gated Python drivers replacing run*.sh
"""

__version__ = "0.1.0"
