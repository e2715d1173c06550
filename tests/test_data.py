"""Sampler and loader tests (datasets.py balancing semantics)."""

import os
import time
import numpy as np
import pytest

from pkr_tpu.data.sampler import BalancedRepetitionSampler, SpeakerBalancedSampler
from pkr_tpu.data.loader import EvalLoader, FeatureSource, TrainLoader, bucket_lengths
from pkr_tpu.io import kaldi_ark


def test_balanced_repetition_counts():
    """datasets.py:16-31: cap = min(500, (max_count+1)//2); each utt repeated
    max(1, cap // class_count)."""
    labels = [0] * 10 + [1] * 2 + [2] * 1
    utts = [f"u{i}" for i in range(len(labels))]
    s = BalancedRepetitionSampler(utts, labels)
    assert s.max_id_count == (10 + 1) // 2  # == 5
    # class 0: rep 5//10=0 → max(1,0)=1 each → 10; class 1: 5//2=2 → 4; class 2: 5//1=5
    assert len(s) == 10 + 4 + 5
    counts = np.bincount(s.labels[s.index])
    assert list(counts) == [10, 4, 5]


def test_balanced_repetition_cap_500():
    labels = [0] * 2000 + [1] * 4
    utts = [f"u{i}" for i in range(len(labels))]
    s = BalancedRepetitionSampler(utts, labels)
    assert s.max_id_count == 500
    counts = np.bincount(s.labels[s.index])
    assert counts[1] == 4 * (500 // 4)


def test_epoch_indices_disjoint_across_hosts():
    labels = list(range(8)) * 4
    utts = [f"u{i}" for i in range(len(labels))]
    s = BalancedRepetitionSampler(utts, labels)
    a = s.epoch_indices(3, seed=7, process_index=0, process_count=2)
    b = s.epoch_indices(3, seed=7, process_index=1, process_count=2)
    assert len(a) + len(b) == len(s)
    # same epoch twice → identical (deterministic across hosts)
    a2 = s.epoch_indices(3, seed=7, process_index=0, process_count=2)
    np.testing.assert_array_equal(a, a2)
    # different epoch → different order
    a3 = s.epoch_indices(4, seed=7, process_index=0, process_count=2)
    assert not np.array_equal(a, a3)


def test_speaker_balanced_sampler():
    """datasets.py:74-146: epoch = num_spk × (max_count+1)//2 draws, each
    speaker equally often."""
    labels = [0] * 9 + [1] * 3 + [2] * 1
    utts = [f"u{i}" for i in range(len(labels))]
    s = SpeakerBalancedSampler(utts, labels)
    assert s.num_spk == 3 and s.repetition == 5 and len(s) == 15
    idx = s.epoch_indices(0, seed=1)
    drawn = s.labels[idx]
    assert list(np.bincount(drawn)) == [5, 5, 5]


@pytest.fixture
def feat_dir(tmp_path):
    rng = np.random.default_rng(0)
    utts = {}
    with kaldi_ark.write_ark_scp(str(tmp_path / "f.ark"), str(tmp_path / "f.scp")) as w:
        for i in range(12):
            n = 30 + 13 * i
            utts[f"u{i:02d}"] = rng.standard_normal((n, 8)).astype(np.float32)
            w.write(f"u{i:02d}", utts[f"u{i:02d}"])
    return tmp_path, utts


def test_train_loader_shapes_and_crops(feat_dir):
    tmp_path, utts = feat_dir
    src = FeatureSource(str(tmp_path / "f.scp"))
    labels = [i % 3 for i in range(12)]
    sampler = BalancedRepetitionSampler(src.utts, labels)
    loader = TrainLoader(src, labels, sampler, batch_size=4, chunk=20, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == loader.batches_per_epoch()
    for feats, labs in batches:
        assert feats.shape == (4, 8, 20)  # (B, F, T)
        assert labs.shape == (4,)
    # determinism
    batches2 = list(loader.epoch(0))
    np.testing.assert_array_equal(batches[0][0], batches2[0][0])


def test_train_loader_short_utterance_tiling(feat_dir):
    tmp_path, _ = feat_dir
    src = FeatureSource(str(tmp_path / "f.scp"))
    labels = [0] * 12
    sampler = BalancedRepetitionSampler(src.utts, labels)
    loader = TrainLoader(src, labels, sampler, batch_size=4, chunk=50, seed=0)
    for feats, _ in loader.epoch(0):
        assert feats.shape[-1] == 50  # shortest utt is 30 → tiled


def test_eval_loader_buckets(feat_dir):
    tmp_path, utts = feat_dir
    src = FeatureSource(str(tmp_path / "f.scp"))
    loader = EvalLoader(src, batch_size=3, quantum=50, max_len=150)
    seen = {}
    for keys, feats, mask in loader:
        assert feats.shape[2] % 50 == 0 and feats.shape[2] <= 150
        for b, k in enumerate(keys):
            n = int(mask[b].sum())
            np.testing.assert_array_equal(feats[b, :, :n], utts[k][:n].T)
            assert np.abs(feats[b, :, n:]).sum() == 0
            seen[k] = n
    assert set(seen) == set(src.utts)  # each utt exactly once — no dedup pass
    # true length preserved (up to the cap)
    for k, v in utts.items():
        assert seen[k] == min(len(v), 150)


def test_bucket_lengths():
    np.testing.assert_array_equal(bucket_lengths([1, 99, 100, 101], 100),
                                  [100, 100, 100, 200])
    np.testing.assert_array_equal(bucket_lengths([350], 100, 300), [300])


def test_materialized_source(feat_dir, tmp_path):
    from pkr_tpu.data.materialize import MaterializedSource, materialize
    from pkr_tpu.data.sampler import BalancedRepetitionSampler

    src_dir, utts = feat_dir
    idx = materialize(str(src_dir / "f.scp"), str(tmp_path / "pack"), dtype="float32")
    src = MaterializedSource(idx)
    assert set(src.utts) == set(utts)
    for i, utt in enumerate(src.utts):
        np.testing.assert_allclose(src.read(i), utts[utt], rtol=1e-6)
        assert src.dims(i) == utts[utt].shape
        crop = src.read_crop_t(i, 5, 10)
        np.testing.assert_allclose(crop, utts[utt][5:15].T, rtol=1e-6)
    # wrap-around crop
    rows = src.dims(0)[0]
    crop = src.read_crop_t(0, rows - 3, 8)
    idx2 = (rows - 3 + np.arange(8)) % rows
    np.testing.assert_allclose(crop, utts[src.utts[0]][idx2].T, rtol=1e-6)
    # drop-in to TrainLoader
    labels = [0, 1] * 6
    loader = TrainLoader(src, labels, BalancedRepetitionSampler(src.utts, labels),
                         batch_size=4, chunk=16, seed=0)
    feats, labs = next(iter(loader.epoch(0)))
    assert feats.shape == (4, 8, 16)


def test_materialize_fp16_precision(feat_dir, tmp_path):
    from pkr_tpu.data.materialize import MaterializedSource, materialize

    src_dir, utts = feat_dir
    idx = materialize(str(src_dir / "f.scp"), str(tmp_path / "pack16"))
    src = MaterializedSource(idx)
    for i, utt in enumerate(src.utts):
        err = np.abs(src.read(i) - utts[utt]).max()
        assert err < 0.01, err


def test_eval_loader_process_sharding(feat_dir):
    src_dir, utts = feat_dir
    src = FeatureSource(str(src_dir / "f.scp"))
    seen = []
    for p in range(3):
        loader = EvalLoader(src, batch_size=2, quantum=50, max_len=150,
                            process_index=p, process_count=3)
        for keys, _, _ in loader:
            seen.extend(keys)
    assert sorted(seen) == sorted(src.utts)  # exact partition, no dup/drop


def test_eval_loader_long_mode_average(feat_dir):
    src_dir, utts = feat_dir
    src = FeatureSource(str(src_dir / "f.scp"))
    loader = EvalLoader(src, batch_size=3, quantum=50, max_len=100,
                        long_mode="average")
    seen = {}
    for keys, feats, mask in loader:
        for b, k in enumerate(keys):
            seen[k] = int(mask[b].sum())
    # long utterances appear as ##k segments covering all their frames
    for i, (u, m) in enumerate(sorted(utts.items())):
        if len(m) <= 100:
            assert u in seen and seen[u] == len(m)
        else:
            segs = [k for k in seen if k.startswith(u + "##")]
            assert len(segs) == -(-len(m) // 100)
            assert sum(seen[s] for s in segs) == len(m)


def test_eval_loader_over_materialized_source(feat_dir, tmp_path):
    """EvalLoader duck-types over MaterializedSource (memmap pack serving)."""
    from pkr_tpu.data.materialize import MaterializedSource, materialize

    src_dir, utts = feat_dir
    idx = materialize(str(src_dir / "f.scp"), str(tmp_path / "p"), dtype="float32")
    src = MaterializedSource(idx)
    loader = EvalLoader(src, batch_size=4, quantum=50, max_len=150)
    seen = set()
    for keys, feats, mask in loader:
        for b, k in enumerate(keys):
            n = int(mask[b].sum())
            np.testing.assert_allclose(feats[b, :, :n], utts[k][:n].T, rtol=1e-6)
            seen.add(k)
    assert seen == set(src.utts)


class DictFeatureSource:
    """Minimal in-memory FeatureSource for loader tests."""

    def __init__(self, mats):
        self.utts = sorted(mats)
        self._mats = mats

    def __len__(self):
        return len(self.utts)

    def read(self, i):
        return self._mats[self.utts[i]]


def test_eval_loader_pads_tail_buckets_to_full_batch():
    """Every emitted batch has exactly batch_size rows (VERDICT r1 weak #9:
    ragged tails would each compile a fresh program), pad rows carry a full
    mask over zero features, and keys keep the true row count so consumers
    drop the padding."""
    rng = np.random.default_rng(11)
    # 7 utts over two buckets with batch_size 4 → two ragged tails without
    # padding
    mats = {f"u{i}": rng.standard_normal(
        (60 if i < 3 else 120, 8)).astype(np.float32) for i in range(7)}
    src = DictFeatureSource(mats)
    loader = EvalLoader(src, batch_size=4, quantum=50, max_len=150)
    shapes, total_keys = set(), []
    for keys, feats, mask in loader:
        assert feats.shape[0] == 4 == mask.shape[0]
        shapes.add(feats.shape)
        total_keys += keys
        for b in range(len(keys), 4):  # pad rows: full mask, zero features
            assert mask[b].all() and not feats[b].any()
    assert sorted(total_keys) == sorted(mats)
    # a corpus pass emits only (batch, L) shapes warmup_buckets covers:
    # L in quantum steps up to max_len
    for s in shapes:
        assert s[2] % 50 == 0 and s[2] <= 150
    # opt-out keeps the old ragged behaviour
    ragged = EvalLoader(src, batch_size=4, quantum=50, max_len=150,
                        pad_to_batch=False)
    assert any(f.shape[0] < 4 for _, f, _ in ragged)


def test_extraction_drops_pad_rows():
    """extract_embeddings over a padded-tail corpus returns exactly the real
    utterances with the same embeddings as the unpadded path."""
    import jax
    import jax.numpy as jnp

    from pkr_tpu.eval.extract import extract_embeddings
    from pkr_tpu.models import SpeakerModel

    rng = np.random.default_rng(12)
    mats = {f"u{i}": rng.standard_normal((40, 8)).astype(np.float32)
            for i in range(5)}
    model = SpeakerModel(spk_num=4, feat_dim=8, trunk="tiny_resnet",
                         loss="AAM", dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 16)),
                           train=False)
    mk = lambda pad: EvalLoader(DictFeatureSource(mats), batch_size=4,
                                quantum=40, max_len=80, pad_to_batch=pad)
    a = extract_embeddings(model, variables, mk(True))
    b = extract_embeddings(model, variables, mk(False))
    assert sorted(a) == sorted(mats)
    for u in mats:
        np.testing.assert_allclose(a[u], b[u], rtol=1e-5, atol=1e-6)


def test_train_loader_abandoned_epoch_stops_producer(feat_dir):
    """Breaking out of an epoch mid-iteration must terminate the producer
    thread (a blocked q.put would leak one thread + its ark fds per
    aborted epoch)."""
    import threading
    import gc

    tmp_path, _ = feat_dir
    src = FeatureSource(str(tmp_path / "f.scp"))
    labels = [i % 3 for i in range(12)]
    sampler = BalancedRepetitionSampler(src.utts, labels)
    loader = TrainLoader(src, labels, sampler, batch_size=2, chunk=20, seed=0)
    before = threading.active_count()
    for _ in range(3):
        gen = loader.epoch(0)
        next(gen)  # consume one batch, abandon the rest
        gen.close()
    gc.collect()
    deadline = time.time() + 10.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
