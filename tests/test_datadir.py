"""Tests for the data-directory model (fix/validate/subset/split/combine)."""

import numpy as np

from pkr_tpu.io.datadir import DataDir


def make_dir():
    utt2spk = {f"spk{i}-utt{j}": f"spk{i}" for i in range(3) for j in range(4)}
    wav = {u: f"/wav/{u}.wav" for u in utt2spk}
    return DataDir({"utt2spk": utt2spk, "wav.scp": wav}).make_spk2utt()


def test_spk2utt_regen():
    d = make_dir()
    assert d["spk2utt"]["spk0"] == "spk0-utt0 spk0-utt1 spk0-utt2 spk0-utt3"
    assert d.validate() == []


def test_fix_intersects():
    d = make_dir()
    del d.tables["wav.scp"]["spk1-utt2"]
    assert d.validate() != []
    fixed = d.fix()
    assert fixed.validate() == []
    assert "spk1-utt2" not in fixed["utt2spk"]
    assert fixed.num_utts == 11


def test_subset_split_combine():
    d = make_dir()
    sub = d.subset(5)
    assert sub.num_utts == 5
    shards = [d.split(3, i) for i in range(3)]
    assert sum(s.num_utts for s in shards) == d.num_utts
    assert set(DataDir.combine(shards).utts) == set(d.utts)


def test_assign_spk_ids_and_cv_split():
    d = make_dir()
    d2, num_spk = d.assign_spk_ids()
    assert num_spk == 3
    ids = set(int(v) for v in d2["utt2spkid"].values())
    assert ids == {0, 1, 2}
    train, cv = d2.train_cv_split(0.25, seed=1)
    assert train.num_utts + cv.num_utts == d.num_utts
    assert cv.num_utts == 3
    # deterministic
    train2, cv2 = d2.train_cv_split(0.25, seed=1)
    assert train.utts == train2.utts


def test_filter_min_frames():
    d = make_dir()
    frames = {u: 100 + 50 * i for i, u in enumerate(d.utts)}
    d.tables["utt2num_frames"] = {u: str(n) for u, n in frames.items()}
    out = d.filter_min_frames(200)
    # exact retention: >= is inclusive (the 200-frame boundary utt stays),
    # and nothing above the threshold is over-filtered
    assert sorted(out.utts) == sorted(u for u, n in frames.items() if n >= 200)
    assert out.num_utts == 10
    assert out.validate() == []


def test_segments_dir_validates_and_fixes():
    """With a segments file, wav.scp is RECORDING-keyed (Kaldi semantics):
    validate must not demand utterance-key equality, and fix must keep
    recordings referenced by surviving segments."""
    dd = DataDir({
        "wav.scp": {"rec1": "/w/rec1.wav", "rec2": "/w/rec2.wav"},
        "utt2spk": {"u1": "s1", "u2": "s1", "u3": "s2"},
        "segments": {"u1": "rec1 0.0 2.0", "u2": "rec1 2.0 4.0",
                     "u3": "rec2 0.0 3.0"},
    }).make_spk2utt()
    assert dd.validate() == []
    # a missing recording IS a problem
    bad = DataDir({**{k: dict(v) for k, v in dd.tables.items()},
                   "wav.scp": {"rec1": "/w/rec1.wav"}})
    assert any("recordings" in p for p in bad.validate())
    # fix drops u3 (say utt2spk lost it) and then rec2 is unreferenced
    t = {k: dict(v) for k, v in dd.tables.items()}
    del t["utt2spk"]["u3"]
    fixed = DataDir(t).fix()
    assert sorted(fixed.utts) == ["u1", "u2"]
    assert sorted(fixed["wav.scp"]) == ["rec1"]


def test_subset_zero_last_is_empty():
    d = make_dir()
    assert d.subset(0, first=False).num_utts == 0
    assert d.subset(0, first=True).num_utts == 0
    assert d.subset(2, first=False).num_utts == 2
