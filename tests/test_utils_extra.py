"""Tests for the job runner, presets, enrollment tools, and diagnostics."""

import os

import numpy as np
import pytest

from pkr_tpu.eval.visualize import embedding_stats, pca_project, tsne_project
from pkr_tpu.recipes.enroll import format_utts, split_enroll_test
from pkr_tpu.recipes.presets import PRESETS
from pkr_tpu.utils.jobs import JobError, run_jobs


def test_run_jobs_success_and_logs(tmp_path):
    results = run_jobs(lambda x: x * x, [1, 2, 3, 4], n_jobs=2,
                       log_dir=str(tmp_path), name="sq")
    assert results == [1, 4, 9, 16]
    logs = sorted(os.listdir(tmp_path))
    assert logs == ["sq.1.log", "sq.2.log", "sq.3.log", "sq.4.log"]
    assert "finished" in open(tmp_path / "sq.1.log").read()


def _maybe_fail(x):
    if x == 3:
        raise ValueError("boom")
    return x


def test_run_jobs_fail_if_any_fail(tmp_path):
    with pytest.raises(JobError) as ei:
        run_jobs(_maybe_fail, [1, 2, 3, 4], n_jobs=2, log_dir=str(tmp_path))
    assert ei.value.failures == [3]
    assert "boom" in open(tmp_path / "job.3.log").read()


def test_run_jobs_retries(tmp_path):
    marker = tmp_path / "count"
    marker.write_text("0")

    def flaky(x):
        n = int(marker.read_text())
        marker.write_text(str(n + 1))
        if n == 0:
            raise RuntimeError("transient")
        return x

    # n_jobs=1 so the shared marker works in-process
    assert run_jobs(flaky, [7], n_jobs=1, retries=1) == [7]


def test_presets_build():
    for name, make in PRESETS.items():
        cfg = make()
        assert cfg.train.epochs > 0
    assert PRESETS["aam_v2"]().model.loss == "AAM"
    assert PRESETS["aam_v2"]().model.margin == 0.2
    assert PRESETS["softmax_plda"]().eval.backend == "plda"
    assert PRESETS["aam_dataset2"]().train.dataset == "v2"


def test_format_utts_and_split():
    entries = [(f"/wav/{s}/{i}.wav", s) for s in ("alice", "bob x", "carol")
               for i in range(5)]
    dd = format_utts(entries)
    assert dd.validate() == []
    assert "bob_x-00000" in dd["utt2spk"]
    enroll, test = split_enroll_test(dd, n_enroll=2, n_test=2, seed=0)
    assert enroll.num_utts == 6 and test.num_utts == 6
    assert not set(enroll.utts) & set(test.utts)
    for d in (enroll, test):
        for spk in d.spks:
            assert sum(1 for s in d["utt2spk"].values() if s == spk) == 2


def test_embedding_stats_and_projections():
    rng = np.random.default_rng(0)
    vecs = {f"u{i}": rng.standard_normal(16).astype(np.float32) for i in range(30)}
    stats = embedding_stats(vecs)
    assert stats["count"] == 30 and stats["dim"] == 16
    assert stats["nan_or_inf"] == 0
    mat = np.stack(list(vecs.values()))
    p = pca_project(mat)
    assert p.shape == (30, 2)
    # PCA first component carries the most variance
    assert p[:, 0].var() >= p[:, 1].var()
    t = tsne_project(mat[:20], n_iter=50)
    assert t.shape == (20, 2) and np.isfinite(t).all()


def test_tsne_separates_clusters():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((15, 8)) * 0.1
    b = rng.standard_normal((15, 8)) * 0.1 + 4.0
    y = tsne_project(np.vstack([a, b]).astype(np.float32), n_iter=150, seed=0)
    # nearest-neighbor purity: most points' 2-D NN is from the same cluster
    d = np.square(y[:, None] - y[None, :]).sum(-1)
    np.fill_diagonal(d, np.inf)
    nn = d.argmin(axis=1)
    labels = np.array([0] * 15 + [1] * 15)
    purity = (labels[nn] == labels).mean()
    assert purity > 0.8, purity


def test_summarize_logs(tmp_path):
    from pkr_tpu.utils.jobs import summarize_logs

    (tmp_path / "a.1.log").write_text("ok\nWARNING: x\nWARNING: y\n")
    (tmp_path / "a.2.log").write_text("Traceback (most recent call last):\nERROR boom\n")
    counts = summarize_logs(str(tmp_path))
    assert counts == {"WARNING": 2, "ERROR": 1, "Traceback": 1}


def test_wav_roundtrip_and_pipe(tmp_path):
    from pkr_tpu.io.wav import read_wav, write_wav

    sig = (np.sin(np.arange(4000) / 10) * 5000).astype(np.float32)
    p = tmp_path / "x.wav"
    write_wav(str(p), sig, 16000)
    wav, rate = read_wav(str(p))
    assert rate == 16000
    np.testing.assert_allclose(wav, sig, atol=1.0)  # int16 truncation
    # command-pipe entry (the VoxCeleb2 ffmpeg idiom)
    wav2, _ = read_wav(f"cat {p} |")
    np.testing.assert_array_equal(wav, wav2)
    # segments-style cut
    cut, _ = read_wav(str(p), start=0.05, end=0.1)
    assert len(cut) == 800
    np.testing.assert_array_equal(cut, wav[800:1600])


def test_prep_cli(tmp_path):
    from pkr_tpu.recipes.prep import main as prep_main

    # build fake voxceleb1 tree
    for spk in ("id1", "id2"):
        d = tmp_path / "corpus" / "dev" / "wav" / spk / "rec1"
        d.mkdir(parents=True)
        (d / "00001.wav").write_bytes(b"")
    rc = prep_main(["voxceleb1", str(tmp_path / "corpus"), "dev",
                    str(tmp_path / "data")])
    assert rc == 0
    assert (tmp_path / "data" / "wav.scp").exists()
    rc = prep_main(["augment", str(tmp_path / "data"),
                    str(tmp_path / "data_aug"), "--speed"])
    assert rc == 0
    from pkr_tpu.io import DataDir

    aug = DataDir.load(str(tmp_path / "data_aug"))
    assert aug.num_utts == 2 * 2 * 3  # clean+aug, x3 speed copies
    assert aug.validate() == []


def test_plot_embeddings_writes_png(tmp_path):
    from pkr_tpu.eval.visualize import plot_embeddings

    rng = np.random.default_rng(2)
    vecs, utt2spk = {}, {}
    for s in range(4):
        c = rng.standard_normal(16) * 3
        for j in range(8):
            u = f"s{s}-u{j}"
            vecs[u] = (c + rng.standard_normal(16) * 0.3).astype(np.float32)
            utt2spk[u] = f"s{s}"
    out = plot_embeddings(vecs, utt2spk, str(tmp_path / "emb.png"), method="pca")
    if out is None:  # matplotlib genuinely unavailable
        import pytest

        pytest.skip("matplotlib unavailable")
    assert os.path.getsize(out) > 5000  # a real PNG, not an empty file


def _square(x):  # module-level: picklable for the process backend
    return x * x


def test_run_jobs_process_backend(tmp_path):
    from pkr_tpu.utils.jobs import run_jobs

    assert run_jobs(_square, [1, 2, 3], n_jobs=2, backend="process",
                    log_dir=str(tmp_path)) == [1, 4, 9]
