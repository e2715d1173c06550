"""Scoring + metric parity tests.

The EER/minDCF oracle below is a literal python-loop transcription of the
reference algorithms (compute_eer.py:35-104, compute_min_dcf.py:54-106);
agreement must be bit-for-bit (BASELINE.json)."""

from operator import itemgetter

import numpy as np
import pytest

from pkr_tpu.eval.metrics import compute_eer, compute_error_rates, compute_min_dcf
from pkr_tpu.eval.scoring import (
    adaptive_snorm,
    cohort_topk_stats,
    cosine_scores,
    global_mean,
    pooled_speaker_means,
    read_trials,
    speaker_means,
)


def oracle_error_rates(scores, labels):
    sorted_indexes, thresholds = zip(*sorted(enumerate(scores), key=itemgetter(1)))
    labels = [labels[i] for i in sorted_indexes]
    fnrs, fprs = [], []
    for i in range(len(labels)):
        if i == 0:
            fnrs.append(labels[i])
            fprs.append(1 - labels[i])
        else:
            fnrs.append(fnrs[i - 1] + labels[i])
            fprs.append(fprs[i - 1] + 1 - labels[i])
    fnrs_norm = sum(labels)
    fprs_norm = len(labels) - fnrs_norm
    fnrs = [x / float(fnrs_norm) for x in fnrs]
    fprs = [1 - x / float(fprs_norm) for x in fprs]
    return fnrs, fprs, thresholds


def oracle_eer(scores, labels):
    fnrs, fprs, _ = oracle_error_rates(scores, labels)
    i = int(np.nanargmin(np.absolute(np.array(fnrs) - np.array(fprs))))
    return max(fprs[i], fnrs[i])


def oracle_min_dcf(scores, labels, p_target, c_miss=1.0, c_fa=1.0):
    fnrs, fprs, thresholds = oracle_error_rates(scores, labels)
    min_c_det, min_thr = float("inf"), thresholds[0]
    for i in range(len(fnrs)):
        c_det = c_miss * fnrs[i] * p_target + c_fa * fprs[i] * (1 - p_target)
        if c_det < min_c_det:
            min_c_det, min_thr = c_det, thresholds[i]
    c_def = min(c_miss * p_target, c_fa * (1 - p_target))
    return min_c_det / c_def, min_thr


def synth_scores(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    labels = (rng.random(n) < 0.3).astype(int)
    scores = np.where(labels, rng.normal(1.0, 1.0, n), rng.normal(-1.0, 1.0, n))
    return scores.tolist(), labels.tolist()


def test_eer_bit_parity():
    scores, labels = synth_scores()
    assert compute_eer(scores, labels) == oracle_eer(scores, labels)
    # with duplicate scores (stable-sort tie handling)
    scores2 = [round(s, 1) for s in scores]
    assert compute_eer(scores2, labels) == oracle_eer(scores2, labels)


@pytest.mark.parametrize("p", [0.01, 0.001])
def test_min_dcf_bit_parity(p):
    scores, labels = synth_scores(seed=1)
    got, thr = compute_min_dcf(scores, labels, p)
    ref, rthr = oracle_min_dcf(scores, labels, p)
    assert got == ref
    assert thr == rthr


@pytest.mark.parametrize("seed", [0, 3, 9])
def test_eer_min_dcf_match_sklearn_roc(seed):
    """Independent cross-check, no transcription involved: for DISTINCT
    scores our EER and minDCF equal the same functionals computed from
    sklearn's roc_curve (drop_intermediate=False).  Scoped to distinct
    scores on purpose — on ties the reference's per-sample threshold sweep
    (compute_eer.py:35-104) deliberately visits intermediate points inside
    a tie block that a distinct-threshold ROC never produces, and that
    reference convention is the bit-parity target."""
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(seed)
    n = 4000
    labels = (rng.random(n) < 0.3).astype(int)
    scores = rng.standard_normal(n) + 1.5 * labels  # continuous: no ties
    assert len(np.unique(scores)) == n
    fpr, tpr, _ = sklearn.roc_curve(labels, scores, drop_intermediate=False)
    fnr = 1.0 - tpr
    i = int(np.nanargmin(np.abs(fnr - fpr)))
    # atol: sklearn forms fnr as 1-tpr (tps/tps[-1]) vs our cumsum ratio —
    # same value up to the last ulp of a different rounding path
    np.testing.assert_allclose(compute_eer(scores.tolist(), labels.tolist()),
                               max(fpr[i], fnr[i]), rtol=0, atol=1e-12)
    for p in (0.01, 0.05):
        dcf = (fnr * p + fpr * (1.0 - p)) / min(p, 1.0 - p)
        got, _ = compute_min_dcf(scores.tolist(), labels.tolist(), p)
        np.testing.assert_allclose(got, dcf.min(), rtol=0, atol=1e-12)


def test_error_rates_match_oracle():
    scores, labels = synth_scores(300, seed=2)
    fnrs, fprs, thr = compute_error_rates(scores, labels)
    rfnrs, rfprs, rthr = oracle_error_rates(scores, labels)
    np.testing.assert_allclose(fnrs, rfnrs, rtol=0, atol=1e-12)
    np.testing.assert_allclose(fprs, rfprs, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(thr, rthr)


def test_cosine_scores_match_torch_loop():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    enroll = {f"spk{i}": rng.standard_normal(16).astype(np.float32) for i in range(5)}
    test = {f"utt{i}": rng.standard_normal(16).astype(np.float32) for i in range(9)}
    mean = rng.standard_normal(16).astype(np.float32)
    trials = [(f"spk{i % 5}", f"utt{j}") for i in range(5) for j in range(9)]

    ref = []
    for a, b in trials:  # the reference's per-trial loop (cosine_score.py:60-66)
        va = torch.from_numpy(enroll[a] - mean)
        vb = torch.from_numpy(test[b] - mean)
        ref.append(float(F.cosine_similarity(va, vb, dim=0)))
    got = cosine_scores(enroll, test, trials, mean)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_cohort_topk_and_snorm_match_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(4)
    D, C = 8, 50
    vecs = {f"u{i}": rng.standard_normal(D).astype(np.float32) for i in range(6)}
    cohort = rng.standard_normal((C, D)).astype(np.float32)
    mean = rng.standard_normal(D).astype(np.float32)
    k = 10

    got = cohort_topk_stats(vecs, cohort, topk=k, mean=mean)
    norm_mat = F.normalize(torch.from_numpy(cohort - mean), p=2, dim=1)
    for key, v in vecs.items():
        vec = F.normalize(torch.from_numpy(v - mean), p=2, dim=0)
        scores = torch.matmul(norm_mat, vec)
        top, _ = scores.topk(k)
        s, m = torch.std_mean(top)  # unbiased std (compute_topk_mean_std.py:19)
        assert abs(got[key][0] - float(m)) < 1e-5
        assert abs(got[key][1] - float(s)) < 1e-5

    # snorm formula (adaptive_snorm.py:33-34)
    trials = [("u0", "u1"), ("u2", "u3")]
    stats = {key: got[key] for key in vecs}
    raw = np.array([0.5, -0.2])
    sn = adaptive_snorm(raw, trials, stats, stats)
    for i, (a, b) in enumerate(trials):
        exp = ((raw[i] - stats[a][0]) / max(stats[a][1], 1e-8) / 2
               + (raw[i] - stats[b][0]) / max(stats[b][1], 1e-8) / 2)
        assert abs(sn[i] - exp) < 1e-12


def test_means():
    rng = np.random.default_rng(5)
    vecs = {f"s{i}-u{j}": rng.standard_normal(4).astype(np.float32)
            for i in range(3) for j in range(2)}
    gm = global_mean(vecs)
    np.testing.assert_allclose(gm, np.mean(list(vecs.values()), axis=0), rtol=1e-6)
    utt2spk = {k: k.split("-")[0] for k in vecs}
    sm = speaker_means(vecs, utt2spk)
    assert set(sm) == {"s0", "s1", "s2"}
    np.testing.assert_allclose(sm["s1"],
                               (vecs["s1-u0"] + vecs["s1-u1"]) / 2, rtol=1e-6)
    pm = pooled_speaker_means(vecs, {"s0": ["s0-u0", "s0-u1"], "sX": ["nope"]})
    assert "sX" not in pm and "s0" in pm


def test_end_to_end_metric_sanity():
    """Well-separated synthetic speakers → EER 0; random → EER ≈ 0.5."""
    rng = np.random.default_rng(6)
    enroll = {f"spk{i}": np.eye(8)[i].astype(np.float32) for i in range(4)}
    test, trials, labels = {}, [], []
    for i in range(4):
        for j in range(3):
            key = f"u{i}_{j}"
            test[key] = (np.eye(8)[i] + 0.05 * rng.standard_normal(8)).astype(np.float32)
            for s in range(4):
                trials.append((f"spk{s}", key))
                labels.append(1 if s == i else 0)
    scores = cosine_scores(enroll, test, trials)
    assert compute_eer(scores.tolist(), labels) == 0.0


def test_metrics_cli(tmp_path, capsys):
    from pkr_tpu.eval.metrics import _cli

    scores, labels = synth_scores(400, seed=9)
    with open(tmp_path / "scores", "w") as fs, open(tmp_path / "trials", "w") as ft:
        for i, (s, l) in enumerate(zip(scores, labels)):
            fs.write(f"e{i} t{i} {s}\n")
            ft.write(f"e{i} t{i} {'target' if l else 'nontarget'}\n")
    assert _cli([str(tmp_path / "scores"), str(tmp_path / "trials")]) == 0
    out1 = capsys.readouterr().out.strip()
    assert out1.endswith("%")
    assert _cli(["--p-target", "0.01", str(tmp_path / "scores"),
                 str(tmp_path / "trials")]) == 0
    out2 = capsys.readouterr().out.strip()
    # pin the CLI's p_target/c_miss/c_fa plumbing to the library value
    # (a 0..1 range check is tautological for normalized minDCF)
    want, _ = compute_min_dcf(scores, labels, p_target=0.01)
    assert abs(float(out2) - want) < 5e-5  # CLI prints 4 decimals


def test_scoring_at_voxceleb_e_scale():
    """VoxCeleb1-E shape: sparse trials over many utterances must not
    materialize the full cross matrix, and both paths agree."""
    rng = np.random.default_rng(10)
    n_utt, D = 20000, 64  # scaled-down E-shape (sparse: 50k of 400M pairs)
    vecs = {f"u{i}": rng.standard_normal(D).astype(np.float32)
            for i in range(n_utt)}
    pairs = [(f"u{rng.integers(n_utt)}", f"u{rng.integers(n_utt)}")
             for _ in range(50000)]
    import tracemalloc

    # the real guard: the sparse path must not materialize the (20000,
    # 20000) f32 cross matrix (1.6 GB); a wall-clock bound would pass even
    # for a dense regression on a fast BLAS
    tracemalloc.start()
    tracemalloc.reset_peak()
    sparse = cosine_scores(vecs, vecs, pairs)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 300 * 2**20, f"peak allocation {peak/2**20:.0f} MB"
    # agree with the dense matrix path on a small subset
    sub_keys = sorted({k for p in pairs[:200] for k in p})
    sub = {k: vecs[k] for k in sub_keys}
    dense = cosine_scores(sub, sub, pairs[:200])
    np.testing.assert_allclose(sparse[:200], dense, rtol=1e-5, atol=1e-6)
    # chunked cohort stats on a tall input
    cohort = rng.standard_normal((500, D)).astype(np.float32)
    stats = cohort_topk_stats({k: vecs[k] for k in list(vecs)[:3000]},
                              cohort, topk=50)
    assert len(stats) == 3000


def test_read_trials_rejects_partial_labels(tmp_path):
    p = tmp_path / "trials"
    p.write_text("e1 t1 target\ne2 t2\n")
    with pytest.raises(ValueError, match="unlabeled trial"):
        read_trials(str(p))
    # fully unlabeled pairs-only file is fine
    p2 = tmp_path / "pairs"
    p2.write_text("e1 t1\ne2 t2\n")
    pairs, labels = read_trials(str(p2))
    assert pairs == [("e1", "t1"), ("e2", "t2")] and labels == []
