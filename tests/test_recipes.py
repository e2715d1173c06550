"""Manifest builders, trial tools, and config round trip."""

import os

import numpy as np
import pytest

from pkr_tpu.config import Config, ModelConfig, TrainConfig
from pkr_tpu.io.datadir import DataDir
from pkr_tpu.recipes.voxceleb import (convert_voxceleb1_trials, make_musan,
                                      make_trials, make_voxceleb1,
                                      make_voxceleb2, path_to_utt,
                                      write_trials)


def fake_voxceleb(root, ext="wav", subdir="wav", n_spk=2, n_rec=2, n_utt=2):
    for i in range(n_spk):
        for r in range(n_rec):
            d = root / "dev" / subdir / f"id{i:05d}" / f"rec{r}"
            d.mkdir(parents=True)
            for u in range(n_utt):
                (d / f"{u:05d}.{ext}").write_bytes(b"")


def test_make_voxceleb1(tmp_path):
    fake_voxceleb(tmp_path)
    dd = make_voxceleb1(str(tmp_path), "dev")
    assert dd.num_utts == 8
    assert dd.validate() == []
    assert "id00000-rec0-00000" in dd["wav.scp"]
    assert dd["utt2spk"]["id00001-rec1-00001"] == "id00001"


def test_make_voxceleb2_ffmpeg_pipes(tmp_path):
    fake_voxceleb(tmp_path, ext="m4a", subdir="aac")
    dd = make_voxceleb2(str(tmp_path), "dev")
    assert dd.num_utts == 8
    entry = dd["wav.scp"]["id00000-rec0-00000"]
    assert entry.startswith("ffmpeg") and entry.endswith("-|")


def test_trials_conversion(tmp_path):
    src = tmp_path / "veri_test.txt"
    src.write_text("1 id1/rec1/00001.wav id1/rec2/00002.wav\n"
                   "0 id1/rec1/00001.wav id2/rec9/00003.wav\n")
    out = tmp_path / "trials"
    n = convert_voxceleb1_trials(str(src), str(out))
    assert n == 2
    lines = out.read_text().strip().split("\n")
    assert lines[0] == "id1-rec1-00001 id1-rec2-00002 target"
    assert lines[1] == "id1-rec1-00001 id2-rec9-00003 nontarget"
    assert path_to_utt("a/b/c/d.wav") == "b-c-d"


def test_voxceleb1_trials_one_shot(tmp_path):
    """feature_pre.sh:61-73 as one prep subcommand: three trial lists
    converted, wavlist union built, the data dir filtered + fixed to it."""
    from pkr_tpu.io import DataDir
    from pkr_tpu.recipes.prep import main as prep_main

    # combined VoxCeleb1 dir with one utt NO list references (u_extra)
    utts = {f"id{i}-rec0-{j:05d}": f"id{i}"
            for i in range(3) for j in range(2)}
    utts["id9-rec0-99999"] = "id9"  # extra: must be filtered out
    dd = DataDir({"utt2spk": utts,
                  "wav.scp": {u: f"/wav/{u}.wav" for u in utts}})
    dd.make_spk2utt().save(str(tmp_path / "test"))

    (tmp_path / "clean.txt").write_text(
        "1 id0/rec0/00000.wav id0/rec0/00001.wav\n"
        "0 id0/rec0/00000.wav id1/rec0/00000.wav\n")
    (tmp_path / "ext.txt").write_text(
        "0 id1/rec0/00001.wav id2/rec0/00000.wav\n")
    (tmp_path / "hard.txt").write_text(
        "1 id2/rec0/00000.wav id2/rec0/00001.wav\n")
    rc = prep_main(["voxceleb1-trials", str(tmp_path / "test"),
                    "--clean", str(tmp_path / "clean.txt"),
                    "--extended", str(tmp_path / "ext.txt"),
                    "--hard", str(tmp_path / "hard.txt")])
    assert rc == 0
    out = DataDir.load(str(tmp_path / "test"))
    # the union of utts named by any list — and nothing else
    assert sorted(out["utt2spk"]) == [
        "id0-rec0-00000", "id0-rec0-00001", "id1-rec0-00000",
        "id1-rec0-00001", "id2-rec0-00000", "id2-rec0-00001"]
    assert (tmp_path / "test" / "utt2spk.bak").exists()
    wavlist = (tmp_path / "test" / "wavlist").read_text().splitlines()
    assert wavlist == sorted(out["utt2spk"])
    for name, n in (("trials_o", 2), ("trials_e", 1), ("trials_h", 1)):
        lines = (tmp_path / "test" / name).read_text().splitlines()
        assert len(lines) == n and lines[0].split()[2] in ("target",
                                                           "nontarget")


def test_voxceleb1_trials_rerun_keeps_original_backup(tmp_path):
    """Re-running must not clobber utt2spk.bak (the pre-filter map) with
    the already-filtered table."""
    from pkr_tpu.io import DataDir
    from pkr_tpu.recipes.voxceleb import prepare_voxceleb1_trials

    utts = {f"id{i}-rec0-0000{j}": f"id{i}"
            for i in range(2) for j in range(2)}
    DataDir({"utt2spk": utts,
             "wav.scp": {u: f"/w/{u}.wav" for u in utts}}
            ).make_spk2utt().save(str(tmp_path))
    lst = tmp_path / "clean.txt"
    lst.write_text("1 id0/rec0/00000.wav id0/rec0/00001.wav\n")
    prepare_voxceleb1_trials(str(tmp_path), clean=str(lst))
    bak_first = (tmp_path / "utt2spk.bak").read_text()
    assert len(bak_first.splitlines()) == 4  # the full pre-filter map
    prepare_voxceleb1_trials(str(tmp_path), clean=str(lst))
    assert (tmp_path / "utt2spk.bak").read_text() == bak_first


def test_voxceleb1_trials_requires_a_list(tmp_path):
    import pytest

    from pkr_tpu.recipes.voxceleb import prepare_voxceleb1_trials

    with pytest.raises(ValueError):
        prepare_voxceleb1_trials(str(tmp_path))


def test_make_musan_vocal_filtering(tmp_path):
    d = tmp_path / "music" / "fma"
    d.mkdir(parents=True)
    (d / "music-fma-0001.wav").write_bytes(b"")
    (d / "music-fma-0002.wav").write_bytes(b"")
    (d / "ANNOTATIONS").write_text("music-fma-0001 someone Y beat\n"
                                   "music-fma-0002 someone N beat\n")
    n = tmp_path / "noise" / "free"
    n.mkdir(parents=True)
    (n / "noise-free-0001.wav").write_bytes(b"")
    dirs = make_musan(str(tmp_path))
    assert set(dirs) == {"music", "noise"}
    assert list(dirs["music"]["wav.scp"]) == ["music-fma-0002"]  # vocals dropped
    assert dirs["noise"].num_utts == 1


def test_make_trials_strategies():
    enroll = DataDir({"utt2spk": {f"s{i}-e": f"s{i}" for i in range(3)}}).make_spk2utt()
    test = DataDir({"utt2spk": {f"s{i}-t{j}": f"s{i}"
                                for i in range(3) for j in range(2)}})
    rude = make_trials(enroll, test, "rude")
    assert len(rude) == 3 * 6
    n_target = sum(1 for _, _, t in rude if t == "target")
    assert n_target == 6
    bal = make_trials(enroll, test, "balance", seed=1)
    assert len(bal) == 12  # each target paired with one extra draw
    music = DataDir({"utt2spk": {f"m{j}": f"m{j}" for j in range(5)}})
    part = make_trials(enroll, test, "part", music=music, seed=1)
    targets = [x for x in part if x[2] == "target"]
    assert len(targets) == 6
    assert all(x[1].startswith("m") for x in part if x[2] == "nontarget")


def test_config_json_roundtrip(tmp_path):
    cfg = Config(model=ModelConfig(loss="AAM", trunk="se_resnet34"),
                 train=TrainConfig(epochs=5, chunk_size=(200, 400)))
    text = cfg.to_json()
    back = Config.from_json(text)
    assert back.model.loss == "AAM"
    assert back.model.trunk == "se_resnet34"
    assert back.train.epochs == 5
    assert back.train.chunk_size == (200, 400)
    assert back.frontend.fbank.num_mel_bins == 40


def test_run_score_backends(tmp_path):
    """plda / snorm / pool / cosine backends through the driver's scorer."""
    from pkr_tpu.config import Config, EvalConfig
    from pkr_tpu.io import write_text_vec_ark
    from pkr_tpu.recipes.run import run_score

    rng = np.random.default_rng(0)
    d = 16
    spk_means = rng.standard_normal((6, d)) * 3
    cohort, cohort_u2s = {}, {}
    for i in range(6):
        for j in range(8):
            cohort[f"s{i}-c{j}"] = (spk_means[i] + rng.standard_normal(d)).astype(np.float32)
            cohort_u2s[f"s{i}-c{j}"] = f"s{i}"
    enroll = {f"s{i}": (spk_means[i] + rng.standard_normal(d)).astype(np.float32)
              for i in range(6)}
    test = {f"s{i}-t": (spk_means[i] + rng.standard_normal(d)).astype(np.float32)
            for i in range(6)}
    trials = tmp_path / "trials"
    with open(trials, "w") as f:
        for e in enroll:
            for t in test:
                tgt = "target" if t.startswith(e + "-") else "nontarget"
                f.write(f"{e} {t} {tgt}\n")
    write_text_vec_ark(str(tmp_path / "enroll.iv"), enroll)
    write_text_vec_ark(str(tmp_path / "test.iv"), test)
    write_text_vec_ark(str(tmp_path / "cohort.iv"), cohort)

    for backend in ("cosine", "snorm", "plda"):
        cfg = Config(eval=EvalConfig(backend=backend, topk=10, lda_dim=8))
        res = run_score(cfg, str(tmp_path), str(trials),
                        str(tmp_path / "enroll.iv"), str(tmp_path / "test.iv"),
                        cohort_ark=str(tmp_path / "cohort.iv"),
                        cohort_utt2spk=cohort_u2s)
        assert res["eer"] < 0.35, (backend, res)

    # pool backend: enroll ark holds utterances, spk2utt pools them
    enroll_utts = {f"s{i}-e{j}": (spk_means[i] + rng.standard_normal(d)).astype(np.float32)
                   for i in range(6) for j in range(2)}
    write_text_vec_ark(str(tmp_path / "enroll_utts.iv"), enroll_utts)
    spk2utt = {f"s{i}": [f"s{i}-e0", f"s{i}-e1"] for i in range(6)}
    cfg = Config(eval=EvalConfig(backend="pool"))
    res = run_score(cfg, str(tmp_path), str(trials),
                    str(tmp_path / "enroll_utts.iv"), str(tmp_path / "test.iv"),
                    cohort_ark=str(tmp_path / "cohort.iv"),
                    enroll_spk2utt=spk2utt)
    assert res["eer"] < 0.35, res


def test_augment_and_perturb_data_dirs():
    from pkr_tpu.recipes.augment_dir import (augment_data_dir,
                                             perturb_data_dir_speed)

    dd = DataDir({"utt2spk": {f"u{i}": f"s{i % 2}" for i in range(6)},
                  "wav.scp": {f"u{i}": f"/w/u{i}.wav" for i in range(6)}}).make_spk2utt()
    aug = augment_data_dir(dd, seed=0)
    assert aug.num_utts == 12  # doubled (run.sh:162-164)
    assert aug.validate() == []
    kinds = {aug["utt2aug"][u] for u in aug.utts if "-" in u and u not in dd.utts}
    assert kinds <= {"noise", "music", "babble", "reverb"}
    assert all(aug["utt2aug"][u] == "none" for u in dd.utts)
    # speaker labels follow the copies
    assert aug["utt2spk"]["u0-" + aug["utt2aug"][[u for u in aug.utts if u.startswith("u0-")][0]]] == "s0"

    sp = perturb_data_dir_speed(dd, factors=(0.9, 1.1))
    assert sp.num_utts == 18
    assert sp["utt2speed"]["sp0.9-u0"] == "0.9"
    assert sp["utt2spk"]["sp1.1-u3"] == "sp1.1-s1"
    assert sp.validate() == []


def test_backend_stats_stage(tmp_path):
    from pkr_tpu.config import Config
    from pkr_tpu.io import load_text_vec_ark, read_vec_flt, write_text_vec_ark
    from pkr_tpu.recipes.run import run_backend_stats

    rng = np.random.default_rng(0)
    train = {f"s{i}-u{j}": rng.standard_normal(8).astype(np.float32)
             for i in range(3) for j in range(4)}
    test = {f"t{i}": rng.standard_normal(8).astype(np.float32) for i in range(5)}
    write_text_vec_ark(str(tmp_path / "train.iv"), train)
    write_text_vec_ark(str(tmp_path / "test.iv"), test)
    data_dir = tmp_path / "data"
    DataDir({"utt2spk": {k: k.split("-")[0] for k in train}}).make_spk2utt().save(str(data_dir))

    run_backend_stats(Config(), str(tmp_path), str(data_dir))
    mean = read_vec_flt(str(tmp_path / "mean.vec"))
    np.testing.assert_allclose(mean, np.mean(list(train.values()), axis=0), rtol=1e-5)
    spk = load_text_vec_ark(str(tmp_path / "spk_xvector.iv"))
    assert set(spk) == {"s0", "s1", "s2"}
    stats = dict(l.split(None, 1) for l in open(tmp_path / "topk_mean_std"))
    assert set(stats) == set(test)


def test_compute_utt2dur(tmp_path):
    from pkr_tpu.io.datadir import compute_utt2dur
    from pkr_tpu.io.wav import write_wav

    p = tmp_path / "a.wav"
    write_wav(str(p), np.zeros(8000, np.float32), 16000)
    dd = DataDir({"wav.scp": {"a": str(p)}, "utt2spk": {"a": "s"}})
    out = compute_utt2dur(dd)
    assert abs(float(out["utt2dur"]["a"]) - 0.5) < 1e-3


def test_score_cli(tmp_path):
    from pkr_tpu.io import write_text_vec_ark
    from pkr_tpu.recipes.score import main as score_main

    rng = np.random.default_rng(1)
    means = rng.standard_normal((4, 8)) * 3
    enroll = {f"s{i}": (means[i] + rng.standard_normal(8) * 0.3).astype(np.float32)
              for i in range(4)}
    test = {f"s{i}-t": (means[i] + rng.standard_normal(8) * 0.3).astype(np.float32)
            for i in range(4)}
    write_text_vec_ark(str(tmp_path / "e.iv"), enroll)
    write_text_vec_ark(str(tmp_path / "t.iv"), test)
    with open(tmp_path / "trials", "w") as f:
        for e in enroll:
            for t in test:
                tag = "target" if t.startswith(e + "-") else "nontarget"
                f.write(f"{e} {t} {tag}\n")
    rc = score_main(["--backend", "cosine", "--enroll", str(tmp_path / "e.iv"),
                     "--test", str(tmp_path / "t.iv"),
                     "--trials", str(tmp_path / "trials"),
                     "--out", str(tmp_path / "out")])
    assert rc == 0
    import json as _json

    res = _json.load(open(tmp_path / "out" / "results.json"))
    assert res["eer"] < 0.2
    assert os.path.exists(tmp_path / "out" / "scores.txt")


def test_make_voxceleb1_old_layout(tmp_path):
    from pkr_tpu.recipes.voxceleb import make_voxceleb1_old_layout

    root = tmp_path / "vox1"
    for spk, n in (("A.J._Buckley", 2), ("Zulay_Henao", 1)):
        d = root / "voxceleb1_wav" / spk
        d.mkdir(parents=True)
        for i in range(n):
            (d / f"1zcIwhmdeo{i}_0000{i}01.wav").write_bytes(b"")
    (root / "voxceleb1_test.txt").write_text(
        "1 Zulay_Henao/1zcIwhmdeo0_0000001.wav Zulay_Henao/1zcIwhmdeo0_0000001.wav\n"
        "0 Zulay_Henao/1zcIwhmdeo0_0000001.wav A.J._Buckley/1zcIwhmdeo1_0000101.wav\n")
    train, test, trials = make_voxceleb1_old_layout(str(root))
    # both speakers appear in trials → both land in the test split
    assert train.num_utts == 0 and test.num_utts == 3
    assert trials[0][2] == "target" and trials[1][2] == "nontarget"
    assert trials[0][0] == "Zulay_Henao-1zcIwhmdeo0-0000001"
    assert test.validate() == []


def test_make_vctk(tmp_path):
    from pkr_tpu.recipes.voxceleb import make_vctk

    for spk in ("p225", "p226"):
        d = tmp_path / "wav48" / spk
        d.mkdir(parents=True)
        (d / f"{spk}_001.wav").write_bytes(b"")
    dd = make_vctk(str(tmp_path))
    assert dd.num_utts == 2
    assert dd["utt2spk"]["p225_001"] == "p225"
    entry = dd["wav.scp"]["p226_001"]
    assert entry.endswith("-|") and "-ar 16000 -ac 1" in entry
    sox = make_vctk(str(tmp_path), resample_cmd="sox")
    assert sox["wav.scp"]["p225_001"].startswith("sox ")


def test_speaker_embeddings_export():
    from pkr_tpu.eval.visualize import speaker_embeddings

    vecs = {f"s{i}-u{j}": np.full(3, i, np.float32) for i in range(2) for j in range(3)}
    u2s = {k: k.split("-")[0] for k in vecs}
    out = speaker_embeddings(vecs, u2s, "s1")
    assert set(out) == {"s1-u0", "s1-u1", "s1-u2"}
    assert all((v == 1).all() for v in out.values())


def test_select_decode_subset_always_writes(tmp_path):
    """feature_pre.sh:244-246 subset semantics + the multi-host contract:
    out_path is ALWAYS (re)written so its content reflects THIS run's
    decision — a stale subset file from a previous run must never leak to
    peers when the current subset is a no-op (advisor r3, run.py:405)."""
    from pkr_tpu.recipes.run import select_decode_subset

    scp = tmp_path / "feats.scp"
    scp.write_text("".join(f"u{i:02d} ark:{i}\n" for i in range(20)))
    out = tmp_path / "decode.scp"

    got = select_decode_subset(str(scp), 8, seed=3, out_path=str(out))
    assert got == str(out)
    lines = out.read_text().splitlines()
    assert len(lines) == 8
    assert set(lines) <= set(scp.read_text().splitlines())
    # seeded determinism
    select_decode_subset(str(scp), 8, seed=3, out_path=str(tmp_path / "b"))
    assert (tmp_path / "b").read_text() == out.read_text()

    # no-op subset (n >= corpus): the stale 8-line file is OVERWRITTEN
    # with the full list, not left behind
    got = select_decode_subset(str(scp), 50, seed=3, out_path=str(out))
    assert got == str(out)
    assert out.read_text().splitlines() == scp.read_text().splitlines()
    got = select_decode_subset(str(scp), 0, seed=3, out_path=str(out))
    assert out.read_text().splitlines() == scp.read_text().splitlines()
