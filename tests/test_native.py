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
