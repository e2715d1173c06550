"""Round-trip and format tests for the Kaldi ark/scp codecs, including the
CompressedMatrix ('CM ') encoder/decoder pair.

The reference has no tests (SURVEY.md §4); these define the contract. The CM
decoder must agree with the reference decoder (kaldi_io.py:427-460) on
arbitrary CM bytes, which we check by encoding with ours and decoding with a
NumPy transcription of the dequantization rules.
"""

import io as _io
import numpy as np
import pytest

from pkr_tpu.io import kaldi_ark as ka


def test_vec_int_roundtrip(tmp_path):
    v = np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.int32)
    p = tmp_path / "v.ark"
    ka.write_vec_int(str(p), v, key="utt1")
    items = list(ka.read_vec_int_ark(str(p)))
    assert len(items) == 1
    key, got = items[0]
    assert key == "utt1"
    np.testing.assert_array_equal(got, v)


def test_vec_flt_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    v32 = rng.standard_normal(17).astype(np.float32)
    v64 = rng.standard_normal(5).astype(np.float64)
    p = tmp_path / "v.ark"
    with open(p, "wb") as f:
        ka.write_vec_flt(f, v32, key="a")
        ka.write_vec_flt(f, v64, key="b")
    d = dict(ka.read_vec_flt_ark(str(p)))
    np.testing.assert_array_equal(d["a"], v32)
    np.testing.assert_array_equal(d["b"], v64)


def test_mat_roundtrip_binary(tmp_path):
    rng = np.random.default_rng(1)
    m = rng.standard_normal((31, 40)).astype(np.float32)
    p = tmp_path / "m.ark"
    ka.write_mat(str(p), m, key="u1")
    d = dict(ka.read_mat_ark(str(p)))
    np.testing.assert_array_equal(d["u1"], m)


def test_mat_ascii_read(tmp_path):
    p = tmp_path / "m.txt"
    with open(p, "wb") as f:
        f.write(b"u1  [\n  1 2 3\n  4 5 6 ]\n")
    fd = open(p, "rb")
    key = ka.read_key(fd)
    m = ka.read_mat(fd)
    assert key == "u1"
    np.testing.assert_array_equal(m, np.array([[1, 2, 3], [4, 5, 6]], np.float32))


def test_compressed_roundtrip_error_bound():
    """CM is lossy uint8 quantization; round-trip error must stay within the
    per-column quantization step of the 3-piece linear map."""
    rng = np.random.default_rng(2)
    # realistic log-mel stats: per-column offsets, ~N(15, 3)
    m = (rng.standard_normal((311, 40)) * 3 + 15 + np.arange(40) * 0.1).astype(np.float32)
    blob = ka.compress_matrix(m)
    got = ka.decompress_matrix(_io.BytesIO(blob[3:]), b"CM ")
    assert got.shape == m.shape
    # quantization steps differ per segment; bound by range/63 of each column
    col_range = m.max(axis=0) - m.min(axis=0)
    bound = col_range / 63.0 + 1e-3
    err = np.abs(got - m).max(axis=0)
    assert (err <= bound).all(), (err, bound)


def test_compressed_matches_reference_decoder():
    """Decode our CM bytes with an independent transcription of the reference
    decoder's arithmetic (kaldi_io.py:444-460) and compare bit-for-bit."""
    rng = np.random.default_rng(3)
    m = (rng.standard_normal((57, 13)) * 2 + 5).astype(np.float32)
    blob = ka.compress_matrix(m)

    import struct as _struct

    fd = _io.BytesIO(blob[3:])
    gmin, grange, rows, cols = _struct.unpack("<ffii", fd.read(16))
    headers = np.frombuffer(fd.read(8 * cols), dtype="<u2").reshape(cols, 4)
    pct = np.float32(gmin) + np.float32(grange) * np.float32(1.52590218966964e-05) * headers.astype(np.float32)
    data = np.frombuffer(fd.read(rows * cols), dtype=np.uint8).reshape(cols, rows)
    p0, p25, p75, p100 = (pct[:, i].reshape(-1, 1) for i in range(4))
    mask_low = data <= 64
    mask_high = data > 192
    mask_mid = ~(mask_low | mask_high)
    ref = np.zeros((cols, rows), np.float32)
    ref += (p0 + (p25 - p0) / 64.0 * data) * mask_low
    ref += (p25 + (p75 - p25) / 128.0 * (data - 64)) * mask_mid
    ref += (p75 + (p100 - p75) / 63.0 * (data - 192)) * mask_high
    ref = ref.T

    ours = ka.decompress_matrix(_io.BytesIO(blob[3:]), b"CM ")
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-5)


def test_ark_scp_writer_random_access(tmp_path):
    rng = np.random.default_rng(4)
    mats = {f"utt{i}": rng.standard_normal((10 + i, 8)).astype(np.float32) for i in range(5)}
    ark = tmp_path / "f.ark"
    scp = tmp_path / "f.scp"
    with ka.write_ark_scp(str(ark), str(scp)) as w:
        for k, v in mats.items():
            w.write(k, v)
    # sequential ark read
    d = dict(ka.read_mat_ark(str(ark)))
    for k, v in mats.items():
        np.testing.assert_array_equal(d[k], v)
    # random access through scp offsets
    for k, v in ka.read_mat_scp(str(scp)):
        np.testing.assert_array_equal(v, mats[k])
    # out-of-order single reads via rxspecifier
    lines = dict(l.split(None, 1) for l in scp.read_text().strip().split("\n"))
    got = ka.read_mat(lines["utt3"].strip())
    np.testing.assert_array_equal(got, mats["utt3"])


def test_compressed_ark_scp(tmp_path):
    rng = np.random.default_rng(5)
    m = (rng.standard_normal((211, 40)) + 10).astype(np.float32)
    ark = tmp_path / "c.ark"
    scp = tmp_path / "c.scp"
    with ka.write_ark_scp(str(ark), str(scp), compress=True) as w:
        w.write("u", m)
    (k, got), = list(ka.read_mat_scp(str(scp)))
    assert k == "u"
    assert np.abs(got - m).max() < (m.max() - m.min()) / 50


def test_text_vec_ark(tmp_path):
    vecs = {"spk1-utt1": np.arange(4, dtype=np.float32), "x": np.array([1.5, -2.25], np.float32)}
    p = tmp_path / "emb.txt"
    ka.write_text_vec_ark(str(p), vecs)
    got = ka.load_text_vec_ark(str(p))
    assert set(got) == set(vecs)
    for k in vecs:
        np.testing.assert_allclose(got[k], vecs[k])


def test_pipe_reader(tmp_path):
    m = np.ones((3, 4), dtype=np.float32)
    p = tmp_path / "m.ark"
    ka.write_mat(str(p), m, key="u1")
    d = dict(ka.read_mat_ark(f"cat {p} |"))
    np.testing.assert_array_equal(d["u1"], m)


def test_pipe_failure_raises(tmp_path):
    """A failed pipe command must raise, not masquerade as an empty (or
    truncated) archive; early-abandoned pipes (SIGPIPE) stay silent."""
    import pytest

    with pytest.raises(IOError, match="pipe command failed"):
        dict(ka.read_mat_ark(f"cat {tmp_path}/does_not_exist.ark |"))
    with pytest.raises(IOError, match="pipe command failed"):
        fd = ka.open_or_fd("| exit 3", mode="wb")
        fd.write(b"x")
        fd.close()
    # legitimate early stop: consume one entry of a two-entry piped ark
    m = np.ones((3, 4), dtype=np.float32)
    p = tmp_path / "two.ark"
    with ka.ArkScpWriter(str(p)) as w:
        w.write("u1", m)
        w.write("u2", m)
    it = ka.read_mat_ark(f"cat {p} |")
    next(it)
    it.close()  # no IOError


def test_gzip_scp(tmp_path):
    import gzip

    p = tmp_path / "list.scp.gz"
    with gzip.open(p, "wb") as f:
        f.write(b"hello world\n")
    fd = ka.open_or_fd(str(p))
    assert fd.readline() == b"hello world\n"
    fd.close()


def test_posterior_roundtrip(tmp_path):
    post = [[(1, 0.5), (3, 0.25)], [], [(7, 1.0)]]
    p = tmp_path / "p.ark"
    ka.write_post(str(p), post, key="utt1")
    (k, got), = list(ka.read_post_ark(str(p)))
    assert k == "utt1"
    assert len(got) == 3 and got[1] == []
    assert got[0][0][0] == 1 and abs(got[0][0][1] - 0.5) < 1e-7
    assert got[2] == [(7, 1.0)]


def test_segments_to_bool_vec(tmp_path):
    p = tmp_path / "segments"
    p.write_text("utt1 rec1 0.10 0.30\nutt2 rec1 0.50 0.60\n")
    v = ka.read_segments_as_bool_vec(str(p))
    assert len(v) == 60
    assert v[10:30].all() and not v[30:50].any() and v[50:60].all()
    assert not v[:10].any()


def test_pipe_writer(tmp_path):
    out = tmp_path / "piped.ark"
    m = np.full((2, 3), 7.0, np.float32)
    fd = ka.open_or_fd(f"| cat > {out}", "wb")
    ka.write_mat(fd, m, key="u1")
    fd.close()
    d = dict(ka.read_mat_ark(str(out)))
    np.testing.assert_array_equal(d["u1"], m)


def test_cnet_ark_read(tmp_path):
    import struct

    p = tmp_path / "cnet.ark"
    with open(p, "wb") as f:
        f.write(b"utt1 \x00B\x04" + struct.pack("<i", 2))
        # bin 1: time 5, one record (id 3, w 0.5)
        f.write(b"\x04" + struct.pack("<i", 5) + b"\x04" + struct.pack("<i", 1))
        f.write(b"\x04" + struct.pack("<i", 3) + b"\x04" + struct.pack("<f", 0.5))
        # bin 2: time 9, no records
        f.write(b"\x04" + struct.pack("<i", 9) + b"\x04" + struct.pack("<i", 0))
    (k, cnet), = list(ka.read_cnet_ark(str(p)))
    assert k == "utt1"
    assert cnet[0][0] == 5 and cnet[0][1] == [(3, 0.5)]
    assert cnet[1] == (9, [])


@pytest.mark.parametrize("seed", range(4))
def test_compressed_fuzz_roundtrip(seed):
    """Fuzz the CM codec across shapes/scales/distributions; round-trip error
    must stay within each column's quantization step."""
    rng = np.random.default_rng(seed)
    rows = int(rng.integers(1, 400))
    cols = int(rng.integers(1, 64))
    kind = seed % 4
    if kind == 0:
        m = rng.standard_normal((rows, cols)) * rng.uniform(1e-3, 1e4)
    elif kind == 1:
        m = rng.uniform(-1e6, 1e6, (rows, cols))
    elif kind == 2:
        m = np.full((rows, cols), rng.uniform(-5, 5))  # constant
    else:
        m = rng.standard_normal((rows, cols)) * np.logspace(-3, 3, cols)
    m = m.astype(np.float32)
    blob = ka.compress_matrix(m)
    got = ka.decompress_matrix(_io.BytesIO(blob[3:]))
    assert got.shape == m.shape
    col_range = m.max(axis=0) - m.min(axis=0)
    # worst-case step is range/63 within a column plus uint16 header rounding
    bound = col_range / 50 + (m.max() - m.min() + 1) * 4e-5 + 1e-6
    assert (np.abs(got - m).max(axis=0) <= bound).all()
    # native decoder agrees bit-for-bit when available
    from pkr_tpu.io import native
    if native.available():
        import tempfile, os as _os
        d = tempfile.mkdtemp()
        with open(_os.path.join(d, "f.ark"), "wb") as f:
            f.write(b"\x00B" + blob)
        nat = native.read_mat(_os.path.join(d, "f.ark"), 0)
        np.testing.assert_array_equal(nat, got)


def test_text_matrix_roundtrip(tmp_path):
    m = np.array([[1.5, -2.0, 3.25], [0.0, 7.125, -0.5]], np.float32)
    p = tmp_path / "t.ark"
    ka.write_mat(str(p), m, key="u1", text=True)
    d = dict(ka.read_mat_ark(str(p)))
    np.testing.assert_allclose(d["u1"], m, rtol=1e-6)


def test_bare_writes_truncate_keyed_writes_append(tmp_path):
    """A single-object file must not accumulate stale copies across reruns;
    keyed repeated writes build an ark (the append idiom)."""
    p = str(tmp_path / "m.mat")
    m1 = np.ones((2, 3), np.float32)
    m2 = np.full((2, 3), 7.0, np.float32)
    ka.write_mat(p, m1)
    ka.write_mat(p, m2)  # rerun: must REPLACE, not append
    np.testing.assert_array_equal(ka.read_mat(p), m2)
    a = str(tmp_path / "a.ark")
    ka.write_mat(a, m1, key="u1")
    ka.write_mat(a, m2, key="u2")
    got = dict(ka.read_mat_ark(a))
    np.testing.assert_array_equal(got["u1"], m1)
    np.testing.assert_array_equal(got["u2"], m2)


def test_load_text_vec_ark_merges_process_shards(tmp_path):
    """A missing base path with '<path>.0/.1' shards (multi-host extraction
    output) loads the union transparently."""
    a = {"u1": np.arange(3, dtype=np.float32)}
    b = {"u2": np.arange(3, 6, dtype=np.float32)}
    base = str(tmp_path / "emb.iv")
    ka.write_text_vec_ark(base + ".0", a)
    ka.write_text_vec_ark(base + ".1", b)
    got = ka.load_text_vec_ark(base)
    assert set(got) == {"u1", "u2"}
    np.testing.assert_array_equal(got["u2"], b["u2"])


def test_compress_auto_method_matches_kaldi(tmp_path):
    """kAutomaticMethod parity: copy-feats --compress picks format 2 for
    <=8-row matrices, format 1 otherwise — the writer must do the same so
    foreign Kaldi readers see familiar bytes."""
    rng = np.random.default_rng(50)
    short = rng.standard_normal((6, 10)).astype(np.float32)
    tall = rng.standard_normal((40, 10)).astype(np.float32)
    assert ka.compress_matrix(short)[:4] == b"CM2 "
    assert ka.compress_matrix(tall)[:3] == b"CM "
    # both round-trip through the standard path
    p = tmp_path / "auto.ark"
    with ka.write_ark_scp(str(p), str(tmp_path / "auto.scp"),
                                 compress=True) as w:
        w.write("short", short)
        w.write("tall", tall)
    got = {k: m for k, m in ka.read_mat_ark(str(p))}
    assert got["short"].shape == short.shape
    np.testing.assert_allclose(got["short"], short,
                               atol=1.1 * np.ptp(short) / 65535)
    np.testing.assert_allclose(got["tall"], tall, atol=0.03 * np.ptp(tall))


def test_read_mat_codes_roundtrip(tmp_path):
    """Quantized-transport read: dequantizing the raw codes reproduces
    read_mat BIT-identically (same 3-piece f32 formula), and non-CM1
    entries return None."""
    from pkr_tpu.io.kaldi_ark import (read_mat, read_mat_codes, write_mat,
                                      write_ark_scp, _chars_to_floats)

    rng = np.random.default_rng(5)
    ark, scp = str(tmp_path / "c.ark"), str(tmp_path / "c.scp")
    with write_ark_scp(ark, scp, compress=True) as w:
        w.write("a", rng.standard_normal((57, 12)).astype(np.float32))
        w.write("b", (rng.standard_normal((200, 12)) * 40).astype(np.float32))
    for _, rx in (ln.split(None, 1) for ln in open(scp).read().splitlines()):
        codes, pct = read_mat_codes(rx)
        assert codes.dtype == np.uint8 and pct.shape == (4, codes.shape[1])
        dec = _chars_to_floats(codes.T, pct.T)  # (cols, rows)
        np.testing.assert_array_equal(dec.T, read_mat(rx))
    # and the DEVICE formula agrees with the host formula bit-for-bit
    import jax.numpy as jnp
    from pkr_tpu.data.device_cache import dequantize

    codes, pct = read_mat_codes(rx)
    dev = np.asarray(dequantize(jnp.asarray(codes), jnp.asarray(pct)))
    np.testing.assert_array_equal(dev, read_mat(rx))

    # uncompressed FM entry → None
    fm = str(tmp_path / "f.ark")
    write_mat(fm, rng.standard_normal((9, 4)).astype(np.float32), key="x")
    off = fm + ":" + str(len("x") + 1)
    assert read_mat_codes(off) is None
    # CM2 (short matrix under automatic method) → None
    cm2 = str(tmp_path / "s.ark")
    write_mat(cm2, rng.standard_normal((4, 4)).astype(np.float32),
              key="y", compress=True)
    assert read_mat_codes(cm2 + ":" + str(len("y") + 1)) is None


def test_compress_non_finite_is_deterministic_and_warning_free():
    """Non-finite input takes the python codec (the native encoder refuses
    it with rc=-6, tests/test_native.py): the degradation contract is NaN →
    finite min, ±inf → clamped to the finite max/min, computed warning-free
    — not NaN-poisoned headers with platform-defined float→uint casts."""
    import warnings

    rng = np.random.default_rng(7)
    m = rng.standard_normal((60, 8)).astype(np.float32)
    m[17, 3] = np.nan
    m[2, 1] = np.inf
    m[9, 0] = -np.inf
    fin = m[np.isfinite(m)]
    lo, hi = float(fin.min()), float(fin.max())
    step = (hi - lo) / 50 + 1e-3
    for method, tok in ((1, b"CM "), (2, b"CM2"), (3, b"CM3")):
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            blob = ka.compress_matrix(m, method=method)
            assert blob == ka.compress_matrix(m, method=method)
        got = ka.decompress_matrix(_io.BytesIO(blob[3:]), tok)
        assert np.isfinite(got).all()
        assert got.min() >= lo - step and got.max() <= hi + step
        if method in (2, 3):  # global linear map: per-element check
            assert abs(got[17, 3] - lo) <= step
            assert abs(got[2, 1] - hi) <= step
            assert abs(got[9, 0] - lo) <= step
