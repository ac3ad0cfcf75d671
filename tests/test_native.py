"""C++ host runtime: oracle join + CSV loader vs numpy/pandas ground truth."""

import os
import tempfile

import numpy as np
import pytest

native = pytest.importorskip("flash_hash_join_tpu.utils.native")

try:
    native.get_lib()
    HAVE_LIB = True
except Exception:
    HAVE_LIB = False

pytestmark = pytest.mark.skipif(not HAVE_LIB, reason="no C++ toolchain")


def test_host_join_count():
    rng = np.random.default_rng(0)
    bk = rng.integers(0, 100_000, 50_000, dtype=np.uint64)
    pk = rng.integers(0, 100_000, 200_000, dtype=np.uint64)
    want = int(np.isin(pk, np.unique(bk)).sum())
    assert native.host_join_count(bk, pk) == want
    assert native.host_join_count(bk, pk, nthreads=1) == want


def test_host_join_count_key_zero_and_max():
    bk = np.array([0, 5, 2**64 - 1], dtype=np.uint64)
    pk = np.array([0, 0, 2**64 - 1, 7], dtype=np.uint64)
    assert native.host_join_count(bk, pk) == 3


def test_host_join_materialize():
    rng = np.random.default_rng(1)
    bk = np.unique(rng.integers(0, 10_000, 5_000, dtype=np.uint64))
    bv = rng.integers(0, 2**64, len(bk), dtype=np.uint64)
    pk = rng.integers(0, 10_000, 20_000, dtype=np.uint64)
    ok, ov = native.host_join_materialize(bk, bv, pk)
    mask = np.isin(pk, bk)
    np.testing.assert_array_equal(ok, pk[mask])
    lut = dict(zip(bk.tolist(), bv.tolist()))
    np.testing.assert_array_equal(ov, np.array([lut[k] for k in ok.tolist()],
                                               dtype=np.uint64))


def test_csv_loader():
    rng = np.random.default_rng(2)
    n = 10_000
    a = rng.integers(0, 2**63, n, dtype=np.uint64)
    b = rng.integers(0, 1000, n, dtype=np.uint64)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.csv")
        with open(path, "w") as f:
            f.write("id1,v2\n")
            for x, y in zip(a, b):
                f.write(f"{x},{y}\n")
        np.testing.assert_array_equal(native.load_csv_u64(path, 0, n), a)
        np.testing.assert_array_equal(native.load_csv_u64(path, 1, n), b)


def test_csv_loader_no_trailing_newline_and_errors():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.csv")
        with open(path, "w") as f:
            f.write("k,v\n1,2\n3,4")  # no trailing newline
        np.testing.assert_array_equal(native.load_csv_u64(path, 0, 10), [1, 3])
        np.testing.assert_array_equal(native.load_csv_u64(path, 1, 10), [2, 4])
        with pytest.raises(FileNotFoundError):
            native.load_csv_u64(os.path.join(d, "missing.csv"), 0, 10)
        bad = os.path.join(d, "bad.csv")
        with open(bad, "w") as f:
            f.write("k,v\nx,2\n")
        with pytest.raises(ValueError):
            native.load_csv_u64(bad, 0, 10)


def _write_csv(text):
    f = tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False)
    f.write(text)
    f.close()
    return f.name


def test_csv_loader_quoted_and_spaces():
    path = _write_csv('a,b\n"1",2\n 3 ,4\n"5" ,6\n')
    try:
        got = native.load_csv_u64(path, 0)
        np.testing.assert_array_equal(got, np.array([1, 3, 5], np.uint64))
    finally:
        os.unlink(path)


def test_csv_loader_rejects_nonnumeric():
    path = _write_csv("a,b\nx1,2\n3,4\n")
    try:
        with pytest.raises(ValueError):
            native.load_csv_u64(path, 0)
    finally:
        os.unlink(path)


def test_csv_loader_rejects_missing_column():
    path = _write_csv("a,b,c\n1,2,3\n4,5\n")
    try:
        with pytest.raises(ValueError):
            native.load_csv_u64(path, 2)
    finally:
        os.unlink(path)


def test_csv_loader_last_column_no_trailing_newline():
    path = _write_csv("a,b\n1,2\n3,4")
    try:
        got = native.load_csv_u64(path, 1)
        np.testing.assert_array_equal(got, np.array([2, 4], np.uint64))
    finally:
        os.unlink(path)
