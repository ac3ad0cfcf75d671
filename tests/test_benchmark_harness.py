"""Benchmark-harness unit coverage (benchmark.py, reference C14).

The DuckDB competitor path (reference benchmark.py:262-289) cannot run
live here — the image ships without duckdb — so a minimal fake module
that evaluates the harness's three fixed SQL shapes with pandas stands
in.  It exercises the real integration surface: replacement-scan table
ingest from caller-frame DataFrames, first-occurrence build dedup (the
first-match semantics bridge, SURVEY.md §3), RESULT-row emission, and
the count-parity assertion.
"""

import numpy as np
import pytest

import benchmark as bm


class _FakeCon:
    def __init__(self):
        self.tables = {}
        self._last = None

    def execute(self, sql, frame_locals=None):
        import pandas as pd  # noqa: F401
        s = " ".join(sql.split())
        if s.startswith("PRAGMA"):
            return self
        if s.startswith("CREATE TABLE build_native"):
            self.tables["build"] = self._scan("build_df")
            return self
        if s.startswith("CREATE TABLE probe_native"):
            self.tables["probe"] = self._scan("probe_df")
            return self
        if s.startswith("SELECT count(*) FROM build_native"):
            self._last = (self._join_count(),)
            return self
        if s.startswith("CREATE OR REPLACE TEMPORARY TABLE temp"):
            self.tables["temp_count"] = self._join_count()
            return self
        if s.startswith("SELECT count(*) FROM temp"):
            self._last = (self.tables["temp_count"],)
            return self
        raise AssertionError(f"unexpected SQL: {sql}")

    def _scan(self, name):
        # duckdb resolves bare table names against caller-frame locals
        # (replacement scans); the fake walks the stack the same way
        import inspect
        for fr in inspect.stack():
            if name in fr.frame.f_locals:
                return fr.frame.f_locals[name].copy()
        raise AssertionError(f"{name} not in any caller frame")

    def _join_count(self):
        b, p = self.tables["build"], self.tables["probe"]
        return int(p.merge(b, on="key", how="inner").shape[0])

    def fetchone(self):
        return self._last

    def close(self):
        pass


class _FakeDuckdb:
    @staticmethod
    def connect(database=":memory:"):
        return _FakeCon()


def test_duckdb_competitor_rows_and_parity():
    rng = np.random.default_rng(3)
    bk = rng.integers(0, 5_000, 4_000).astype(np.uint64)  # has duplicates
    bv = rng.integers(0, 100, 4_000).astype(np.uint64)
    pk = rng.integers(0, 6_000, 20_000).astype(np.uint64)
    expected = int(np.isin(pk, np.unique(bk)).sum())  # first-match count
    results = []
    ok = bm.run_duckdb_case(_FakeDuckdb, "T-Q2", bk, bv, pk, expected,
                            results)
    # the dedup bridge makes DuckDB's full-join COUNT(*) equal the
    # engines' first-match count even with duplicate build keys
    assert ok
    assert len(results) == 4
    assert {r["task"] for r in results} == {"join_count",
                                            "join_materialize"}
    assert all(r["count"] == expected and r["ok"] for r in results)
    labels = {r["label"] for r in results}
    assert labels == {"duckdb (Join Only)", "duckdb (Ingest + Join)"}


def test_duckdb_parity_failure_detected():
    bk = np.array([1, 2, 3], np.uint64)
    bv = np.array([1, 2, 3], np.uint64)
    pk = np.array([1, 2, 9], np.uint64)
    results = []
    ok = bm.run_duckdb_case(_FakeDuckdb, "T-bad", bk, bv, pk,
                            expected=999, results=results)
    assert not ok and all(not r["ok"] for r in results)


def test_duckdb_absent_detection():
    # this image has no duckdb; the detector must degrade to None
    # (on images WITH duckdb it returns the module and main() lights
    # the columns up)
    mod = bm.duckdb_module()
    try:
        import duckdb  # noqa: F401
        assert mod is not None
    except ImportError:
        assert mod is None
