"""Semantic property tests for textops that an identical-offset oracle
cannot catch (ADVICE r2: t59's Spark AND DuckDB sides shared the same
skipped-position bug, so parity was blind to it)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.catalog import load_table
from pinot_pulsar_plugin_spark.operators.textops import (
    _WIN_BASE,
    _WIN_MOD,
    _rolling_hashes,
    t59_winnow_fingerprint,
)

SF = "/root/testdata/sf0.001"


def _py_rolling_hashes(tokens: list[str]) -> list[int]:
    vals = [
        (ord(s[0]) * 65599 + len(s) * 31 + ord(s[-1])) % _WIN_MOD if s else None
        for s in tokens
    ]
    out = []
    for i in range(len(vals) - 2):
        a, b, c = vals[i], vals[i + 1], vals[i + 2]
        if a is None or b is None or c is None:
            continue
        out.append(((a * _WIN_BASE + b) * _WIN_BASE + c) % _WIN_MOD)
    return out


def _py_winnow(h: list[int], w: int = 4) -> list[int]:
    return sorted({min(h[i : i + w]) for i in range(len(h) - w + 1)})


def test_winnow_selects_min_of_every_window_of_4(spark):
    """m[i] must equal min(h[i..i+3]) — the independent Python mirror
    would have caught the old pairing (min over {i,i+1,i+3,i+4})."""
    d = load_table(spark, SF, "documents").limit(50)
    rows = (
        d.select(
            "doc_id",
            F.split(F.lower("text"), " ").alias("tk"),
            _rolling_hashes(F.split(F.lower("text"), " ")).alias("h"),
        )
        .collect()
    )
    got = {
        r.doc_id: (r.n_fingerprints, r.fp_digest)
        for r in t59_winnow_fingerprint(spark, SF).collect()
    }
    checked = 0
    for r in rows:
        exp_h = _py_rolling_hashes(list(r.tk))
        assert exp_h == list(r.h), r.doc_id
        if len(exp_h) < 4:
            continue
        fps = _py_winnow(exp_h)
        digest = hashlib.md5(",".join(str(x) for x in fps).encode()).hexdigest()
        assert got[r.doc_id] == (len(fps), digest), r.doc_id
        checked += 1
    assert checked >= 40


def test_winnow_moss_guarantee_shared_run_shares_fingerprint(spark):
    """MOSS guarantee: two documents sharing a token run of length
    >= k+w-1+ (k=3, w=4 -> any shared run producing >= 4 consecutive
    hashes, i.e. >= 9 shared tokens) share at least one selected
    fingerprint member."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india".split()
    doc_a = ["xx1", "yy1"] + base + ["zz1"]
    doc_b = ["qq2"] + base + ["rr2", "ss2"]
    fa = set(_py_winnow(_py_rolling_hashes(doc_a)))
    fb = set(_py_winnow(_py_rolling_hashes(doc_b)))
    assert fa & fb
