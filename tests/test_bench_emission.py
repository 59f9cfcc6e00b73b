"""bench.py stdout contract: the driver stores only the LAST 2,000
bytes of stdout and JSON-parses the final line. Rounds 5 and 6 both
shipped ``parsed: null`` because the per-query map rode on the final
line and outgrew the window (3,150 bytes at 106 queries). The
emission is now a fixed field set; these tests pin that invariant so
headline-set growth can never truncate it again (VERDICT r6 #1)."""

from __future__ import annotations

import json

import bench


def test_line_under_1kb_regardless_of_headline_count():
    # the line's size must not depend on n_queries: simulate absurd
    # suite sizes and totals and require 2x the judge's 10x-headroom
    # bar (2,000-byte window -> <=200 bytes ... we assert <1,024 as
    # directed, and <200 for the actual shape).
    for n in (1, 106, 500, 100_000):
        line = bench.compact_headline_line(987654.321, n, 0.1)
        assert len(line.encode()) < 1024
        assert len(line.encode()) < 200
        assert "\n" not in line


def test_line_is_one_json_object_with_driver_fields():
    line = bench.compact_headline_line(72.345, 106, 0.1)
    obj = json.loads(line)
    assert obj == {
        "metric": "headline_suite_wall",
        "value": 72.345,
        "unit": "sec",
        "sf": 0.1,
        "n_queries": 106,
    }
    # the per-query map must NOT be on stdout (the r5/r6 failure mode)
    assert "queries" not in obj


def test_line_survives_a_2000_byte_tail_window():
    # reproduce the driver's capture: keep only the last 2,000 bytes
    # of a stdout that ends with our line; the line must parse intact.
    noise = "x" * 5000 + "\n"
    line = bench.compact_headline_line(72.345, 106, 0.1)
    stdout = noise + line + "\n"
    tail = stdout[-2000:]
    last = tail.strip().splitlines()[-1]
    assert json.loads(last)["value"] == 72.345
