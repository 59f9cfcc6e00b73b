"""In-row array aggregation expressions (r13 optimization round).

Per-row n-gram/token counting does not need a shuffle: sorting the
row's array and folding its runs yields the same (value, count) pairs
the explode → groupBy pipeline computes, with the occurrence stream
never leaving the row. Used where the DOWNSTREAM consumer needs only
distinct (row, value, count) triples — the explode then emits the
already-reduced pairs (guide §2: shuffle distinct groups, not
occurrences).

Exactness: the sorted order is Spark's UTF8String binary ordering —
the same total order the window/orderBy forms used — and counts are
run lengths over exactly the same multiset, so results are identical
row-for-row, not just statistically.
"""

from __future__ import annotations


def runs_expr(arr_sql: str) -> str:
    """SQL for ``array<struct<g string, c bigint>>``: (value, count)
    runs of the sorted input ``array<string>``.

    Linear per row: run starts are found by neighbor comparison over
    the sorted array, run lengths by next-start delta. The sorted
    array and the starts list are BOUND as lambda variables
    (``transform(array(x), v -> ...)[0]``) so each is evaluated once
    per row — inlining them textually would re-evaluate the sort per
    element access (O(n² log n), measured catastrophic)."""
    starts = (
        "filter(sequence(1, size(s)), "
        "i -> IF(i = 1, true, element_at(s, i) != element_at(s, i - 1)))"
    )
    return (
        f"IF(size({arr_sql}) = 0, CAST(array() AS ARRAY<STRUCT<g: STRING, c: BIGINT>>), "
        f"transform(array(array_sort({arr_sql})), s -> "
        f"transform(array({starts}), st -> "
        f"zip_with(st, concat(slice(st, 2, size(st)), array(size(s) + 1)), "
        f"(a, b) -> named_struct('g', element_at(s, a), 'c', CAST(b - a AS BIGINT))))[0])[0])"
    )
