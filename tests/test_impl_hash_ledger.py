"""The mechanical half of the _IMPL_REPLACED contract (VERDICT r10 #1).

registry._IMPL_REPLACED is hand-maintained: replace a driver-green
entry's implementation without a ledger row and the correctness record
silently claims coverage of retired code. tools_implhash.py closes the
hole — every registry entry's implementation closure (entry function +
transitively reachable same-package helpers + referenced literal
constants + its oracle SQL, all docstring-stripped) is content-hashed
into IMPL_HASHES.json, and blessing a changed hash for a driver-green
entry requires a current _IMPL_REPLACED row first."""

from __future__ import annotations

import json
import os

import tools_implhash as T

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_impl_hashes_current():
    """Any implementation change to a registry entry must go through
    `python tools_implhash.py --update`, which enforces the
    _IMPL_REPLACED contract for driver-green entries. A doc-only or
    comment-only edit does NOT trip this (docstrings are stripped
    before hashing)."""
    with open(os.path.join(HERE, "IMPL_HASHES.json")) as fh:
        recorded = json.load(fh)
    fresh = T.compute_hashes()
    changed = sorted(n for n in fresh if recorded.get(n) != fresh[n])
    missing = sorted(n for n in recorded if n not in fresh)
    assert not changed and not missing, (
        f"implementation hashes drifted — changed: {changed[:5]}, "
        f"removed: {missing[:5]}. Run `python tools_implhash.py "
        f"--update`; for driver-green entries it will demand an "
        f"_IMPL_REPLACED row (registry.py) so the driver re-scores the "
        f"new code."
    )


def test_blocked_updates_rule():
    """The refusal rule, pinned synthetically: a changed driver-green
    entry without a current-enough _IMPL_REPLACED row is blocked; a
    current row unblocks; never-scored entries update freely; an
    old/stale row does not unblock."""
    green = {"a": 5, "b": 9}
    blocked = T.blocked_updates(
        changed=["a", "b", "c"],
        green=green,
        impl_replaced={"b": 11, "a": 7},
        current_round=11,
    )
    # a: green + row from round 7 < 11 -> blocked
    # b: green + row 11 >= 11 -> allowed
    # c: never scored -> allowed
    assert blocked == ["a"]
    assert T.blocked_updates(["a"], green, {"a": 11}, 11) == []
    assert T.blocked_updates(["c"], green, {}, 11) == []


def test_docstring_edit_does_not_trip():
    """The DocStripper really strips function/class/module docstrings,
    so prose edits never demand a ledger round-trip."""
    import ast

    def dump(src: str) -> str:
        tree = T._DocStripper().visit(ast.parse(src))
        return ast.dump(tree, include_attributes=False)

    assert dump('def f():\n    """v1"""\n    return 1\n') == dump(
        'def f():\n    """v2 rewritten"""\n    return 1\n'
    )
    assert dump("def f():\n    return 1\n") != dump("def f():\n    return 2\n")
    # a docstring-only body stays a valid (empty) function
    assert "Pass" in dump('def f():\n    """only doc"""\n')


def test_closure_reaches_helpers_and_constants():
    """The hash surface must include the places the r10 rewrites
    actually live: q106's registry function delegates to
    equidepth_bins_hist on the shared value_histogram scaffold, and
    q197's semantics live in a module-level SQL constant."""
    from pinot_pulsar_plugin_spark.registry import all_queries

    q = all_queries()
    funcs, _ = T._closure(q["q106_equidepth_bins"])
    assert any(n.endswith(".equidepth_bins_hist") for n in funcs)
    assert any(".value_histogram" in n for n in funcs)
    _, consts = T._closure(q["q197_correlation_matrix"])
    assert any(k.endswith("._Q197") for k in consts)
