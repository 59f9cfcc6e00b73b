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
    assert recorded.pop(T._SCHEME_KEY, None) == T._SCHEME, (
        "hashing scheme drifted — rerun `python tools_implhash.py --update`"
    )
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


def test_infra_excluded_from_entry_closures():
    """Review r11 #1: shared plumbing (catalog/session/caching, the
    `t` loader, the registration decorator) must NOT enter per-entry
    hashes — one infra edit would otherwise flip all 311 ledger rows
    and block every driver-green entry at once. It hashes under the
    reserved __infra__ key instead, so drift there stays visible as
    ONE row that blocked_updates never blocks (it is never
    driver-green)."""
    from pinot_pulsar_plugin_spark.registry import all_queries

    funcs, consts = T._closure(all_queries()["q01_pricing_summary"])
    infra_leak = [
        n
        for n in list(funcs) + list(consts)
        if ".catalog." in n
        or ".caching." in n
        or ".session." in n
        or n.endswith(".t")
        or "make_registry" in n
    ]
    assert infra_leak == [], infra_leak
    hashes = T.compute_hashes()
    assert T._INFRA_KEY in hashes
    assert T.blocked_updates([T._INFRA_KEY], {"q01_pricing_summary": 1}, {}, 99) == []


def test_local_shadowing_does_not_pull_globals(tmp_path):
    """Review r11 #2: a parameter or local that shares a name with a
    module global must not pull that unrelated global into the hash —
    _names_in filters fn's own co_varnames before resolution. Driven
    through a REAL module on disk so inspect.getsource works."""
    import importlib.util

    mod_file = tmp_path / "shadow_probe.py"
    mod_file.write_text(
        "GLOBAL_CONST = 'unrelated'\n"
        "def helper():\n    return 1\n"
        "def probe(helper, other):\n"
        "    GLOBAL_CONST = other\n"
        "    return helper + GLOBAL_CONST\n"
        "def probe_uses_global(x):\n"
        "    return helper() + x, GLOBAL_CONST\n"
    )
    spec = importlib.util.spec_from_file_location("shadow_probe", mod_file)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # probe shadows both names -> neither resolves
    assert "helper" not in T._names_in(mod.probe)
    assert "GLOBAL_CONST" not in T._names_in(mod.probe)
    # probe_uses_global genuinely references them -> both resolve
    assert "helper" in T._names_in(mod.probe_uses_global)
    assert "GLOBAL_CONST" in T._names_in(mod.probe_uses_global)


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
