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


def test_dict_subscript_capture_is_key_granular(tmp_path):
    """Scheme 3 (r11 second pass): a dict referenced ONLY via
    constant-string subscripts captures just the accessed keys, so an
    edit to an UNRELATED key no longer flips the entry's hash (the
    d51/pipelines.ORACLE over-capture); a bare (non-subscript) use
    still captures the whole dict."""
    import importlib.util

    mod_file = tmp_path / "subscript_probe.py"
    mod_file.write_text(
        "TABLE = {'mine': 'a', 'other': 'b'}\n"
        "def probe_subscript():\n"
        "    return TABLE['mine']\n"
        "def probe_bare():\n"
        "    return len(TABLE)\n"
        "def probe_mixed(k):\n"
        "    return TABLE['mine'] + TABLE[k]\n"
    )
    spec = importlib.util.spec_from_file_location("subscript_probe", mod_file)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    _, consts = T._closure(mod.probe_subscript)
    assert "subscript_probe.TABLE['mine']" in consts
    assert not any("other" in k for k in consts)

    _, consts_bare = T._closure(mod.probe_bare)
    assert "subscript_probe.TABLE" in consts_bare

    # a dynamic-key use alongside the constant one -> whole capture
    _, consts_mixed = T._closure(mod.probe_mixed)
    assert "subscript_probe.TABLE" in consts_mixed

    # and the granular capture still SEES a change to the used key
    mod_file.write_text(
        "TABLE = {'mine': 'CHANGED', 'other': 'b'}\n"
        "def probe_subscript():\n"
        "    return TABLE['mine']\n"
    )
    spec2 = importlib.util.spec_from_file_location("subscript_probe2", mod_file)
    mod2 = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(mod2)
    _, consts2 = T._closure(mod2.probe_subscript)
    assert (
        consts2["subscript_probe2.TABLE['mine']"]
        != consts["subscript_probe.TABLE['mine']"]
    )
