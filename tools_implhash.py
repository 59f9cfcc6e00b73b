#!/usr/bin/env python
"""Mechanical implementation-hash ledger for the registry.

VERDICT r10 #1 introduced `_IMPL_REPLACED` (registry.py): replacing a
driver-green entry's implementation must reset its staleness so the
driver re-proves the NEW code. The dict is hand-maintained, which
leaves a hole: forget the row and the correctness record silently
claims coverage of code that no longer exists. This tool closes the
hole mechanically.

For every registry entry it computes a content hash over:

- the entry function's AST with docstrings stripped (so doc-only and
  comment-only edits never trip the ledger),
- every same-package plain function transitively reachable from it by
  name (helpers like `value_histogram` or `equidepth_bins_hist`
  carry real semantics; a rewrite there is a rewrite of the entry),
- module-level literal constants the closure references (q197's SQL
  text, _Q119_COLS, bin counts — behavior changes that touch no
  function body),
- the entry's DuckDB oracle SQL (an oracle edit equally invalidates a
  prior green row).

Out of scope, documented: class-based behavior (the pulsarlike source
classes are covered by their own suites) and cross-package imports.

Usage:
  python tools_implhash.py            # check against IMPL_HASHES.json
  python tools_implhash.py --update   # rewrite IMPL_HASHES.json

--update REFUSES to bless a changed hash for an entry that has a
driver-green row unless registry._IMPL_REPLACED[name] >= the CURRENT
round (max recorded CORRECTNESS round + 1) — i.e. the ledger row that
makes the driver re-score it must exist BEFORE the hash can move.
Entries never driver-scored update freely (they are backlog; the
window fronts them anyway). tests/test_impl_hash_ledger.py runs the
check mode in the suite.
"""

from __future__ import annotations

import ast
import glob
import hashlib
import inspect
import json
import os
import re
import sys
import textwrap
import types

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

LEDGER = os.path.join(HERE, "IMPL_HASHES.json")
_PKG = "pinot_pulsar_plugin_spark"

_LITERALS = (str, int, float, bool, bytes, tuple, list, dict, frozenset, set)


class _DocStripper(ast.NodeTransformer):
    def _strip(self, node):
        self.generic_visit(node)
        if (
            node.body
            and isinstance(node.body[0], ast.Expr)
            and isinstance(node.body[0].value, ast.Constant)
            and isinstance(node.body[0].value.value, str)
        ):
            node.body = node.body[1:] or [ast.Pass()]
        return node

    visit_FunctionDef = _strip
    visit_AsyncFunctionDef = _strip
    visit_ClassDef = _strip
    visit_Module = _strip


# Shared plumbing that carries NO query semantics: table loading,
# session config, persist plumbing, and the registration decorator.
# Review r11 #1: with these inside every entry's closure, one infra
# edit flips all 311 hashes at once and --update refuses every
# driver-green entry — an unusable contract. They hash under the
# reserved "__infra__" ledger key instead (drift stays visible, never
# blocks; infra result-correctness is the anchor queries' and the
# suites' job). Numeric helpers (functions/exact.py, value_histogram)
# stay per-entry: a change there legitimately invalidates greens.
_INFRA_MODULES = (
    f"{_PKG}.catalog",
    f"{_PKG}.session",
    f"{_PKG}.caching",
)
_INFRA_QUALNAMES = {
    (f"{_PKG}.operators.common", "t"),
    (f"{_PKG}.operators.common", "make_registry"),
}
_INFRA_KEY = "__infra__"


def _is_infra(f: types.FunctionType) -> bool:
    if any(
        f.__module__ == m or f.__module__.startswith(m + ".")
        for m in _INFRA_MODULES
    ):
        return True
    top = f.__qualname__.split(".")[0]
    return (f.__module__, top) in _INFRA_QUALNAMES


# memoized per function object (review r11 #4): shared helpers are
# reached from hundreds of entries; parse/dump each once.
_DUMP_CACHE: dict[types.FunctionType, str] = {}
_NAMES_CACHE: dict[types.FunctionType, list[str]] = {}


def _normalized_dump(fn) -> str:
    if fn not in _DUMP_CACHE:
        src = textwrap.dedent(inspect.getsource(fn))
        tree = _DocStripper().visit(ast.parse(src))
        _DUMP_CACHE[fn] = ast.dump(tree, include_attributes=False)
    return _DUMP_CACHE[fn]


def _names_in(fn) -> list[str]:
    """Module-scope candidate names referenced by fn: every ast.Name
    except fn's own parameters/locals (review r11 #2 — a local that
    shadows a module global must not pull the unrelated global into
    the hash). Locals of NESTED defs aren't excluded, which can only
    over-include, never miss."""
    if fn not in _NAMES_CACHE:
        src = textwrap.dedent(inspect.getsource(fn))
        tree = ast.parse(src)
        local = set(fn.__code__.co_varnames)
        _NAMES_CACHE[fn] = sorted(
            {
                node.id
                for node in ast.walk(tree)
                if isinstance(node, ast.Name) and node.id not in local
            }
        )
    return _NAMES_CACHE[fn]


def _const_repr(obj) -> str:
    if isinstance(obj, (set, frozenset)):
        # set repr is hash-order dependent across processes
        return repr(sorted(repr(x) for x in obj))
    return repr(obj)


# memoized per function object, like _NAMES_CACHE
_SUBSCRIPT_CACHE: dict[types.FunctionType, dict[str, set | None]] = {}


def _subscript_keys(fn, name: str) -> set | None:
    """The constant string keys under which fn reads dict ``name``, or
    None if any reference is NOT a constant-key subscript (then the
    whole dict must be captured).

    Scheme 3 (review r11 second pass): a module-wide dict like
    pipelines.ORACLE is referenced as ORACLE["d49…"] from one entry's
    oracle f-string; hashing the WHOLE dict made that entry's hash
    flip whenever ANY other key changed — the same over-capture class
    as the scheme-2 infra fix, one dict-granularity down."""
    if fn not in _SUBSCRIPT_CACHE:
        src = textwrap.dedent(inspect.getsource(fn))
        tree = ast.parse(src)
        by_name: dict[str, set | None] = {}
        sub_value_ids: set[int] = set()
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Subscript)
                and isinstance(node.value, ast.Name)
                and isinstance(node.slice, ast.Constant)
                and isinstance(node.slice.value, str)
            ):
                nm = node.value.id
                sub_value_ids.add(id(node.value))
                if by_name.get(nm, set()) is not None:
                    by_name.setdefault(nm, set()).add(node.slice.value)
        for node in ast.walk(tree):
            if isinstance(node, ast.Name) and id(node) not in sub_value_ids:
                by_name[node.id] = None  # a bare use → whole-object capture
        _SUBSCRIPT_CACHE[fn] = by_name
    return _SUBSCRIPT_CACHE[fn].get(name)


def _closure(fn) -> tuple[dict[str, str], dict[str, str]]:
    """(qualname → normalized function dump, qualname → literal repr)
    for the same-package transitive closure reachable from fn,
    EXCLUDING infra plumbing (hashed once under __infra__ instead)."""
    funcs: dict[str, str] = {}
    consts: dict[str, str] = {}
    seen: set[types.FunctionType] = set()
    stack = [fn]
    while stack:
        f = stack.pop()
        if f in seen or _is_infra(f):
            continue
        seen.add(f)
        funcs[f"{f.__module__}.{f.__qualname__}"] = _normalized_dump(f)
        for name in _names_in(f):
            obj = f.__globals__.get(name)
            if isinstance(obj, types.FunctionType) and obj.__module__.startswith(
                _PKG
            ):
                stack.append(obj)
            elif isinstance(obj, _LITERALS):
                keys = (
                    _subscript_keys(f, name) if isinstance(obj, dict) else None
                )
                if keys is not None:
                    for k in sorted(keys):
                        if k in obj:
                            consts[f"{f.__module__}.{name}[{k!r}]"] = (
                                _const_repr(obj[k])
                            )
                else:
                    consts[f"{f.__module__}.{name}"] = _const_repr(obj)
    return funcs, consts


def _infra_hash() -> str:
    """One hash over the excluded plumbing: the named common helpers
    plus every module-level function and literal constant of the infra
    modules, so a drift there still surfaces as ONE ledger row."""
    import importlib

    funcs: dict[str, str] = {}
    consts: dict[str, str] = {}
    for modname in _INFRA_MODULES:
        try:
            mod = importlib.import_module(modname)
        except ModuleNotFoundError:
            continue
        for attr in sorted(vars(mod)):
            obj = getattr(mod, attr)
            if attr.startswith("__"):
                continue
            if (
                isinstance(obj, types.FunctionType)
                and obj.__module__ == modname
            ):
                funcs[f"{modname}.{attr}"] = _normalized_dump(obj)
            elif isinstance(obj, _LITERALS):
                consts[f"{modname}.{attr}"] = _const_repr(obj)
    from pinot_pulsar_plugin_spark.operators import common as _common

    for modname, attr in sorted(_INFRA_QUALNAMES):
        obj = getattr(_common, attr, None)
        if isinstance(obj, types.FunctionType):
            funcs[f"{modname}.{attr}"] = _normalized_dump(obj)
    h = hashlib.sha256()
    for qual in sorted(funcs):
        h.update(qual.encode())
        h.update(funcs[qual].encode())
    for qual in sorted(consts):
        h.update(qual.encode())
        h.update(consts[qual].encode())
    return h.hexdigest()


def compute_hashes() -> dict[str, str]:
    from pinot_pulsar_plugin_spark.registry import all_oracle_sql, all_queries

    oracle = all_oracle_sql()
    out = {}
    for name, fn in all_queries().items():
        funcs, consts = _closure(fn)
        h = hashlib.sha256()
        for qual in sorted(funcs):
            h.update(qual.encode())
            h.update(funcs[qual].encode())
        for qual in sorted(consts):
            h.update(qual.encode())
            h.update(consts[qual].encode())
        h.update(oracle.get(name, "").encode())
        out[name] = h.hexdigest()
    out[_INFRA_KEY] = _infra_hash()
    return out


def blocked_updates(
    changed: list[str],
    green: dict[str, int],
    impl_replaced: dict[str, int],
    current_round: int,
) -> list[str]:
    """Names whose hash change may NOT be blessed: driver-green entries
    without an _IMPL_REPLACED row current enough (>= current_round) for
    the driver to re-score the new code. Never-scored entries update
    freely — they are backlog and the window fronts them anyway."""
    return [
        n
        for n in changed
        if n in green and impl_replaced.get(n, 0) < current_round
    ]


def _current_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(p)))
    ]
    return (max(rounds) if rounds else 0) + 1


# Bump when the HASHING SCHEME changes (what goes into a hash), never
# for implementation changes. A scheme mismatch makes every recorded
# hash incomparable, so --update regenerates without the refusal —
# auditable in the same diff that changed this file; within one scheme
# the refusal always applies. v2: infra plumbing moved to __infra__,
# locals no longer resolve against module globals.
_SCHEME = 3
_SCHEME_KEY = "__scheme__"


def main() -> int:
    update = "--update" in sys.argv
    fresh = compute_hashes()
    fresh[_SCHEME_KEY] = _SCHEME
    try:
        with open(LEDGER) as fh:
            recorded = json.load(fh)
    except FileNotFoundError:
        recorded = {}
    scheme_bump = recorded.get(_SCHEME_KEY) != _SCHEME

    changed = sorted(
        n for n in fresh if n in recorded and recorded[n] != fresh[n]
    )
    added = sorted(n for n in fresh if n not in recorded)
    removed = sorted(n for n in recorded if n not in fresh)

    if not update:
        if changed or added or removed:
            print(
                f"IMPL_HASHES.json stale — changed: {changed}, "
                f"added: {added}, removed: {removed}. Run "
                f"`python tools_implhash.py --update` (it enforces the "
                f"_IMPL_REPLACED contract for driver-green entries)."
            )
            return 1
        print(f"IMPL_HASHES.json current: {len(fresh)} entries")
        return 0

    from pinot_pulsar_plugin_spark.registry import (
        _IMPL_REPLACED,
        driver_green_rounds,
    )

    # raw green scan, no resets: "has this entry EVER been driver-
    # recorded" is the question; the resets are the consequence.
    green = driver_green_rounds(impl_replaced={})
    cur = _current_round()
    blocked = [] if scheme_bump else blocked_updates(
        changed, green, _IMPL_REPLACED, cur
    )
    if blocked:
        print(
            f"REFUSED: {blocked} changed implementation but have driver-"
            f"green rows and no current _IMPL_REPLACED entry (need round "
            f">= {cur} in registry._IMPL_REPLACED so the driver re-scores "
            f"the new code). Add the ledger rows first."
        )
        return 1
    with open(LEDGER, "w") as fh:
        json.dump(fresh, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"IMPL_HASHES.json written: {len(fresh)} entries "
        f"(changed: {changed or 'none'}, added: {len(added)}, "
        f"removed: {removed or 'none'})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
