"""Per-query CODE-CLOSURE fingerprints for the proof-freshness gate.

Two staleness incidents in a row (r14 containment pair, r15 jpeg pair)
shipped because `tests/test_registry.py` enforces proven-or-in-window but
not proof-newer-than-the-code.  The r15 incident is the instructive one:
the queries' physical plans were IDENTICAL before and after the change —
the churn was inside the Python decoder the mapInPandas batch calls — so
a plan fingerprint alone cannot catch that class.  This module fingerprints
the code itself: the transitive closure of package functions, classes,
modules-referenced-attributes, and module-level constants reachable from a
query's registry fn, plus its DuckDB oracle SQL.  Any edit to any source
the query can execute (or to the oracle it is compared against) flips the
fingerprint; `tests/test_proof_freshness.py` then requires the query to be
inside the driver's correctness window until a new proof lands.

The walk is static-ish: it scans code objects' ``co_names`` / closure
cells / defaults and resolves them against the function's globals and
against every package module the function references (so ``M.decode_jpeg``
pulls in ``operators.multimodal.decode_jpeg`` transitively).  It
over-approximates — a name that happens to exist on a referenced module is
included even if never called — which errs toward flagging, never toward
missing a change.  Known blind spots, documented rather than hidden:
purely dynamic dispatch (getattr with a computed string) and session-level
config (`session.py` — queries never reference it; covered by the PLAN
fingerprint in PLAN_AUDIT.json, which config changes do flip).
"""

from __future__ import annotations

import hashlib
import inspect
import types

PKG = "spark_kafka_realm_time_data_pipeline_spark"

_LITERALS = (int, float, complex, str, bytes, bool, type(None), frozenset)


def _code_objects(code):
    yield code
    for c in code.co_consts:
        if isinstance(c, types.CodeType):
            yield from _code_objects(c)


def _as_function(v):
    """Unwrap decorated / pandas_udf-style callables to the underlying
    plain function, if there is one."""
    v = inspect.unwrap(v)
    if isinstance(v, types.FunctionType):
        return v
    func = getattr(v, "func", None)  # pandas_udf wrapper / functools.partial
    if isinstance(func, types.FunctionType):
        return inspect.unwrap(func)
    return None


def _is_literalish(v, depth: int = 0) -> bool:
    if isinstance(v, _LITERALS):
        return True
    if depth > 2:
        return False
    if isinstance(v, (tuple, list)):
        return all(_is_literalish(x, depth + 1) for x in v)
    if isinstance(v, dict):
        return all(
            _is_literalish(k, depth + 1) and _is_literalish(x, depth + 1)
            for k, x in v.items()
        )
    return False


def closure_fingerprint(fn, oracle: str | None = None, pkg: str = PKG) -> str:
    """Hex fingerprint of everything package-side the query can execute:
    sources of every reachable package function/class, reprs of every
    reachable package module-level literal constant, and the oracle SQL.
    Deterministic: all collected items are sorted before hashing."""
    fn_sources: dict[str, str] = {}
    const_reprs: dict[str, str] = {}
    work: list[types.FunctionType] = []
    visited: set[int] = set()

    def visit_value(v, name: str, owner_mod: str, mods: list) -> None:
        f = _as_function(v)
        if f is not None:
            if (getattr(f, "__module__", "") or "").startswith(pkg):
                work.append(f)
            return
        if isinstance(v, types.ModuleType):
            if (v.__name__ or "").startswith(pkg):
                mods.append(v)
            return
        if isinstance(v, type):
            if (getattr(v, "__module__", "") or "").startswith(pkg):
                key = f"{v.__module__}.{v.__qualname__}"
                if key not in fn_sources:
                    try:
                        fn_sources[key] = inspect.getsource(v)
                    except (OSError, TypeError):
                        fn_sources[key] = repr(v)
            return
        if _is_literalish(v):
            const_reprs[f"{owner_mod}::{name}"] = repr(v)

    root = _as_function(fn)
    if root is not None:
        work.append(root)
    while work:
        f = work.pop()
        if id(f) in visited:
            continue
        visited.add(id(f))
        mod = getattr(f, "__module__", "") or ""
        if not mod.startswith(pkg):
            continue
        key = f"{mod}.{f.__qualname__}"
        if key not in fn_sources:
            try:
                fn_sources[key] = inspect.getsource(f)
            except (OSError, TypeError):
                fn_sources[key] = f.__code__.co_code.hex()
        names: set[str] = set()
        for code in _code_objects(f.__code__):
            names.update(code.co_names)
        g = f.__globals__
        mods: list = []
        for name in sorted(names):
            if name in g:
                visit_value(g[name], name, mod, mods)
        # attribute access through referenced package modules: for
        # `M.decode_jpeg`, co_names holds both "M" and "decode_jpeg"
        for m in mods:
            for name in sorted(names):
                v = getattr(m, name, None)
                if v is not None:
                    visit_value(v, name, m.__name__, mods)
        for cell in f.__closure__ or ():
            try:
                visit_value(cell.cell_contents, "<cell>", mod, mods)
            except ValueError:
                pass  # empty cell
        for d in f.__defaults__ or ():
            visit_value(d, "<default>", mod, mods)

    h = hashlib.sha256()
    for key in sorted(fn_sources):
        h.update(key.encode())
        h.update(fn_sources[key].encode())
    for key in sorted(const_reprs):
        h.update(key.encode())
        h.update(const_reprs[key].encode())
    if oracle:
        h.update(oracle.encode())
    return h.hexdigest()[:16]


def registry_fingerprints() -> dict[str, str]:
    """Closure fingerprint for every registered query (fn + oracle)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spark_kafka_realm_time_data_pipeline_spark.queries import registry

    return {
        name: closure_fingerprint(spec.fn, spec.oracle)
        for name, spec in registry().items()
    }


if __name__ == "__main__":
    import json

    print(json.dumps(registry_fingerprints(), indent=1, sort_keys=True))
