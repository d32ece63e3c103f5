"""The mechanical plan/proof-freshness gate (VERDICT r15 item 2).

Two rounds running, a query's code changed AFTER its newest driver proof
while the query sat outside the correctness window: r14 changed the shared
`containment_pairs` pipeline but left `dedup_containment` /
`dedup_keep_containment` (newest proof r13) out of the r14 window; r15
rewrote the jpeg decoder module (+941 lines) while `multimodal_jpeg_stats`
/ `multimodal_jpeg_color` (newest proofs r13/r14) sat outside the r15
window.  `tests/test_registry.py` enforces proven-or-in-window but not
proof-newer-than-the-code — this file closes that hole:

- PROOF_LEDGER.json records each query's code-closure fingerprint
  (tools/closure_fp.py) and normalized plan fingerprint
  (tools/plan_audit.py) at its newest driver proof;
- `test_every_changed_query_is_in_the_window` recomputes the closure
  fingerprints live and requires any mismatch to be inside the current
  window (PLAN_AUDIT.json supplies the plan side, itself pinned to the
  working tree by test_plan_audit.py);
- `test_gate_catches_the_r14_and_r15_incidents` replays both prior
  incidents' exact shapes through the pure checker and asserts each would
  have failed CI.
"""

import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from proof_ledger import plan_drift, stale_names  # noqa: E402

WINDOW = 50  # the driver checks the first ~50 registry names


def _ledger():
    with open(os.path.join(ROOT, "PROOF_LEDGER.json")) as fh:
        return json.load(fh)["entries"]


def test_every_changed_query_is_in_the_window():
    """Any registered query whose CURRENT code-closure fingerprint
    (salted with session.py) differs from its at-proof fingerprint in
    PROOF_LEDGER.json (or that has no ledger entry) must sit inside the
    driver window.  Fix on failure: rotate the named queries to the
    window front in queries/__init__.py, or — at round start, before any
    source edit — run `python tools/proof_ledger.py update` to absorb
    fresh driver proofs; after a session.py change, re-prove the full
    registry (tools/check.py, no filter) and re-seed with that basis.
    Plan-fingerprint drift is surfaced as a warning, not a failure —
    plan strings carry measured planner nondeterminism (see
    proof_ledger.stale_names)."""
    import warnings

    from proof_ledger import current_fingerprints

    from spark_kafka_realm_time_data_pipeline_spark.queries import registry

    closure_fps, plan_fps = current_fingerprints()
    window = list(registry())[:WINDOW]
    violations = stale_names(_ledger(), closure_fps, window)
    assert not violations, (
        "changed-since-proof queries outside the driver window: "
        f"{violations}"
    )
    drift = plan_drift(_ledger(), plan_fps)
    if drift:
        warnings.warn(
            f"advisory plan-fingerprint drift (inspect, not a gate): {drift}",
            stacklevel=1,
        )


def test_gate_catches_the_r14_and_r15_incidents():
    """Replay of the two shipped staleness incidents:

    r14: `containment_pairs` (operators/dedup.py) gained a rank-stage
    count-window and a verify semi-filter — a CODE and PLAN change for
    `dedup_containment`, whose newest proof (r13) predated it — and the
    r14 window did not contain the query.

    r15: the jpeg decoder module gained DRI/SOF2 branches — a CODE change
    reachable from `multimodal_jpeg_stats`'s mapInPandas batch whose PLAN
    stayed byte-identical — and the r15 window did not contain the query.

    Both must be flagged; the r15 shape specifically must be caught with
    an UNCHANGED plan fingerprint, which is why the gate hashes the code
    closure and not just the plan."""
    ledger = {
        "dedup_containment": {
            "round": 13, "closure_fp": "aaaa", "plan_fp": "pppp",
        },
        "multimodal_jpeg_stats": {
            "round": 13, "closure_fp": "cccc", "plan_fp": "qqqq",
        },
        "untouched_query": {
            "round": 13, "closure_fp": "ffff", "plan_fp": "rrrr",
        },
    }
    current_closure = {
        "dedup_containment": "aaa2",     # r14: pipeline code changed
        "multimodal_jpeg_stats": "ccc2",  # r15: decoder module changed
        "untouched_query": "ffff",
    }
    window = ["untouched_query", "some_other_query"]  # incidents outside
    flagged = stale_names(ledger, current_closure, window)
    assert flagged == {
        "dedup_containment": "code closure changed since proof",
        "multimodal_jpeg_stats": "code closure changed since proof",
    }
    # in-window incidents are tolerated (the window IS the re-proof queue)
    assert stale_names(
        ledger, current_closure,
        window + ["dedup_containment", "multimodal_jpeg_stats"],
    ) == {}
    # a never-proven query must be in the window
    assert stale_names(
        ledger, {"brand_new": "zzzz"}, window
    ) == {"brand_new": "no recorded proof"}
    # plan drift is surfaced separately as an advisory (r14's plan change
    # also changed code, so enforcement still catches it via closure)
    assert plan_drift(ledger, {"dedup_containment": "ppp2"}) == {
        "dedup_containment": "pppp -> ppp2"
    }
    assert plan_drift(ledger, {"untouched_query": "rrrr"}) == {}


def test_session_config_change_flips_every_fingerprint():
    """session.py shapes every query's plan (AQE, shuffle partitions,
    state-store provider) without appearing in any code closure — the
    one plan-changes-without-code-change vector this repo has.  The
    registry fingerprints are salted with session.py's source, so a
    config edit flips them all and forces the documented full-re-proof
    protocol (check.py full run + ledger re-seed)."""
    from closure_fp import closure_fingerprint

    from spark_kafka_realm_time_data_pipeline_spark.queries import registry

    spec = registry()["nation_revenue"]
    a = closure_fingerprint(spec.fn, spec.oracle, salt="session-v1")
    b = closure_fingerprint(spec.fn, spec.oracle, salt="session-v2")
    assert a != b


def test_closure_fingerprint_tracks_transitive_callees(tmp_path):
    """Live sensitivity proof: the closure fingerprint flips when a
    TRANSITIVELY-called helper's source changes (the r15 incident shape:
    registry fn -> extractor -> decoder), and stays put when unrelated
    code in the same module changes."""
    import importlib.util

    from closure_fp import closure_fingerprint

    def load(version_dir, body):
        pkg = version_dir / "minipkg"
        pkg.mkdir(parents=True)
        (pkg / "__init__.py").write_text("")
        (pkg / "ops.py").write_text(body)
        (pkg / "q.py").write_text(
            "from . import ops\n"
            "def query():\n"
            "    return ops.extract()\n"
        )
        spec = importlib.util.spec_from_file_location(
            f"minipkg_{version_dir.name}", pkg / "__init__.py",
            submodule_search_locations=[str(pkg)],
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
        qspec = importlib.util.spec_from_file_location(
            f"{spec.name}.q", pkg / "q.py"
        )
        q = importlib.util.module_from_spec(qspec)
        opsspec = importlib.util.spec_from_file_location(
            f"{spec.name}.ops", pkg / "ops.py"
        )
        ops = importlib.util.module_from_spec(opsspec)
        sys.modules[opsspec.name] = ops
        opsspec.loader.exec_module(ops)
        q.ops = ops
        qspec.loader.exec_module(q)
        return q.query

    v1 = (
        "def decode(x):\n    return x + 1\n\n"
        "def extract():\n    return decode(1)\n\n"
        "def unrelated():\n    return 'a'\n"
    )
    # v2: the transitive DECODER changed; extract() and query() unchanged
    v2 = v1.replace("return x + 1", "return x + 2")
    # v3: only code unreachable from query() changed
    v3 = v1.replace("return 'a'", "return 'b'")

    # fingerprints embed module names, so load every version under a
    # distinct import name but normalize the recorded module names to a
    # shared prefix — only SOURCE differences affect the hash
    fps2 = {}
    for tag, body in (("v1", v1), ("v2", v2), ("v3", v3)):
        d = tmp_path / ("same_" + tag)
        fn = load(d, body)
        mod = sys.modules[f"minipkg_same_{tag}.ops"]
        fn.__module__ = "minipkg_X.q"
        for v in vars(mod).values():
            if callable(v):
                v.__module__ = "minipkg_X.ops"
        mod.__name__ = "minipkg_X.ops"
        fps2[tag] = closure_fingerprint(fn, oracle=None, pkg="minipkg_X")
    assert fps2["v1"] != fps2["v2"], "transitive callee change must flip fp"
    assert fps2["v1"] == fps2["v3"], "unreachable change must not flip fp"


def test_function_body_import_is_absorbed(tmp_path):
    """Replay of the r17 blind-spot incident: a query that reaches a
    helper ONLY through a function-BODY relative import
    (``from .helpers import helper`` inside the function) must still
    absorb the helper's source into its fingerprint.  Before the
    IMPORT_NAME fix, the name resolved against module globals only, so
    three streaming twins' fingerprints survived a staging-helper
    refactor unchanged — exactly the staleness class the gate exists
    to catch."""
    import importlib

    from closure_fp import closure_fingerprint

    fps = {}
    for tag, body in (
        ("v1", "def helper():\n    return 1\n"),
        ("v2", "def helper():\n    return 2\n"),
    ):
        name = f"minipkg_fb{tag}"
        pkg = tmp_path / name
        pkg.mkdir()
        (pkg / "__init__.py").write_text("")
        (pkg / "helpers.py").write_text(body)
        (pkg / "q.py").write_text(
            "def query():\n"
            "    from .helpers import helper\n"
            "    return helper()\n"
        )
        sys.path.insert(0, str(tmp_path))
        try:
            q = importlib.import_module(f"{name}.q")
            # the function-body import has not run, so helpers is not yet
            # in sys.modules — mirror production, where the walker's
            # sys.modules-first resolution finds package modules already
            # imported by the registry, by importing it here
            importlib.import_module(f"{name}.helpers")
        finally:
            sys.path.remove(str(tmp_path))
        # normalize module identity to a shared prefix (as above) so only
        # SOURCE differences affect the hash; alias the helpers module
        # under the normalized name so the import resolution finds it
        h = sys.modules[f"{name}.helpers"]
        q.query.__module__ = "minipkg_X.q"
        h.__name__ = "minipkg_X.helpers"
        for v in vars(h).values():
            if callable(v):
                v.__module__ = "minipkg_X.helpers"
        sys.modules["minipkg_X.helpers"] = h
        try:
            fps[tag] = closure_fingerprint(q.query, oracle=None, pkg="minipkg_X")
        finally:
            del sys.modules["minipkg_X.helpers"]
    assert fps["v1"] != fps["v2"], (
        "a helper reached only via a function-body import must be part "
        "of the closure fingerprint"
    )


def test_oracle_change_flips_fingerprint():
    """A changed DuckDB oracle needs a re-proof exactly like changed code
    (the r7 HUGEINT incident class): the oracle text is part of the
    fingerprint."""
    from closure_fp import closure_fingerprint

    from spark_kafka_realm_time_data_pipeline_spark.queries import registry

    spec = registry()["nation_revenue"]
    a = closure_fingerprint(spec.fn, spec.oracle)
    b = closure_fingerprint(spec.fn, spec.oracle + " -- edited")
    assert a != b


def test_plan_fingerprint_normalizes_ids_paths_and_stats():
    """The plan fingerprint must survive expression-id renumbering,
    corpus path changes, and statistics drift (else every corpus
    regeneration would mass-flag the registry) while flipping on a real
    shape change."""
    from plan_audit import plan_fingerprint

    a = (
        "*(2) HashAggregate(keys=[l_returnflag#123], functions=[sum(x#4L)])\n"
        "+- Exchange hashpartitioning(l_returnflag#123, 32), plan_id=7\n"
        "   +- FileScan parquet [x#4L] Location: InMemoryFileIndex"
        " [/root/testdata/sf0.01/lineitem.parquet], Statistics(sizeInBytes=1.2 MiB)"
    )
    b = (
        "*(2) HashAggregate(keys=[l_returnflag#9], functions=[sum(x#77L)])\n"
        "+- Exchange hashpartitioning(l_returnflag#9, 32), plan_id=42\n"
        "   +- FileScan parquet [x#77L] Location: InMemoryFileIndex"
        " [/root/testdata/sf1/lineitem.parquet], Statistics(sizeInBytes=88.0 GiB)"
    )
    c = a.replace("HashAggregate", "SortAggregate")
    assert plan_fingerprint(a) == plan_fingerprint(b)
    assert plan_fingerprint(a) != plan_fingerprint(c)
