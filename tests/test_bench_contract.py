"""Driver-emission contract for bench.py.

The driver tail-captures bench stdout into a bounded buffer and parses the
LAST line.  Rounds 5 and 7 both lost their entire bench artifact to emission
details (a crash with no line; a 2.5 KB line overflowing the tail buffer).
These tests pin the contract: the final line must parse as JSON and stay
small regardless of how many queries the headline grows to.
"""

import json

import bench


def _fake_out(n_queries: int) -> dict:
    return {
        "metric": "headline_total",
        "value": 123.456,
        "unit": "sec",
        "value_legacy34": 35.8,
        "queries": {f"very_long_query_name_number_{i:04d}": 1.234 for i in range(n_queries)},
        "streaming_rows_per_sec": {f"streaming_q{i}": 12345.6 for i in range(n_queries // 5)},
        "errors": {f"q{i}": "SomeError: " + "x" * 400 for i in range(3)},
        "sf": 0.1,
        "runs": 3,
        "wall_total": 400.123,
    }


def test_compact_line_parses_and_is_small():
    for n in (0, 75, 500):
        line = bench.compact_line(_fake_out(n))
        assert len(line) < 512
        parsed = json.loads(line)
        assert parsed["metric"] == "headline_total"
        assert parsed["value"] == 123.456
        assert parsed["unit"] == "sec"
        assert parsed["n_queries"] == n
        assert parsed["sf"] == 0.1
        # unbounded fields must never leak into the tail line
        assert "queries" not in parsed
        assert "streaming_rows_per_sec" not in parsed
        assert "errors" not in parsed


def test_compact_line_partial_flag_preserved():
    out = _fake_out(10)
    out["partial"] = True
    parsed = json.loads(bench.compact_line(out))
    assert parsed["partial"] is True


def test_scale_proof_finds_full_line_in_two_line_output(monkeypatch):
    """scale_proof.run_bench must locate the full artifact line even though
    bench.py now prints a compact tail line AFTER it (driver tail-buffer
    contract) — the r8 emission change would otherwise silently hand the
    proof a line with no per-query map."""
    import os
    import sys
    import types

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import scale_proof

    full = {"metric": "headline_total", "queries": {"q1": 1.0}, "value": 1.0}
    compact = {"metric": "headline_total", "value": 1.0, "n_queries": 1}
    fake_stdout = "noise line\n" + json.dumps(full) + "\n" + json.dumps(compact) + "\n"

    def fake_run(*args, **kwargs):
        return types.SimpleNamespace(stdout=fake_stdout, returncode=0)

    monkeypatch.setattr(scale_proof.subprocess, "run", fake_run)
    parsed = scale_proof.run_bench("/tmp/x", ["q1"])
    assert parsed["queries"] == {"q1": 1.0}


def test_every_headline_name_is_registered():
    """A misspelled HEADLINE entry only surfaces as a per-query error at
    bench runtime (and silently shrinks the round's measured surface) —
    catch it at test time instead."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench headline names not in registry: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate headline names"
