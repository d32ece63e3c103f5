"""Atomicity of the shared index-staging helper (_staged_index, r19 —
VERDICT r18 item 2): concurrent stagers of the SAME fingerprint never
observe a half-written index dir — each builds into a process-private
temp dir and exactly one atomic rename wins; the loser discards its copy
and reads the winner's.  No Spark session needed: the helper's contract
is pure filesystem (build callbacks write files)."""

import multiprocessing as mp
import os

import pytest

from spark_kafka_realm_time_data_pipeline_spark.queries.llm import _staged_index


@pytest.fixture()
def scratch(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path))
    sf = tmp_path / "sf"
    sf.mkdir()
    (sf / "documents.parquet").write_bytes(b"not-really-parquet")
    return tmp_path, str(sf)


def _write(idx: str, payload: str) -> None:
    os.makedirs(os.path.join(idx, "sub"), exist_ok=True)
    with open(os.path.join(idx, "sub", "data"), "w") as fh:
        fh.write(payload)
    with open(os.path.join(idx, "sub", "_SUCCESS"), "w") as fh:
        fh.write("")


def _no_leftover_stage_dirs(root: str) -> bool:
    return not [d for d in os.listdir(root) if "_stage_" in d]


def test_interleaved_stagers_keep_winner(scratch):
    """Deliberate interleave: a second stager completes WHILE the first is
    mid-build.  The slow loser must not clobber the winner's index, must
    return the winner's path, and must clean up its own copy."""
    root, sf = scratch

    def fast(idx):
        _write(idx, "WINNER")

    def slow(idx):
        # the concurrent stager finishes first, mid-way through our build
        inner = _staged_index(None, sf, "documents", "race_idx", "sub", fast)
        assert open(os.path.join(inner, "sub", "data")).read() == "WINNER"
        _write(idx, "LOSER")

    out = _staged_index(None, sf, "documents", "race_idx", "sub", slow)
    assert open(os.path.join(out, "sub", "data")).read() == "WINNER"
    assert os.path.exists(os.path.join(out, "sub", "_SUCCESS"))
    assert _no_leftover_stage_dirs(root)


def test_legacy_partial_is_replaced(scratch):
    """A pre-r19 crash could leave a HALF-BUILT dir at the final path (no
    completeness marker).  The stager must replace it, not trip on it."""
    root, sf = scratch
    # compute the final path by staging once, then damage it
    out = _staged_index(None, sf, "documents", "part_idx", "sub", lambda i: _write(i, "V1"))
    os.remove(os.path.join(out, "sub", "_SUCCESS"))
    out2 = _staged_index(None, sf, "documents", "part_idx", "sub", lambda i: _write(i, "V2"))
    assert out2 == out
    assert open(os.path.join(out2, "sub", "data")).read() == "V2"
    assert os.path.exists(os.path.join(out2, "sub", "_SUCCESS"))
    assert _no_leftover_stage_dirs(root)


def _proc_stage(args):
    sf, payload = args
    out = _staged_index(None, sf, "documents", "mp_idx", "sub", lambda i: _write(i, payload))
    with open(os.path.join(out, "sub", "data")) as fh:
        return out, fh.read()


def test_two_processes_one_index(scratch):
    """Two real processes staging the same fingerprint concurrently: both
    return the same path, the index is complete, its content is one
    process's intact payload (never a mix), and no stage dirs leak."""
    root, sf = scratch
    with mp.get_context("spawn").Pool(2) as pool:
        results = pool.map(_proc_stage, [(sf, "AAAA"), (sf, "BBBB")])
    paths = {p for p, _ in results}
    contents = {c for _, c in results}
    assert len(paths) == 1
    assert contents <= {"AAAA", "BBBB"}
    final = open(os.path.join(paths.pop(), "sub", "data")).read()
    assert final in ("AAAA", "BBBB")
    assert _no_leftover_stage_dirs(root)
