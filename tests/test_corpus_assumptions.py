"""Corpus invariants the oracle SQL depends on.

ORA_MULTIMODAL_FRAMES / ORA_MULTIMODAL_FEATURES (queries/llm.py) replay the
Spark side's *byte*-level frame chop / checksum as *character*-level SQL —
equivalent only while the documents corpus is pure ASCII (byte == code
point, octet_length == length).  A regenerated corpus with any non-ASCII
text would silently break hash parity; this test turns that silent break
into a loud one.  (The resize oracle was made unicode-exact instead and
does not depend on this.)
"""

import glob

import pyarrow.compute as pc
import pyarrow.parquet as pq


def test_documents_text_is_ascii_at_all_tested_sfs():
    checked = 0
    for path in sorted(glob.glob("/root/testdata/sf*/documents.parquet")):
        col = pq.read_table(path, columns=["text"]).column("text")
        all_ascii = pc.all(pc.string_is_ascii(col.drop_null())).as_py()
        assert all_ascii, (
            f"non-ASCII text in {path}: the frames/features oracles assume "
            "byte==codepoint"
        )
        checked += 1
    assert checked >= 2, "expected at least sf0.001 and sf0.01 corpora"


def test_documents_text_is_never_null():
    """fim_transform's sample column concatenates text slices with sentinel
    literals; Spark concat returns NULL if any argument is NULL while
    DuckDB concat skips NULLs — an engine divergence that is unreachable
    only while the corpus guarantees non-NULL text (on a nullable corpus,
    coalesce(text, '') first)."""
    checked = 0
    for path in sorted(glob.glob("/root/testdata/sf*/documents.parquet")):
        col = pq.read_table(path, columns=["text"]).column("text")
        assert col.null_count == 0, f"NULL text in {path}"
        checked += 1
    assert checked >= 2
