"""Scale-up corpus generator for the sf1 scale proof.

Replicates an existing driver-generated SF corpus K times (default 10:
sf0.1 -> sf1) with FK-consistent key-space offsets, so every query that is
correct at the source SF runs unchanged at the scaled SF:

- dimension tables (region, nation) are copied as-is;
- every entity key (custkey, orderkey, partkey, suppkey, event_id, user_id,
  doc_id, vec_id) is offset by ``replica * (max_key + 1)`` and every foreign
  key by the matching offset, so joins hit exactly one replica;
- document text is perturbed per replica with a Caesar substitution cipher
  on letters (shift by the replica index).  A bijective character map
  preserves the corpus's WITHIN-replica shingle/token statistics exactly
  (doc-pair Jaccard is invariant under a bijection of the symbol space)
  while making cross-replica shingle sets disjoint — so the scaled corpus
  has 10x the docs and ~10x the true near-dup pairs, not more.  Two
  earlier schemes measured the wrong workload: a naive row copy plants
  10x organic duplicates; suffixing every word with the replica index
  makes every doc in a replica share the suffix shingles, which inflated
  LSH candidates 191x instead of 10x at sf1;
- embeddings are rotated by the replica index (norm-preserving) so ANN
  queries see distinct vectors.

The output directory is git-ignored scratch (~170 MB at sf1); the artifact
that matters is BENCH_sf1.json from tools/scale_proof.py.

Usage: python tools/gen_scale.py [src_sf_dir] [dst_dir] [k]
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES_COPY = ["region", "nation"]

def generate(src: str, dst: str, k: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}/{t}.parquet')"
        )

    offs = {
        name: con.execute(f"SELECT max({key}) + 1 FROM {name}").fetchone()[0]
        for name, key in [
            ("customer", "c_custkey"),
            ("supplier", "s_suppkey"),
            ("part", "p_partkey"),
            ("orders", "o_orderkey"),
            ("events", "event_id"),
            ("documents", "doc_id"),
            ("embeddings", "vec_id"),
        ]
    }
    # events.user_id is an FK into customer.c_custkey, so replicas must
    # shift it by the CUSTOMER offset — a per-replica max(user_id)+1 shift
    # would point replicas 1..k-1's events at replica 0's customers (it
    # happened to alias cleanly at k=10 only because 10 * 1500 == 15000).
    max_uid = con.execute("SELECT max(user_id) FROM events").fetchone()[0]
    assert max_uid < offs["customer"], (
        f"user_id domain ({max_uid}) exceeds the customer key space "
        f"({offs['customer']}) — offsetting by the customer offset would collide"
    )

    def emit(name: str, replica_select: str) -> None:
        union = " UNION ALL ".join(replica_select.format(r=r) for r in range(k))
        con.execute(
            f"COPY ({union}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{name}.parquet')").fetchone()[0]
        print(f"  {name}: {n} rows")

    for t in TABLES_COPY:
        con.execute(f"COPY (SELECT * FROM {t}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"  {t}: copied")

    emit(
        "customer",
        f"SELECT c_custkey + {{r}} * {offs['customer']} AS c_custkey, c_name, "
        "c_nationkey, c_acctbal, c_mktsegment FROM customer",
    )
    emit(
        "supplier",
        f"SELECT s_suppkey + {{r}} * {offs['supplier']} AS s_suppkey, s_name, "
        "s_nationkey, s_acctbal FROM supplier",
    )
    emit(
        "part",
        f"SELECT p_partkey + {{r}} * {offs['part']} AS p_partkey, p_name, p_brand, "
        "p_type, p_size, p_retailprice FROM part",
    )
    emit(
        "orders",
        f"SELECT o_orderkey + {{r}} * {offs['orders']} AS o_orderkey, "
        f"o_custkey + {{r}} * {offs['customer']} AS o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority FROM orders",
    )
    emit(
        "lineitem",
        f"SELECT l_orderkey + {{r}} * {offs['orders']} AS l_orderkey, "
        f"l_partkey + {{r}} * {offs['part']} AS l_partkey, "
        f"l_suppkey + {{r}} * {offs['supplier']} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate FROM lineitem",
    )
    emit(
        "events",
        f"SELECT event_id + {{r}} * {offs['events']} AS event_id, ts, "
        f"user_id + {{r}} * {offs['customer']} AS user_id, event_type, value, props FROM events",
    )
    # replica 0 keeps the original text byte-for-byte; replicas >0 apply a
    # shift-r letter cipher (translate) — length-preserving, so n_chars
    # carries over unchanged
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()

    def cipher(r: int) -> str:
        plain = lower + upper
        shifted = lower[r:] + lower[:r] + upper[r:] + upper[:r]
        return f"translate(text, '{plain}', '{shifted}')"

    doc_selects = [
        f"SELECT doc_id + {r} * {offs['documents']} AS doc_id, "
        + ("text" if r == 0 else cipher(r))
        + f" AS text, lang, source, n_chars FROM documents"
        for r in range(k)
    ]
    con.execute(
        "COPY ("
        + " UNION ALL ".join(doc_selects)
        + f") TO '{dst}/documents.parquet' (FORMAT PARQUET)"
    )
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/documents.parquet')"
    ).fetchone()[0]
    print(f"  documents: {n} rows")
    emit(
        "embeddings",
        f"SELECT vec_id + {{r}} * {offs['embeddings']} AS vec_id, "
        "CASE WHEN {r} = 0 THEN embedding ELSE "
        "list_concat(embedding[{r}+1:], embedding[1:{r}]) END AS embedding, "
        "label FROM embeddings",
    )


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    print(f"generating {dst} = {k}x {src}")
    generate(src, dst, k)
