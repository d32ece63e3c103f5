"""UDF family + map-typed scalar functions — SURVEY.md §2.5 rows the
reference lacks entirely (its one good property: zero Python on executors;
the engine keeps that for relational queries and confines Python to
Arrow-batched pandas UDFs).

Performance notes (the 100 TB posture):
- ``pandas_udf`` scalar/grouped-agg move data executor->Python via Arrow in
  columnar batches (~10-100x over row-at-a-time pickling);
- ``applyInPandas`` shuffles once on the grouping key, then runs one Python
  call per group;
- the row-at-a-time ``F.udf`` entry exists ONLY as operator-inventory parity
  and is documented as the slow path — never use it where a builtin exists.

Determinism discipline for oracles: UDF bodies stick to elementwise float
math and order-insensitive group reductions (min/max), never accumulation
order-dependent sums, so DuckDB replays values bit-exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..sources.files import load_table
from . import QuerySpec


# --- pandas_udf: scalar ------------------------------------------------------

# NOTE: pandas_udf wrappers are created INSIDE the query functions, not at
# module level — Python workers re-import this module to unpickle the UDTF
# class below, and a module-level @pandas_udf("ddl string") decorator needs
# an active SparkContext to parse its return type, which workers don't have.


def _quality_score_fn(text: pd.Series) -> pd.Series:
    """Vectorized text-quality score: elementwise double math only
    (bit-stable across engines)."""
    n_chars = text.str.len().astype("float64")
    n_words = text.str.count(" ").astype("float64") + 1.0
    return n_chars / n_words - 3.0


def q_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf over documents: Arrow batches in, Arrow batches
    out, no shuffle — the plan keeps the parquet scan partitioning."""
    quality_score = pandas_udf(_quality_score_fn, "double")
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score("text").alias("quality"))


ORA_PANDAS_SCALAR = """
SELECT doc_id,
       CAST(length(text) AS DOUBLE)
         / (CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) + 1.0)
         - 3.0 AS quality
FROM documents
"""


# --- pandas_udf: grouped aggregate ------------------------------------------


def _value_spread_fn(v: pd.Series) -> float:
    """Grouped-agg pandas_udf: max-min spread (order-insensitive, so the
    result is bit-identical regardless of row order within the group)."""
    return float(v.max() - v.min())


def _group_count_fn(v: pd.Series) -> int:
    """Spark disallows mixing pandas UDAFs with JVM aggregates in one agg
    (INVALID_PANDAS_UDF_PLACEMENT), so the count is a pandas UDAF too."""
    return int(len(v))


def q_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf: one shuffle on the group key, then a
    single Arrow batch per group into Python."""
    value_spread = pandas_udf(_value_spread_fn, "double")
    group_count = pandas_udf(_group_count_fn, "long")
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            value_spread("value").alias("value_spread"),
            group_count("value").alias("n"),
        )
        .orderBy("event_type")
    )


ORA_PANDAS_GROUPED_AGG = """
SELECT event_type, MAX(value) - MIN(value) AS value_spread, COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- applyInPandas: grouped map ---------------------------------------------


def q_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas (grouped map): per-user min-centering of event values.
    One shuffle on user_id; each group processed as a pandas frame.
    Subtraction against the group min is elementwise -> bit-stable."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.copy()
        out["value_centered"] = pdf["value"] - pdf["value"].min()
        return out[["event_id", "user_id", "value_centered"]]

    return ev.groupBy("user_id").applyInPandas(
        center, "event_id long, user_id long, value_centered double"
    )


ORA_APPLY_IN_PANDAS = """
SELECT event_id, user_id,
       value - MIN(value) OVER (PARTITION BY user_id) AS value_centered
FROM events
"""


# --- cogrouped applyInPandas: two-sided grouped map ---------------------------


def q_cogroup_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup(...).applyInPandas — the TWO-SIDED grouped map (§2.5 UDF
    family completion): each user's purchases and clicks arrive as a PAIR
    of pandas frames and the function computes, per purchase, how many of
    the user's clicks happened at or before it (an as-of count via
    searchsorted on the sorted click times).  This is the API for custom
    per-key merges that SQL joins express poorly (session stitching,
    trajectory alignment) — here deliberately SQL-expressible so the
    count has an exact oracle.

    Scale shape: ONE co-partitioned shuffle on user_id for both sides,
    then one Arrow-batched Python call per key — never a row-at-a-time
    UDF, and per-key memory is the key's own events."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")

    def asof_count(p: pd.DataFrame, c: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return pd.DataFrame(
                {
                    "purchase_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "n_clicks_before": pd.Series(dtype="int64"),
                }
            )
        import numpy as np

        cts = np.sort(c["ts"].values)
        n_before = np.searchsorted(cts, p["ts"].values, side="right")
        return pd.DataFrame(
            {
                "purchase_id": p["event_id"].values,
                "user_id": p["user_id"].values,
                "n_clicks_before": n_before.astype("int64"),
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            asof_count, "purchase_id long, user_id long, n_clicks_before long"
        )
    )


ORA_COGROUP_APPLY = """
SELECT p.event_id AS purchase_id, p.user_id,
       (SELECT COUNT(*) FROM events c
         WHERE c.event_type = 'click' AND c.user_id = p.user_id
           AND c.ts <= p.ts) AS n_clicks_before
FROM events p WHERE p.event_type = 'purchase'
"""


# --- row-at-a-time UDF (inventory parity; the documented slow path) ----------


def q_python_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — registered for §2.5 inventory parity ONLY.
    Every value here is computable with builtins (see text_tokens); at scale
    this shape pays per-row serialization and must not appear in hot paths.
    """
    ev = load_table(spark, sf_dir, "events")
    # NULL in -> NULL out, matching the oracle's substring(upper(NULL))
    tag = F.udf(lambda t: None if t is None else t.upper()[:3], "string")
    return ev.select("event_id", tag("event_type").alias("type_tag"))


ORA_PYTHON_UDF = """
SELECT event_id, substring(upper(event_type), 1, 3) AS type_tag FROM events
"""


# --- mapInArrow: raw Arrow batch access --------------------------------------


def q_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the lowest-overhead Python hook — RecordBatches in/out
    with no pandas conversion.  Used when the Python side is itself
    Arrow-native (tokenizers, model featurizers); compute here is pyarrow
    vector ops, elementwise -> bit-stable."""
    import pyarrow as pa

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")

    def double_value(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("event_id"),
                    pa.compute.multiply(batch.column("value"), pa.scalar(2.0)),
                ],
                names=["event_id", "value_x2"],
            )

    return ev.mapInArrow(double_value, "event_id long, value_x2 double")


ORA_MAP_IN_ARROW = """
SELECT event_id, value * 2.0 AS value_x2 FROM events
"""


# --- applyInArrow: grouped map without pandas --------------------------------


def q_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy(...).applyInArrow — the Spark 4 GROUPED twin of mapInArrow:
    one shuffle on the key, then each group arrives as a raw pyarrow Table
    (no pandas materialization, no index/copy overhead — the fast path when
    the per-group compute is itself Arrow-native).  Reductions here are
    min/max/count: order-insensitive, so the result is bit-stable however
    Spark packs the group's batches."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")

    def spread(table: pa.Table) -> pa.Table:
        v = table.column("value")
        return pa.table(
            {
                "event_type": pa.array([table.column("event_type")[0].as_py()], pa.string()),
                "vmin": pa.array([pc.min(v).as_py()], pa.float64()),
                "vmax": pa.array([pc.max(v).as_py()], pa.float64()),
                "n": pa.array([table.num_rows], pa.int64()),
            }
        )

    return (
        ev.groupBy("event_type")
        .applyInArrow(spread, "event_type string, vmin double, vmax double, n long")
        .orderBy("event_type")
    )


ORA_APPLY_IN_ARROW = """
SELECT event_type, MIN(value) AS vmin, MAX(value) AS vmax, COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- UDTF: table function ----------------------------------------------------


class _TokenizeUDTF:
    """Python UDTF: one input row -> N output rows (doc_id, pos, tok) for
    tokens starting with 'a'.  The UDF-family's table-function member; at
    scale it's a narrow flatMap (no shuffle), Arrow-batched like other
    Python UDFs on Spark 4."""

    def eval(self, doc_id: int, text: str):
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            if tok.startswith("a"):
                yield doc_id, i, tok


def q_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF via LATERAL correlated call — the SQL-native way to explode a
    row into a computed table."""
    from pyspark.sql.functions import udtf

    tokenize = udtf(_TokenizeUDTF, returnType="doc_id long, pos int, tok string")
    spark.udtf.register("tokenize_a", tokenize)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.tok "
        "FROM docs_for_udtf d, LATERAL tokenize_a(d.doc_id, d.text) t"
    )


ORA_PYTHON_UDTF = """
WITH exploded AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS idx
  FROM documents
)
SELECT doc_id, CAST(idx - 1 AS INT) AS pos, tok
FROM exploded WHERE tok LIKE 'a%'
"""


# --- UDTF with TABLE argument: per-partition stateful table function ---------


class _ProfileDocsUDTF:
    """TABLE-argument UDTF (Spark 4): the whole relation is the argument —
    `profile_docs(TABLE(v) PARTITION BY source ORDER BY doc_id)` — and one
    class INSTANCE consumes each partition's rows in order, emitting its
    summary from terminate().  The API for ordered per-group stateful
    passes that SQL aggregates express poorly (legal-hold scans, session
    reconstruction, sequence validation); here deliberately
    aggregate-expressible so the result has an exact oracle.  Scale shape:
    one shuffle on the PARTITION BY key (exactly a grouped map), state is
    one accumulator per key, Arrow-batched row delivery."""

    def __init__(self) -> None:
        self.src = None
        self.n = 0
        self.chars = 0
        self.first = None
        self.last = None

    def eval(self, row):
        self.src = row["source"]
        self.n += 1
        self.chars += row["n_chars"]
        if self.first is None:
            self.first = row["doc_id"]
        self.last = row["doc_id"]

    def terminate(self):
        if self.src is not None:
            yield self.src, self.n, self.chars, self.first, self.last


def q_python_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register + call the table-argument UDTF: PARTITION BY routes each
    source's rows to one instance, ORDER BY makes first/last deterministic."""
    from pyspark.sql.functions import udtf

    profile = udtf(
        _ProfileDocsUDTF,
        returnType=(
            "source string, n_docs long, sum_chars long, "
            "first_doc long, last_doc long"
        ),
    )
    spark.udtf.register("profile_docs", profile)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "docs_for_table_udtf"
    )
    return spark.sql(
        "SELECT * FROM profile_docs(TABLE(docs_for_table_udtf) "
        "PARTITION BY source ORDER BY doc_id) ORDER BY source"
    )


ORA_PYTHON_UDTF_TABLE_ARG = """
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM documents GROUP BY source ORDER BY source
"""


# --- map-typed functions -----------------------------------------------------


def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip: create_map -> map_concat -> keys/values/access.
    The oracle computes the same final columns relationally — what's under
    test is Spark's map semantics (ordering of map_keys follows insertion
    order of create_map)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    m2 = F.map_concat(m, F.create_map(F.lit("eid"), F.col("event_id").cast("string")))
    return ev.select(
        "event_id",
        m2.getItem("type").alias("m_type"),
        m2.getItem("uid").alias("m_uid"),
        F.map_keys(m2).getItem(2).alias("third_key"),
        F.size(F.map_values(m2)).alias("n_vals"),
    )


ORA_MAP_FUNCTIONS = """
SELECT event_id,
       event_type AS m_type,
       CAST(user_id AS VARCHAR) AS m_uid,
       'eid' AS third_key,
       3 AS n_vals
FROM events
"""


def q_map_entries_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_entries + explode: map -> rows (the relational escape hatch for
    map columns; at scale this is a narrow flatMap, no shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return (
        ev.select("event_id", F.explode(m).alias("k", "v"))
        .orderBy("event_id", "k")
    )


ORA_MAP_ENTRIES = """
SELECT event_id, k, v FROM (
  SELECT event_id, 'type' AS k, event_type AS v FROM events
  UNION ALL
  SELECT event_id, 'uid' AS k, CAST(user_id AS VARCHAR) AS v FROM events
) ORDER BY event_id, k
"""


QUERIES: dict[str, QuerySpec] = {
    "pandas_udf_scalar": QuerySpec(
        q_pandas_scalar, ORA_PANDAS_SCALAR, "scalar pandas_udf (Arrow-batched)"
    ),
    "pandas_udf_grouped_agg": QuerySpec(
        q_pandas_grouped_agg, ORA_PANDAS_GROUPED_AGG, "grouped-agg pandas_udf"
    ),
    "apply_in_pandas": QuerySpec(
        q_apply_in_pandas, ORA_APPLY_IN_PANDAS, "applyInPandas grouped map"
    ),
    "cogroup_apply_in_pandas": QuerySpec(
        q_cogroup_apply_in_pandas,
        ORA_COGROUP_APPLY,
        "cogrouped applyInPandas two-sided merge (per-key as-of count)",
    ),
    "python_udf_scalar": QuerySpec(
        q_python_udf_scalar, ORA_PYTHON_UDF, "row-at-a-time UDF (inventory parity)"
    ),
    "python_udtf": QuerySpec(
        q_python_udtf, ORA_PYTHON_UDTF, "Python UDTF via LATERAL call"
    ),
    "python_udtf_table_arg": QuerySpec(
        q_python_udtf_table_arg,
        ORA_PYTHON_UDTF_TABLE_ARG,
        "TABLE-argument UDTF (PARTITION BY / ORDER BY per-group stateful pass)",
    ),
    "map_in_arrow": QuerySpec(
        q_map_in_arrow, ORA_MAP_IN_ARROW, "raw Arrow RecordBatch transform"
    ),
    "apply_in_arrow": QuerySpec(
        q_apply_in_arrow, ORA_APPLY_IN_ARROW, "grouped applyInArrow (pandas-free grouped map)"
    ),
    "map_functions": QuerySpec(
        q_map_functions, ORA_MAP_FUNCTIONS, "MapType create/concat/access"
    ),
    "map_entries_explode": QuerySpec(
        q_map_entries_explode, ORA_MAP_ENTRIES, "map -> rows via explode"
    ),
}
