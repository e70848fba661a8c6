"""Python UDF / UDAF / UDTF surface (SURVEY.md §2.11).

The reference's per-row Python logic (validation loops, API-call
enrichment) maps to Spark's Python UDF family. Design rules:

- UDFs are the slow path — everything that CAN be a built-in function
  elsewhere in this engine IS one; this module exists to cover the
  cases where genuinely-custom Python logic is required.
- Arrow everywhere: pandas UDFs (Series→Series), grouped agg, grouped
  map (applyInPandas) and mapInPandas all cross the JVM↔Python boundary
  in columnar Arrow batches, not row-at-a-time pickling.
- The enrichment pattern (udf_map_partitions) simulates the reference's
  entity-api lookup with a deterministic in-process table: connection
  setup happens once per BATCH, not once per row — the pattern that
  matters when the lookup is a real service client at scale.
"""

from __future__ import annotations

import pandas as pd
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from manual_data_ingest_spark.io import load_table
from manual_data_ingest_spark.functions.rounding import rnd, sql_rnd
from manual_data_ingest_spark.registry import register

_PRIORITY_RANK = {"1-URGENT": 1, "2-HIGH": 2, "3-MEDIUM": 3,
                  "4-NOT SPECIFIED": 4, "5-LOW": 5}


@register("udf_python_scalar", """
SELECT o_orderkey,
       CASE o_orderpriority
            WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
            WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
            WHEN '5-LOW' THEN 5 ELSE -1 END AS priority_rank
FROM orders
""")
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # row-at-a-time Python UDF — the direct analog of the reference's
    # per-row script logic; kept ONLY as surface coverage (the same
    # classifier is a CASE expression in cond_funcs)
    @F.udf("int")
    def classify(priority: str) -> int:
        return _PRIORITY_RANK.get(priority, -1)

    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", classify("o_orderpriority").alias("priority_rank"))


@register("udf_pandas_scalar", f"""
SELECT l_orderkey, l_linenumber,
       {sql_rnd('''CASE WHEN l_quantity > 30 THEN l_extendedprice * 0.9
                        WHEN l_quantity > 10 THEN l_extendedprice * 0.95
                        ELSE l_extendedprice END''')} AS tiered_price
FROM lineitem
""")
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # vectorized Series→Series over Arrow batches (~10-100× the row UDF)
    @pandas_udf("double")
    def tiered(qty: pd.Series, price: pd.Series) -> pd.Series:
        return price.where(qty <= 30, price * 0.9) \
                    .where((qty > 30) | (qty <= 10), price * 0.95)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber",
                     rnd(tiered("l_quantity", "l_extendedprice"))
                     .alias("tiered_price"))


@register("udf_grouped_agg", f"""
SELECT l_partkey,
       {sql_rnd('''(sum(floor(l_extendedprice * 100 + 0.5)::BIGINT
                        * floor(l_quantity + 0.5)::BIGINT)::DOUBLE / 100.0)
                   / sum(floor(l_quantity + 0.5)::BIGINT)::DOUBLE''', 6)}
           AS weighted_avg_price
FROM lineitem
GROUP BY l_partkey
""")
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pandas UDAF (GROUPED_AGG): quantity-weighted average price per part.
    # Summation runs on exact scaled integers (price-cents × qty): float
    # sums are order-dependent and pandas (pairwise) vs DuckDB (sequential)
    # diverge in the last bit, which flips 6dp rounding on ~0.1% of groups.
    # Integer sums are exact → one identical IEEE division on both engines.
    # Partial aggregation does NOT apply to pandas UDAFs — all rows of a
    # group cross to Python — so keep group payloads bounded at scale.
    import numpy as np

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        # SQL-aggregate NULL semantics: pairs with a NULL side are
        # ignored; an all-NULL (or zero-weight) group yields NULL,
        # not a ZeroDivisionError (NULL-injection sweep finding)
        ok = price.notna() & qty.notna()
        cents = np.floor(price[ok].to_numpy() * 100 + 0.5).astype("int64")
        q = np.floor(qty[ok].to_numpy() + 0.5).astype("int64")
        qsum = int(q.sum())
        if qsum == 0:
            return None
        return (float((cents * q).sum()) / 100.0) / float(qsum)

    li = load_table(spark, sf_dir, "lineitem")
    # r12: width of the Python stage = number of shuffle partitions
    # (no partial agg exists for a pandas UDAF — every group's rows
    # cross the boundary in the post-shuffle stage, and the ~20k
    # tiny-group Series slices are per-group Python overhead). The
    # bench protocol's data-sized shuffle constant (8 at sf0.1)
    # throttled that stage to 8 of 32 slots — sweep: 7.5 s warm.
    # Repartition by the grouping key to max(slots, shuffle
    # partitions): the aggregate reuses the hash distribution (no
    # second exchange), and at real scale shuffle partitions ≥ slots
    # so this is exactly the exchange the groupBy would insert anyway.
    n_py = max(spark.sparkContext.defaultParallelism,
               int(spark.conf.get("spark.sql.shuffle.partitions")))
    return (li.repartition(n_py, "l_partkey")
            .groupBy("l_partkey")
            .agg(rnd(wavg("l_extendedprice", "l_quantity"), 6)
                 .alias("weighted_avg_price")))


@register("udf_grouped_map", f"""
WITH sc AS (
  SELECT c_custkey, c_nationkey,
         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS c
  FROM customer
), m AS (
  SELECT c_nationkey,
         CAST(count(c) AS DOUBLE) AS n,
         CAST(sum(c) AS DOUBLE) AS sx,
         CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE) AS sxx
  FROM sc GROUP BY c_nationkey
)
SELECT c_custkey, sc.c_nationkey,
       CASE WHEN n >= 2 AND (sxx - sx * sx / n) > 0 THEN
         {sql_rnd('(c - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1))', 6)}
       END AS bal_zscore
-- null-safe join: the NULL-nationkey cohort is a group like any other
-- (Spark's groupBy keeps it; a bare equi-join dropped its rows)
FROM sc JOIN m ON sc.c_nationkey IS NOT DISTINCT FROM m.c_nationkey
""")
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    # group-map (applyInPandas): z-score normalization within nation —
    # the per-cohort normalization pattern. Whole groups cross to Python;
    # group count (25 nations) bounds parallelism, so at scale prefer the
    # window formulation unless logic is custom. Moments are exact
    # integer cents (python-int sums, overflow-proof) and the pandas
    # body evaluates the SAME IEEE op sequence as the oracle's combine,
    # so the 6dp rounding agrees at any magnitude (pandas' pairwise
    # mean/std drifted from DuckDB's window stddev on the numeric-edge
    # fixture); a zero-variance or single-row cohort yields NULL.
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        import numpy as np

        x = pdf["c_acctbal"]
        ok = x.notna()
        cents = np.floor(x[ok].to_numpy() * 100.0 + 0.5)
        n = float(len(cents))
        sx = float(sum(int(v) for v in cents))
        sxx = float(sum(int(v) * int(v) for v in cents))
        # Python-None for the NULL cells (a float NaN would cross
        # Arrow as NaN, not SQL NULL, and hash-mismatch the oracle)
        z: list = [None] * len(pdf)
        if n >= 2 and (sxx - sx * sx / n) > 0:
            denom = math.sqrt((sxx - sx * sx / n) / (n - 1))
            zv = np.floor((cents - sx / n) / denom * 1e6 + 0.5) / 1e6
            it = iter(zv.tolist())
            z = [next(it) if o else None for o in ok.tolist()]
        return pd.DataFrame({
            "c_custkey": pdf["c_custkey"],
            "c_nationkey": pdf["c_nationkey"],
            "bal_zscore": pd.Series(z, dtype="object"),
        })

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").applyInPandas(
        zscore, schema="c_custkey long, c_nationkey int, bal_zscore double")


@register("udf_map_partitions", """
SELECT c_custkey, c_nationkey,
       -- ((k % 5) + 5) % 5: POSITIVE mod. SQL % takes the dividend's
       -- sign, so a negative key would fall through to the ELSE arm
       -- while the Spark side's pandas `%` (floored, always positive
       -- for a positive modulus) buckets it — the numeric-edge sweep
       -- caught TIER-E vs TIER-C on k = -13.
       CASE WHEN c_nationkey IS NULL THEN NULL
            WHEN ((c_nationkey % 5) + 5) % 5 = 0 THEN 'TIER-A'
            WHEN ((c_nationkey % 5) + 5) % 5 = 1 THEN 'TIER-B'
            WHEN ((c_nationkey % 5) + 5) % 5 = 2 THEN 'TIER-C'
            WHEN ((c_nationkey % 5) + 5) % 5 = 3 THEN 'TIER-D'
            ELSE 'TIER-E' END AS tier
FROM customer
""")
def udf_map_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # partition-wise enrichment: the reference's per-row entity-api call,
    # restructured as one lookup-table load per PARTITION + vectorized
    # merge per Arrow batch (deterministic dict stands in for the service)
    tiers = {0: "TIER-A", 1: "TIER-B", 2: "TIER-C", 3: "TIER-D", 4: "TIER-E"}

    def enrich(batches):
        lookup = pd.Series(tiers)  # "connect" once per partition
        for pdf in batches:
            pdf = pdf.copy()
            pdf["tier"] = (pdf["c_nationkey"] % 5).map(lookup)
            yield pdf[["c_custkey", "c_nationkey", "tier"]]

    c = load_table(spark, sf_dir, "customer")
    return c.mapInPandas(enrich, schema="c_custkey long, c_nationkey int, tier string")


@register("udtf_tokenize", """
SELECT doc_id, i AS pos, l[i] AS token
FROM (SELECT doc_id, string_split(text, ' ') AS l
      FROM documents WHERE doc_id < 50),
     LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) u
""")
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Python UDTF (Spark 4): one-to-many expansion text → (pos, token).
    # Bounded to 50 docs: UDTF output crosses the Python boundary row-wise.
    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            # NULL-only guard: an EMPTY doc tokenizes to one empty
            # token (`''.split(' ')` == ['']) exactly like the
            # oracle's string_split — `if text:` silently dropped it
            if text is not None:
                for i, tok in enumerate(text.split(" "), start=1):
                    yield i, tok

    spark.udtf.register("mdis_tokenize", Tokenize)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("mdis_udtf_docs")
    return spark.sql("""
        SELECT doc_id, t.pos, t.token
        FROM mdis_udtf_docs, LATERAL mdis_tokenize(text) t
    """)


@register("udf_arrow_scalar", """
SELECT o_orderkey,
       CASE o_orderpriority
            WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
            WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
            WHEN '5-LOW' THEN 5 ELSE -1 END AS priority_rank
FROM orders
""")
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark 4's Arrow-optimized scalar UDF (useArrow=True): same per-row
    # Python signature as udf_python_scalar but serialized in Arrow
    # batches instead of pickled rows — the drop-in migration path for
    # the reference's row-wise logic before rewriting to pandas_udf
    @F.udf("int", useArrow=True)
    def classify(priority: str) -> int:
        return _PRIORITY_RANK.get(priority, -1)

    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", classify("o_orderpriority").alias("priority_rank"))


@register("udf_map_arrow", """
SELECT doc_id,
       length(text)::BIGINT AS n_chars_arrow,
       len(string_split(text, ' '))::BIGINT AS n_tokens_arrow
FROM documents
""")
def udf_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapInArrow`: the zero-copy tier below mapInPandas — the
    function receives raw `pyarrow.RecordBatch`es and computes with
    Arrow kernels directly, skipping the Arrow→pandas conversion
    entirely (no object boxing, no index building). For
    string-heavy columns that conversion is the dominant cost of a
    pandas UDF, so this is the right tier for byte/str analytics at
    100 TB; the pandas tier remains right when the logic needs pandas
    semantics.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for b in batches:
            text = b.column(b.schema.get_field_index("text"))
            yield pa.RecordBatch.from_arrays(
                [b.column(b.schema.get_field_index("doc_id")),
                 pc.cast(pc.utf8_length(text), pa.int64()),
                 pc.cast(pc.list_value_length(
                     pc.split_pattern(text, " ")), pa.int64())],
                names=["doc_id", "n_chars_arrow", "n_tokens_arrow"])

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(
        stats, "doc_id long, n_chars_arrow long, n_tokens_arrow long")


@register("udtf_tokenize_arrow", """
SELECT doc_id, i AS pos, l[i] AS token
FROM (SELECT doc_id, string_split(text, ' ') AS l
      FROM documents WHERE doc_id < 50),
     LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) u
""")
def udtf_tokenize_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDTF (Spark 4, `useArrow=True`): identical
    one-to-many expansion as `udtf_tokenize`, but rows cross the Python
    boundary in Arrow record batches instead of pickled tuples — the
    same ~10× serialization win the scalar tier measured
    (`udf_python_scalar` vs `udf_arrow_scalar`), now for table
    functions. Same oracle as the row twin: the contract is the
    expansion, the transport is the strategy under test.
    """
    @udtf(returnType="pos int, token string", useArrow=True)
    class TokenizeArrow:
        def eval(self, text: str):
            # NULL-only guard: an EMPTY doc tokenizes to one empty
            # token (`''.split(' ')` == ['']) exactly like the
            # oracle's string_split — `if text:` silently dropped it
            if text is not None:
                for i, tok in enumerate(text.split(" "), start=1):
                    yield i, tok

    spark.udtf.register("mdis_tokenize_arrow", TokenizeArrow)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("mdis_udtf_docs_arrow")
    return spark.sql("""
        SELECT doc_id, t.pos, t.token
        FROM mdis_udtf_docs_arrow, LATERAL mdis_tokenize_arrow(text) t
    """)


@register("udf_pandas_scalar_iter", """
SELECT doc_id,
       length(regexp_replace(text, '[0-9]', '', 'g')) AS n_nondigit
FROM documents WHERE text IS NOT NULL
""")
def udf_pandas_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR_ITER pandas UDF (Iterator[Series] → Iterator[Series]) —
    the API-surface member its Series→Series sibling can't substitute:
    the generator body runs ONCE per partition, so expensive setup
    (here a compiled regex; in production a tokenizer or ONNX model)
    is paid per-TASK, not per-batch. This is the shape every
    model-scoring UDF at 100 TB should take — per-batch model loading
    is the classic 10× regression.

    Semantics kept trivially oracle-able (non-digit char count) so the
    comparison isolates the API path, same policy as
    `udf_python_scalar` vs `cond_funcs`.
    """
    @pandas_udf("long")
    def nondigit_len(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import re
        digit = re.compile(r"[0-9]")  # compiled once per partition/task
        for texts in it:
            yield texts.map(
                lambda t: len(digit.sub("", t)) if t is not None else None)

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    return d.select("doc_id", nondigit_len("text").alias("n_nondigit"))


@register("udf_sql_function", f"""
SELECT o_orderkey,
       {sql_rnd('''o_totalprice * CASE WHEN o_orderpriority
                       IN ('1-URGENT', '2-HIGH') THEN 1.1 ELSE 1.0 END''')}
           AS uplift_price
FROM orders
""")
def udf_sql_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDF (Spark 4 `CREATE FUNCTION ... RETURN <expr>`) —
    the API-surface member that makes the whole Python-UDF-is-the-slow-
    path rule actionable: a named, reusable function that the analyzer
    INLINES into the calling plan, so it costs exactly what the raw
    expression costs. tests/test_plans.py pins the contract: the
    executed plan contains NO BatchEvalPython/ArrowEvalPython node and
    the function body's CASE expression appears inline in the Project,
    inside WholeStageCodegen — at 100 TB the difference between this
    and `udf_python_scalar` is the difference between codegen and a
    per-row Python round trip (~10-100x, measured on the pandas twin).

    Registered per-session with OR REPLACE (idempotent across the
    oracle sweep's repeated calls); the uplift arithmetic rides the
    repo's exact-IEEE rounding contract (functions/rounding.py).
    """
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION mdis_priority_uplift(
            price DOUBLE, pri STRING) RETURNS DOUBLE
        RETURN price * CASE WHEN pri IN ('1-URGENT', '2-HIGH')
                            THEN 1.1 ELSE 1.0 END""")
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        rnd(F.expr("mdis_priority_uplift(o_totalprice, o_orderpriority)"))
        .alias("uplift_price"))
