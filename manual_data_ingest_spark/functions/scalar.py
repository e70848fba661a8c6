"""Scalar functions: string / date / math / conditional (SURVEY.md §2.8).

Reference behavior reconstructed: name normalization, ID parsing,
pattern cleanup, date normalization, vocabulary mapping — the cell-level
cleanup that dominates curator-sheet ETL. All JVM-side built-ins (whole-
stage codegen); zero Python UDFs in this module.

Dialect-parity notes are inline; the verified divergences (SURVEY.md
§2.14): Spark dayofweek(Sunday)=1 vs DuckDB 0 — oracle adds 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from manual_data_ingest_spark.io import load_table
from manual_data_ingest_spark.functions.rounding import rnd, sql_rnd
from manual_data_ingest_spark.registry import register


@register("str_basic", """
SELECT p_partkey,
       upper(replace(p_name, 'ß', 'SS')) AS name_upper,
       lower(p_brand)                   AS brand_lower,
       length(p_name)                   AS name_len,
       lpad(p_type, 20, '*')            AS type_padded,
       concat_ws('|', p_brand, p_type)  AS brand_type,
       substring(p_name, 1, 10)         AS name_prefix,
       trim('  ' || p_brand || '  ')    AS brand_trimmed
FROM part
""")
def str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # upper() pre-expands ß explicitly: Java/Spark apply the FULL
    # unicode case mapping (ß → SS, string may grow), DuckDB the
    # SIMPLE 1:1 mapping (ß → U+1E9E ẞ) — the one full-folding char
    # the adversarial fixture carries is normalized identically on
    # both engines so the contract is engine-independent.
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.replace(F.col("p_name"), F.lit("ß"), F.lit("SS")))
        .alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.lpad("p_type", 20, "*").alias("type_padded"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  ")))
        .alias("brand_trimmed"))


@register("str_split_extract", """
SELECT c_custkey,
       string_split(c_name, '#')[1] AS name_head,
       string_split(c_name, '#')[2] AS name_id
FROM customer
""")
def str_split_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # '#'-suffixed curator IDs → parse pieces (1-based on both engines:
    # DuckDB list index, Spark element_at). try_element_at, not
    # element_at: a name WITHOUT the '#' yields a 1-element array, and
    # out-of-range access is NULL in DuckDB but an ANSI throw in Spark
    # (adversarial sweep: whitespace-only names crashed the query).
    c = load_table(spark, sf_dir, "customer")
    toks = F.split("c_name", "#")
    return c.select("c_custkey",
                    F.try_element_at(toks, F.lit(1)).alias("name_head"),
                    F.try_element_at(toks, F.lit(2)).alias("name_id"))


@register("str_regexp", """
SELECT s_suppkey,
       regexp_extract(s_name, '([0-9]+)$', 1)     AS name_num,
       regexp_replace(s_name, '[aeiouAEIOU]', '', 'g') AS name_novowel
FROM supplier
""")
def str_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    # POSIX-simple patterns only (Java vs RE2 dialect divergence);
    # NB DuckDB regexp_replace is first-match unless 'g' — Spark's is
    # always global, so the oracle must pass the 'g' flag.
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.regexp_extract("s_name", r"([0-9]+)$", 1).alias("name_num"),
        F.regexp_replace("s_name", r"[aeiouAEIOU]", "").alias("name_novowel"))


@register("str_fuzzy", """
SELECT c_custkey, s_suppkey,
       levenshtein(regexp_replace(c_name, '[^\\x20-\\x7e]', '', 'g'),
                   regexp_replace(s_name, '[^\\x20-\\x7e]', '', 'g'))
           AS edit_dist
FROM customer CROSS JOIN supplier
WHERE c_custkey <= 20
""")
def str_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fuzzy matching of curator-typed names on a bounded candidate set;
    # at scale the cross join is blocked (by prefix/length bucket) first.
    # Distance is over the ASCII PROJECTION of the names (the standard
    # translit/normalize step before edit distance): levenshtein UNITS
    # are engine-specific outside ASCII — DuckDB counts UTF-8 BYTES,
    # Spark counts UTF-16 units — so the portable contract strips
    # non-ASCII first, where byte = unit = codepoint.
    ascii_ = lambda col: F.regexp_replace(col, r"[^\x20-\x7e]", "")  # noqa: E731
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 20)
    s = load_table(spark, sf_dir, "supplier")
    return (c.crossJoin(F.broadcast(s))
            .select("c_custkey", "s_suppkey",
                    F.levenshtein(ascii_("c_name"), ascii_("s_name"))
                    .alias("edit_dist")))


@register("date_parts", """
SELECT o_orderkey,
       year(o_orderdate)                    AS o_year,
       quarter(o_orderdate)                 AS o_quarter,
       month(o_orderdate)                   AS o_month,
       dayofweek(o_orderdate) + 1           AS o_dow,
       date_trunc('month', o_orderdate)     AS o_month_start,
       last_day(o_orderdate)::TIMESTAMP     AS o_month_end,
       date_diff('day', o_orderdate::DATE, DATE '2000-01-01') AS days_to_y2k,
       (o_orderdate + INTERVAL 30 DAY)::TIMESTAMP AS due_date
FROM orders
""")
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # verified divergence: Spark dayofweek(Sunday)=1, DuckDB=0 → oracle +1.
    # DATE results are cast to TIMESTAMP on both sides so the hash sees one
    # type (midnight), not date-vs-datetime formatting drift.
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofweek("o_orderdate").alias("o_dow"),
        F.date_trunc("month", "o_orderdate").alias("o_month_start"),
        F.last_day("o_orderdate").cast("timestamp").alias("o_month_end"),
        F.datediff(F.lit("2000-01-01").cast("date"),
                   F.col("o_orderdate")).alias("days_to_y2k"),
        # interval addition, NOT date_add: Spark's date_add returns a
        # DATE (silently truncating any time-of-day the timestamp
        # carries) while DuckDB's + INTERVAL preserves it — invisible
        # on midnight-only fixtures, caught by the temporal-edge sweep
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .cast("timestamp").alias("due_date"))


@register("ts_funcs", """
SELECT event_id,
       hour(ts::TIMESTAMP)                       AS ev_hour,
       minute(ts::TIMESTAMP)                     AS ev_minute,
       epoch_us(ts::TIMESTAMP) // 1000000        AS ev_epoch_sec,
       date_trunc('second', ts::TIMESTAMP)       AS ev_second
FROM events
""")
def ts_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # events.ts arrives as ns→µs converted TimestampType (io.py); both
    # engines floor-divide epoch-µs for whole seconds (positive epochs).
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.hour("ts").alias("ev_hour"),
        F.minute("ts").alias("ev_minute"),
        (F.unix_micros("ts") / F.lit(1000000)).cast("long").alias("ev_epoch_sec"),
        F.date_trunc("second", "ts").alias("ev_second"))


@register("math_funcs", f"""
SELECT o_orderkey,
       abs(o_totalprice - 100000.0)          AS dist_100k,
       ceil(o_totalprice / 1000.0)::BIGINT   AS price_kilo_ceil,
       floor(o_totalprice / 1000.0)::BIGINT  AS price_kilo_floor,
       {sql_rnd('sqrt(o_totalprice)', 6)}    AS price_sqrt,
       {sql_rnd('ln(o_totalprice)', 6)}      AS price_ln,
       {sql_rnd('pow(o_totalprice, 0.25)', 6)} AS price_4rt
FROM orders
WHERE o_totalprice > 0
""")
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sqrt is IEEE-exact; ln/pow are libm (≤1 ulp divergence) → rounded 6dp
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    return o.select(
        "o_orderkey",
        F.abs(F.col("o_totalprice") - 100000.0).alias("dist_100k"),
        F.ceil(F.col("o_totalprice") / 1000.0).alias("price_kilo_ceil"),
        F.floor(F.col("o_totalprice") / 1000.0).alias("price_kilo_floor"),
        rnd(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        rnd(F.log(F.col("o_totalprice")), 6).alias("price_ln"),
        rnd(F.pow("o_totalprice", F.lit(0.25)), 6).alias("price_4rt"))


@register("cond_funcs", """
SELECT o_orderkey,
       CASE WHEN o_orderpriority = '1-URGENT' THEN 1
            WHEN o_orderpriority = '2-HIGH'   THEN 2
            WHEN o_orderpriority IN ('3-MEDIUM', '4-NOT SPECIFIED') THEN 3
            ELSE 4 END                                   AS urgency,
       coalesce(nullif(o_orderstatus, 'P'), 'PENDING')   AS status_clean,
       greatest(o_totalprice, 50000.0)                   AS price_floor50k,
       least(o_totalprice, 400000.0)                     AS price_cap400k
FROM orders
""")
def cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # controlled-vocabulary mapping — the reference's priority/status
    # normalization pattern
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
         .when(F.col("o_orderpriority") == "2-HIGH", 2)
         .when(F.col("o_orderpriority").isin("3-MEDIUM", "4-NOT SPECIFIED"), 3)
         .otherwise(4).alias("urgency"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING"))
         .alias("status_clean"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("price_floor50k"),
        F.least(F.col("o_totalprice"), F.lit(400000.0)).alias("price_cap400k"))


@register("scalar_try_funcs", f"""
SELECT o_orderkey,
       CASE WHEN o_custkey % 5 = 0 THEN NULL
            ELSE {{}} END AS safe_ratio,
       TRY_CAST(o_orderpriority AS INT) AS bad_cast,
       TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_digit
FROM orders
""".format("floor((o_totalprice / (o_custkey % 5)) * 100.0 + 0.5) / 100.0"))
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ANSI-mode error safety: Spark 4 runs with spark.sql.ansi.enabled
    # (strict SQL errors), so the engine's cleanup ops use the try_*
    # family — try_divide yields NULL on /0 instead of failing the job
    # (one poisoned row must never kill a 100 TB pipeline), try_cast
    # NULLs unparseable values. Oracles are the CASE-protected twins.
    # fan_out (r12): EVERY row's try_cast of a non-numeric priority
    # string fails-to-NULL — ~13 µs/row of parse-and-recover — and the
    # single-row-group orders file scans as one task (sweep: 1.9 s
    # warm single-threaded; io.fan_out docstring for the scale guard).
    from manual_data_ingest_spark.io import fan_out

    o = fan_out(load_table(spark, sf_dir, "orders"))
    div = F.expr("try_divide(o_totalprice, o_custkey % 5)")
    return o.select(
        "o_orderkey",
        rnd(div).alias("safe_ratio"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("bad_cast"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)")
        .alias("prio_digit"))


@register("date_parse_roundtrip", """
SELECT o_orderkey,
       strftime(o_orderdate, '%m/%d/%Y') AS us_text,
       strptime(strftime(o_orderdate, '%m/%d/%Y'), '%m/%d/%Y')::DATE AS reparsed,
       (strptime(strftime(o_orderdate, '%m/%d/%Y'), '%m/%d/%Y')::DATE
        = o_orderdate::DATE) AS roundtrip_ok
FROM orders
""")
def date_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # curator-sheet date normalization: format a date into the US text
    # form sheets arrive in, then parse it back with an explicit pattern
    # — schema-on-read with DECLARED formats, never inference. Pattern
    # languages differ per engine (Java 'MM/dd/yyyy' vs strftime
    # '%m/%d/%Y'); the SEMANTICS are oracle-verified identical.
    o = load_table(spark, sf_dir, "orders")
    us = F.date_format("o_orderdate", "MM/dd/yyyy")
    reparsed = F.to_date(us, "MM/dd/yyyy")
    return o.select(
        "o_orderkey",
        us.alias("us_text"),
        reparsed.alias("reparsed"),
        (reparsed == F.to_date("o_orderdate")).alias("roundtrip_ok"))


@register("bitwise_funcs", """
SELECT o_orderkey,
       o_orderkey & 255                 AS low_byte,
       o_orderkey | 15                  AS or_mask,
       xor(o_orderkey, 6148914691236517205) AS xored,
       ~o_orderkey                      AS negated,
       o_orderkey << 2                  AS shl2,
       o_orderkey >> 3                  AS shr3,
       bit_count(o_orderkey)::INT       AS popcount
FROM orders
""")
def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface (§2.8): AND/OR/XOR/NOT, shifts,
    popcount — the primitives the engine's own SimHash/Hamming
    operators (`dedup_simhash`, `sim_hamming_topk`) are built from,
    exposed as user-facing functions. Int64 semantics agree between
    engines (arithmetic right shift on non-negative keys, two's
    complement NOT); shifts use Spark's `<<`/`>>` SQL operators
    (Spark 4 added them; `shiftleft`/`shiftright` are the pre-4
    spellings). Pure map stage in whole-stage codegen.
    """
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(15)).alias("or_mask"),
        k.bitwiseXOR(F.lit(6148914691236517205)).alias("xored"),
        F.expr("~o_orderkey").alias("negated"),
        F.expr("o_orderkey << 2").alias("shl2"),
        F.expr("o_orderkey >> 3").alias("shr3"),
        F.bit_count(k).alias("popcount"))
