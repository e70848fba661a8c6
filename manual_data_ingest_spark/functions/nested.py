"""Array / map / JSON functions (SURVEY.md §2.9).

Reference behavior reconstructed: API-payload parsing and assembly
(entity-registration JSON), nested metadata wrangling. North-star
additions: token-array ops over ``documents`` and higher-order
functions over the 64-dim ``embeddings`` vectors.

All higher-order lambdas run JVM-side (Catalyst ``transform``/
``filter``/``aggregate`` expressions) — no Python boundary crossing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from manual_data_ingest_spark.io import load_table
from manual_data_ingest_spark.functions.rounding import rnd, sql_rnd
from manual_data_ingest_spark.registry import register

#: Shared tight-JSON guard (single-sourced on both engine sides, the
#: _SCORED_ONLY_SQL discipline). A payload participates in JSON
#: extraction iff it matches a strict FLAT-OBJECT grammar: one object,
#: escape-free string keys/values, JSON numbers / true / false / null,
#: no nesting, no trailing comma, no trailing content. Any payload the
#: regex accepts is valid JSON that Spark's Jackson readers
#: (get_json_object / from_json / try_parse_json) and DuckDB's yyjson
#: parse IDENTICALLY, so the guard is the SAME predicate on both
#: engines — no engine-native validity check needed or wanted. The r8
#: guard was `^\s*\{.*\}\s*$` + json_valid on the oracle side ONLY
#: (r9 advice): '{"k":55} junk}' or '{"k":55}{"x":1}' passed that
#: regex, Jackson leniently extracted k=55, DuckDB json_valid said
#: false → NULL — an asymmetric contract no engine-native pair can
#: close (Jackson tolerates trailing garbage; yyjson tolerates
#: trailing commas). The grammar regex is the symmetric contract:
#: every historical fixture payload ('{"k": 69}') passes; every
#: lenient-parse divergence class fails on BOTH sides. Engine-portable
#: (RE2 and Java: alternation, classes, bounded quantifiers only).
#: Pinned by the adversarial sweep's props arm (j%11==3) and
#: tests/test_empty_input.py::test_tight_json_guard_symmetry.
#: r10 (r9 advice, medium): the r9 number class accepted leading-zero
#: numbers ('{"k": 012}') and the string class accepted raw control
#: chars ('{"s":"a\nb"}') — both are INVALID JSON (DuckDB's yyjson
#: throws 'Malformed JSON'; Jackson's strict defaults NULL them), so a
#: payload in either class broke the 'regex-accepted ⇒ valid JSON'
#: contract and aborted the oracle query. The number grammar is now
#: the exact RFC 8259 production (-?(?:0|[1-9]\d*)...) and string
#: chars exclude \x00-\x1f (RFC: unescaped control chars forbidden);
#: both escapes are portable across Java regex and RE2.
_TIGHT_JSON_NUM = r"-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?"
_TIGHT_JSON_STR_CHARS = r'[^"\\\x00-\x1f]*'
_TIGHT_JSON_VAL = (rf'(?:{_TIGHT_JSON_NUM}|"{_TIGHT_JSON_STR_CHARS}"'
                   rf'|true|false|null)')
_TIGHT_JSON_PAIR = rf'"{_TIGHT_JSON_STR_CHARS}"\s*:\s*{_TIGHT_JSON_VAL}'
_TIGHT_JSON_RE = (rf"^\s*\{{\s*(?:{_TIGHT_JSON_PAIR}"
                  rf"(?:\s*,\s*{_TIGHT_JSON_PAIR})*)?\s*\}}\s*$")
_TIGHT_JSON_ORACLE = f"regexp_matches(props, '{_TIGHT_JSON_RE}')"

#: DUPLICATE-KEY leg of the contract (r9 probe): the grammar cannot
#: forbid a repeated key (needs backreferences; DuckDB is RE2), and
#: the engines disagree three ways on '{"k":1,"k":2}' — Spark
#: from_json is LAST-wins (2), Spark try_parse_json/variant REJECTS
#: (NULL), DuckDB json_extract is FIRST-wins (1); only get_json_object
#: happens to agree with DuckDB. So consumers whose Spark reader is
#: not first-wins (json_schema_parse's from_json, variant_funcs'
#: variant path) additionally require the EXTRACTED key to appear at
#: most once; grammar-valid strings cannot contain quotes or escapes,
#: so '"k"\s*:' can only match the key position. Pinned by
#: test_tight_json_guard_symmetry's duplicate-key payload and the
#: adversarial props arm.
def _key_once_re(key: str) -> str:
    return rf'"{key}"\s*:'


def _key_once_spark(key: str):
    return F.regexp_count(F.col("props"), F.lit(_key_once_re(key))) <= 1


def _key_once_sql(key: str) -> str:
    return (f"len(regexp_extract_all(props, '{_key_once_re(key)}')) <= 1")


@register("array_ops", """
SELECT doc_id,
       len(string_split(text, ' '))                    AS n_tokens,
       len(list_distinct(string_split(text, ' ')))     AS n_distinct,
       list_contains(string_split(text, ' '), 'data')  AS has_data,
       array_to_string(list_sort(string_split(text, ' ')[1:5]), ' ')
           AS first5_sorted
FROM documents
""")
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # first5_sorted is flattened to one string: the driver's
    # canonicalizer cannot hash array-typed cells (r1 verdict)
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_contains(toks, "data").alias("has_data"),
        F.array_join(F.sort_array(F.slice(toks, 1, 5)), " ")
         .alias("first5_sorted"))


@register("array_explode", """
SELECT token, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 20
""")
def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (d.select(F.explode(F.split("text", " ")).alias("token"))
            .groupBy("token").agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("token"))
            .limit(20))


@register("higher_order", f"""
SELECT vec_id,
       {sql_rnd("sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))", 6)}
           AS l2_norm,
       len(list_filter(embedding, x -> x > 0))  AS n_positive,
       {sql_rnd("list_sum(list_transform(embedding, x -> x::DOUBLE * 2.0))", 6)}
           AS scaled_sum
FROM embeddings
""")
def higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HOF lambdas over the 64-dim float vectors; floats cast to double
    # BEFORE arithmetic so both engines accumulate in double (left-to-right
    # fold over 64 elements — same order, bit-identical)
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        rnd(F.sqrt(F.aggregate(F.transform(dbl.alias("d"), lambda x: x * x),
                               F.lit(0.0), lambda acc, v: acc + v)), 6)
        .alias("l2_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        rnd(F.aggregate(F.transform("embedding",
                                    lambda x: x.cast("double") * 2.0),
                        F.lit(0.0), lambda acc, v: acc + v), 6)
        .alias("scaled_sum"))


@register("map_ops", """
WITH per_type AS (
    SELECT user_id, event_type, count(*) AS cnt
    FROM events WHERE event_type IS NOT NULL
    GROUP BY user_id, event_type
)
SELECT user_id,
       array_to_string(list(event_type ORDER BY event_type), ',')
           AS event_types,
       array_to_string(list(cnt ORDER BY event_type), ',')
           AS event_counts
FROM per_type
GROUP BY user_id
""")
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark side genuinely builds a MapType (map_from_entries) then emits
    # sorted keys + aligned lookups, flattened to CSV strings — maps and
    # arrays don't hash portably across engines / in the driver's
    # canonicalizer, strings do.
    ev = load_table(spark, sf_dir, "events")
    # NULL event types cannot be map keys (NULL_MAP_KEY) — exclude the
    # null group, matching a map keyed by a defined event type
    per_type = (ev.filter(F.col("event_type").isNotNull())
                .groupBy("user_id", "event_type")
                .agg(F.count("*").alias("cnt")))
    m = F.map_from_entries(F.collect_list(F.struct("event_type", "cnt")))
    keys = F.sort_array(F.map_keys("type_counts"))
    return (per_type.groupBy("user_id")
            .agg(m.alias("type_counts"))
            .select(
                "user_id",
                F.array_join(keys, ",").alias("event_types"),
                F.array_join(
                    F.transform(keys,
                                lambda k: F.col("type_counts")[k].cast("string")),
                    ",").alias("event_counts")))


@register("json_extract", f"""
SELECT event_id, k FROM (
  SELECT event_id,
         CASE WHEN {_TIGHT_JSON_ORACLE}
              THEN json_extract_string(props, '$.k')::INT END AS k
  FROM events)
WHERE k > 50
""")
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # API-payload parsing: pull typed field out of a JSON-string column
    # (guarded by the shared tight-JSON contract, _TIGHT_JSON_RE)
    ev = load_table(spark, sf_dir, "events")
    k = (F.when(F.col("props").rlike(_TIGHT_JSON_RE),
                F.get_json_object("props", "$.k"))
         .cast("int"))
    return ev.select("event_id", k.alias("k")).filter(F.col("k") > 50)


@register("json_construct", """
SELECT c_custkey,
       json_extract_string(payload, '$.name')    AS rt_name,
       json_extract_string(payload, '$.segment') AS rt_segment,
       json_extract_string(payload, '$.id')::BIGINT AS rt_id
FROM (
    SELECT c_custkey,
           to_json(struct_pack(id := c_custkey, name := c_name,
                               segment := c_mktsegment)) AS payload
    FROM customer
)
""")
def json_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # entity-registration payload assembly (the reference's POST bodies):
    # build JSON from a struct, then parse fields back out — the payload
    # string itself is engine-formatted, so the comparison is on the
    # round-tripped fields.
    c = load_table(spark, sf_dir, "customer")
    payload = F.to_json(F.struct(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment")))
    return (c.select("c_custkey", payload.alias("payload"))
            .select(
                "c_custkey",
                F.get_json_object("payload", "$.name").alias("rt_name"),
                F.get_json_object("payload", "$.segment").alias("rt_segment"),
                F.get_json_object("payload", "$.id").cast("bigint").alias("rt_id")))


@register("json_schema_parse", f"""
WITH parsed AS (
  SELECT CASE WHEN {_TIGHT_JSON_ORACLE} AND {_key_once_sql('k')}
              THEN json_extract_string(props, '$.k')::INT END AS k
  FROM events
)
SELECT k // 10 AS k_decade,
       count(*) AS cnt,
       min(k) AS k_min,
       max(k) AS k_max
FROM parsed
GROUP BY 1
""")
def json_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # typed JSON parsing with a DECLARED schema (from_json → struct),
    # vs json_extract's path-probing get_json_object: the declared form
    # is the scale path — one parse per row into native columns, fully
    # codegen'd downstream, and malformed payloads surface as nulls in
    # one place instead of per-path (payloads outside the shared
    # tight-JSON contract land in the NULL decade on both engines)
    ev = load_table(spark, sf_dir, "events")
    # tight grammar + key-once leg: from_json is LAST-wins on a
    # duplicated key where the oracle's json_extract is FIRST-wins
    parsed = ev.select(
        F.from_json(F.when(F.col("props").rlike(_TIGHT_JSON_RE)
                           & _key_once_spark("k"),
                           F.col("props")), "k INT").alias("p"))
    return (parsed.select(F.expr("p.k div 10").alias("k_decade"), "p.k")
            .groupBy("k_decade")
            .agg(F.count("*").alias("cnt"),
                 F.min("k").alias("k_min"),
                 F.max("k").alias("k_max")))


@register("map_transform_filter", """
SELECT user_id, event_type, cnt * 2 AS doubled
FROM (SELECT user_id, event_type, count(*) AS cnt
      FROM events WHERE event_type IS NOT NULL
      GROUP BY user_id, event_type)
WHERE cnt >= 5
""")
def map_transform_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # map higher-order functions: build map(event_type → count) per
    # user, transform_values (×2), map_filter (original count >= 5),
    # explode back to rows. The oracle needs NO map dialect at all —
    # exploded entries are plain rows, which is exactly why the engine
    # rounds every map op through an entry-level representation before
    # hashing (SURVEY §2.9 discipline).
    ev = load_table(spark, sf_dir, "events")
    # exclude NULL event types: they cannot be map keys (NULL_MAP_KEY)
    m = (ev.filter(F.col("event_type").isNotNull())
         .groupBy("user_id", "event_type").count()
         .groupBy("user_id")
         .agg(F.map_from_entries(
             F.collect_list(F.struct("event_type", "count"))).alias("m")))
    doubled = F.map_filter(
        F.transform_values(F.col("m"), lambda k, v: v * 2),
        lambda k, v: v >= 10)  # original cnt >= 5 → doubled >= 10
    return (m.select("user_id", F.explode(doubled).alias("event_type", "doubled")))


@register("explode_outer_semantics", """
SELECT doc_id, u.m AS match
FROM documents
LEFT JOIN LATERAL (
    SELECT unnest(list_filter(string_split(text, ' '), t -> t = 'dup')) AS m
) u ON TRUE
""")
def explode_outer_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explode_outer vs explode: docs with NO matches of the rare token
    # keep a NULL row instead of vanishing — the difference between
    # "docs and their matches" and "matches only". Plain explode here
    # would silently drop ~95% of documents from any downstream join.
    d = load_table(spark, sf_dir, "documents")
    matches = F.filter(F.split("text", " "), lambda t: t == F.lit("dup"))
    return d.select("doc_id", F.explode_outer(matches).alias("match"))


@register("array_setops", """
WITH halves AS (
    SELECT doc_id,
           list_distinct(l[1 : len(l) // 2]) AS h1,
           list_distinct(l[len(l) // 2 + 1 : len(l)]) AS h2
    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
)
SELECT doc_id,
       len(list_distinct(h1 || h2)) AS n_union,
       len(list_filter(h1, x -> list_contains(h2, x))) AS n_intersect,
       len(list_filter(h1, x -> NOT list_contains(h2, x))) AS n_except
FROM halves
""")
def array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # array set algebra: vocabulary overlap between each document's two
    # halves — array_union/intersect/except sizes (Spark's variants
    # dedupe, mirrored by list_distinct on the oracle side). The
    # token-drift shape: "does the second half introduce new vocabulary"
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    half = (F.size(toks) / 2).cast("int")
    h1 = F.array_distinct(F.slice(toks, 1, half))
    h2 = F.array_distinct(F.expr(
        "slice(split(text, ' '), cast(size(split(text, ' ')) / 2 as int) + 1,"
        " size(split(text, ' ')))"))
    return d.select(
        "doc_id",
        F.size(F.array_union(h1, h2)).alias("n_union"),
        F.size(F.array_intersect(h1, h2)).alias("n_intersect"),
        F.size(F.array_except(h1, h2)).alias("n_except"))


@register("struct_nested", """
SELECT c_custkey,
       c_name AS entity_name,
       c_nationkey AS geo_nation,
       c_mktsegment AS attr_segment,
       floor(c_acctbal * 100.0 + 0.5) / 100.0 AS attr_balance
FROM customer
""")
def struct_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    # nested data modeling: assemble the entity-api payload shape as a
    # NESTED struct (entity{name, geo{nation}, attrs{segment, balance}}),
    # then flatten back via dot paths. The oracle compares the flattened
    # fields — struct layout is engine-internal, the projection contract
    # is what downstream consumers see.
    c = load_table(spark, sf_dir, "customer")
    entity = F.struct(
        F.col("c_name").alias("name"),
        F.struct(F.col("c_nationkey").alias("nation")).alias("geo"),
        F.struct(F.col("c_mktsegment").alias("segment"),
                 rnd(F.col("c_acctbal")).alias("balance")).alias("attrs"))
    nested = c.select("c_custkey", entity.alias("entity"))
    return nested.select(
        "c_custkey",
        F.col("entity.name").alias("entity_name"),
        F.col("entity.geo.nation").alias("geo_nation"),
        F.col("entity.attrs.segment").alias("attr_segment"),
        F.col("entity.attrs.balance").alias("attr_balance"))


@register("variant_funcs", f"""
SELECT event_id,
       CASE WHEN {_TIGHT_JSON_ORACLE} AND {_key_once_sql('k')}
            THEN json_extract(props, '$.k')::INT END         AS k_int,
       CASE WHEN {_TIGHT_JSON_ORACLE} AND {_key_once_sql('k')}
            THEN json_extract(props, '$.missing')::INT END   AS k_missing,
       CASE WHEN {_TIGHT_JSON_ORACLE} AND {_key_once_sql('k')}
            THEN json_extract(props, '$.k')::INT * 2 END     AS k_doubled
FROM events
""")
def variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VariantType.

    `parse_json` builds the binary Variant encoding once per row;
    `variant_get` / `try_variant_get` then extract typed paths without
    re-parsing the JSON text — the Spark-4 answer to schema-on-read
    columns, and the right 100 TB shape for ragged metadata: the
    Variant binary is columnar-shredded in parquet (Spark 4 writes
    typed_value sub-columns), so path extraction prunes like a real
    column instead of re-tokenizing strings. The oracle reads the same
    paths via DuckDB's JSON extraction.
    """
    ev = load_table(spark, sf_dir, "events")
    # try_parse_json (parse_json is FAILFAST: an empty/garbage payload
    # aborts the whole job), gated on the shared tight-JSON contract —
    # Jackson would otherwise extract from trailing-garbage payloads
    # that DuckDB's json_valid rejects.
    # tight grammar + key-once leg: the variant builder REJECTS a
    # duplicated key (NULL) where the oracle's json_extract first-wins
    v = F.try_parse_json(F.when(F.col("props").rlike(_TIGHT_JSON_RE)
                                & _key_once_spark("k"),
                                F.col("props")))
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.try_variant_get(v, "$.missing", "int").alias("k_missing"),
        (F.variant_get(v, "$.k", "int") * 2).alias("k_doubled"))
