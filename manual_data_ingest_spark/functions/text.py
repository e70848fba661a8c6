"""Text-analysis operators over the documents corpus (SURVEY.md §2.13).

Quality/statistics operators a training-data pipeline runs per document
and per corpus slice: token counts, type-token ratio, n-grams, language
summaries. All integer arithmetic + single IEEE divisions → exact
cross-engine parity; everything stays JVM-side (array HOFs, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from manual_data_ingest_spark.io import load_table
from manual_data_ingest_spark.functions.rounding import rnd, sql_rnd
from manual_data_ingest_spark.registry import register


@register("text_stats", f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct,
       {sql_rnd("len(list_distinct(string_split(text, ' ')))::DOUBLE"
                " / len(string_split(text, ' '))", 4)} AS ttr,
       {sql_rnd("list_sum(list_transform(string_split(text, ' '),"
                " x -> length(x)))::DOUBLE / len(string_split(text, ' '))", 4)}
           AS avg_token_len
FROM documents
""")
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    n_dis = F.size(F.array_distinct(toks))
    char_sum = F.aggregate(F.transform(toks, F.length), F.lit(0),
                           lambda acc, v: acc + v)
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_dis.alias("n_distinct"),
        rnd(n_dis.cast("double") / n_tok, 4).alias("ttr"),
        rnd(char_sum.cast("double") / n_tok, 4).alias("avg_token_len"))


@register("text_wordcount", """
SELECT token, count(*) AS cnt, count(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 20
""")
def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    # corpus top-20 tokens with document frequency — partial aggregation
    # shrinks the shuffle to (token, partial count) pairs
    d = load_table(spark, sf_dir, "documents")
    return (d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias("cnt"),
                 F.countDistinct("doc_id").alias("n_docs"))
            .orderBy(F.col("cnt").desc(), "token")
            .limit(20))


@register("text_ngrams", """
WITH bigrams AS (
    SELECT lang, unnest(CASE WHEN len(l) >= 2
                THEN [l[i] || ' ' || l[i+1] for i in generate_series(1, len(l)-1)]
                ELSE [] END) AS bigram
    FROM (SELECT lang, string_split(text, ' ') AS l FROM documents)
)
SELECT lang, bigram, cnt FROM (
    SELECT lang, bigram, count(*) AS cnt,
           row_number() OVER (PARTITION BY lang
                              ORDER BY count(*) DESC, bigram) AS rn
    FROM bigrams GROUP BY lang, bigram
) WHERE rn <= 5
""")
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # top-5 bigrams per language. NB Spark sequence(1,0) yields a
    # DESCENDING [1,0] (not empty) — the size>=2 guard is mandatory.
    d = load_table(spark, sf_dir, "documents")
    bigram_arr = F.expr("""
        CASE WHEN size(split(text, ' ')) >= 2
             THEN transform(sequence(1, size(split(text, ' ')) - 1),
                            i -> concat_ws(' ', split(text, ' ')[i-1],
                                                split(text, ' ')[i]))
             ELSE array() END""")
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "bigram")
    return (d.select("lang", F.explode(bigram_arr).alias("bigram"))
            .groupBy("lang", "bigram").agg(F.count("*").alias("cnt"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("lang", "bigram", "cnt"))


@register("text_lang_summary", f"""
SELECT lang, source,
       count(*) AS n_docs,
       {sql_rnd('sum(n_chars)::DOUBLE / count(*)')} AS avg_chars,
       max(len(string_split(text, ' '))) AS max_tokens
FROM documents
GROUP BY lang, source
""")
def text_lang_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # language×source corpus slice metrics; avg as exact integer sum /
    # count (one IEEE division — cross-engine identical)
    d = load_table(spark, sf_dir, "documents")
    return (d.groupBy("lang", "source")
            .agg(F.count("*").alias("n_docs"),
                 rnd(F.sum("n_chars").cast("double") / F.count("*"))
                 .alias("avg_chars"),
                 F.max(F.size(F.split("text", " "))).alias("max_tokens")))
