"""Text-analysis operators over the documents corpus (SURVEY.md §2.13).

Quality/statistics operators a training-data pipeline runs per document
and per corpus slice: token counts, type-token ratio, n-grams, language
summaries. All integer arithmetic + single IEEE divisions → exact
cross-engine parity; everything stays JVM-side (array HOFs, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from manual_data_ingest_spark.io import fan_out, load_table
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
    # NO fan_out (measured r12): split+explode+partial-count is light
    # enough per row that the extra exchange costs more than the
    # parallelism wins (0.35→0.39 s at sf0.1, 0.52→0.61 s at 4×)
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
    #
    # r12: split ONCE into a projected column. The old form inlined
    # `split(text, ' ')` inside the transform lambda, so every element
    # access re-split the whole document — O(L²) work per doc (~30
    # tokens mean, up to 100: the sweep measured 3.5 s warm for what is
    # one explode+agg). `element_at(l, i)` is 1-based where `[i-1]/[i]`
    # were 0-based: same adjacent pairs by index arithmetic.
    d = load_table(spark, sf_dir, "documents")
    bigram_arr = F.expr("""
        CASE WHEN size(l) >= 2
             THEN transform(sequence(1, size(l) - 1),
                            i -> concat_ws(' ', element_at(l, i),
                                                element_at(l, i + 1)))
             ELSE array() END""")
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "bigram")
    return (d.select("lang", F.split("text", " ").alias("l"))
            .select("lang", F.explode(bigram_arr).alias("bigram"))
            .groupBy("lang", "bigram").agg(F.count("*").alias("cnt"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("lang", "bigram", "cnt"))


_MARKERS = {  # tiny stopword marker sets; priority order breaks ties
    "en": ("the", "a"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "y"),
    "fr": ("le", "les", "et", "une"),
}


def _marker_score(dialect: str, lang: str) -> str:
    toks = ", ".join(f"'{t}'" for t in _MARKERS[lang])
    if dialect == "spark":
        return f"size(filter(split(text, ' '), t -> t IN ({toks})))"
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({toks})))"


def _lang_pred(scores: dict[str, str]) -> str:
    g = f"greatest({', '.join(scores.values())})"
    cases = " ".join(f"WHEN {scores[l]} = {g} THEN '{l}'" for l in _MARKERS)
    return f"CASE WHEN {g} = 0 THEN 'und' {cases} END"


@register("text_lang_id", f"""
SELECT doc_id, lang,
       {_lang_pred({l: _marker_score('duck', l) for l in _MARKERS})} AS pred_lang,
       {_marker_score('duck', 'en')} AS en_hits,
       {sql_rnd("%s::DOUBLE / len(string_split(text, ' '))"
                % _marker_score('duck', 'en'), 4)} AS marker_ratio
FROM documents
""")
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/marker-token language ID heuristic.

    Scores each language by its stopword-marker hit count in the token
    stream; argmax wins, deterministic priority order on ties, 'und'
    when nothing matches. NOTE: the fixture corpus is a synthetic 31-word
    English-ish vocabulary, so predictions collapse to 'en'/'und' — the
    operator is the real algorithm, graded on determinism and plumbing
    (all JVM-side array HOFs, no UDF, no shuffle: a pure map stage that
    scales embarrassingly).
    """
    d = load_table(spark, sf_dir, "documents")
    scores = {l: _marker_score("spark", l) for l in _MARKERS}
    en = F.expr(_marker_score("spark", "en"))
    return d.select(
        "doc_id", "lang",
        F.expr(_lang_pred(scores)).alias("pred_lang"),
        en.alias("en_hits"),
        rnd(en.cast("double") / F.size(F.split("text", " ")), 4)
        .alias("marker_ratio"))


_STOP_SQL_DUCK = "len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a')))"
_STOP_SQL_SPARK = "size(filter(split(text, ' '), t -> t IN ('the', 'a')))"


@register("text_quality", f"""
WITH q AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))
               AS n_punct,
           list_sum(list_transform(string_split(text, ' '), x -> length(x)))
               AS char_sum,
           {_STOP_SQL_DUCK} AS n_stop
    FROM documents
)
SELECT doc_id, n_tokens, n_punct, n_stop,
       (n_tokens BETWEEN 40 AND 100000) AS flag_len,
       (char_sum::DOUBLE / n_tokens BETWEEN 3 AND 10) AS flag_tok_len,
       (n_stop >= 2) AS flag_stop,
       {sql_rnd("((n_tokens BETWEEN 40 AND 100000)::INT"
                " + (char_sum::DOUBLE / n_tokens BETWEEN 3 AND 10)::INT"
                " + (n_stop >= 2)::INT) / 3.0", 4)} AS quality_score
FROM q
""")
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rule flags + a [0,1] composite score.

    Rules: token-count band, mean-token-length band, minimum stopword
    hits; punctuation count carried as evidence (this fixture has none).
    Pure map stage — no shuffle; at 100 TB this runs as a single scan
    with all predicates in whole-stage codegen.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    n_punct = F.length("text") - F.length(
        F.regexp_replace("text", "[^A-Za-z0-9 ]", ""))
    char_sum = F.aggregate(F.transform(toks, F.length), F.lit(0),
                           lambda acc, v: acc + v)
    n_stop = F.expr(_STOP_SQL_SPARK)
    avg_tok = char_sum.cast("double") / n_tok
    f_len = (n_tok >= 40) & (n_tok <= 100000)
    f_tok = (avg_tok >= 3) & (avg_tok <= 10)
    f_stop = n_stop >= 2
    return d.select(
        "doc_id", n_tok.alias("n_tokens"), n_punct.alias("n_punct"),
        n_stop.alias("n_stop"), f_len.alias("flag_len"),
        f_tok.alias("flag_tok_len"), f_stop.alias("flag_stop"),
        rnd((f_len.cast("int") + f_tok.cast("int") + f_stop.cast("int"))
            / F.lit(3.0), 4).alias("quality_score"))


# whitespace spelled as a literal space class — Spark SQL string literals
# process backslash escapes ('\s' silently becomes 's') while DuckDB's do
# not, so \s is a cross-dialect trap; the corpus separator is ' ' anyway
_BPE_PAT = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"


@register("text_token_bpe", f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{_BPE_PAT}')) AS n_bpe_tokens,
       {sql_rnd("len(regexp_extract_all(text, '" + _BPE_PAT + "'))::DOUBLE"
                " / len(string_split(text, ' '))", 4)} AS bpe_per_ws
FROM documents
""")
def text_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # token counting two ways: whitespace split vs a BPE-ish
    # pre-tokenizer regex (letter runs | digit runs | punct runs — the
    # GPT-2 pre-tokenization shape). Regex kept POSIX-simple so the Java
    # and RE2 dialects agree.
    d = load_table(spark, sf_dir, "documents")
    n_ws = F.size(F.split("text", " "))
    n_bpe = F.size(F.expr(f"regexp_extract_all(text, '{_BPE_PAT}', 0)"))
    return d.select(
        "doc_id", n_ws.alias("n_ws_tokens"), n_bpe.alias("n_bpe_tokens"),
        rnd(n_bpe.cast("double") / n_ws, 4).alias("bpe_per_ws"))


_FP_W = 8  # fingerprint window width (chars)
_FP_POW = [31 ** (_FP_W - 1 - j) for j in range(_FP_W)]  # base-31 weights


def _fp_hash(dialect: str) -> str:
    """Rolling polynomial hash of the 8-char window at 1-based offset i.
    Max value 127 * Σ31^k ≈ 3.6e12 — exact in BIGINT, no modulus, so the
    engines cannot diverge."""
    # CAST to BIGINT: Spark's ascii() is INT and ANSI mode overflows on
    # int * 31^7 before promotion; DuckDB harmlessly accepts the cast too
    return " + ".join(
        "CAST(ascii(substring(text, "
        + ("i" if j == 0 else f"i + {j}")
        + f", 1)) AS BIGINT) * {_FP_POW[j]}"
        for j in range(_FP_W))


@register("text_fingerprint", f"""
WITH w AS (
    SELECT doc_id,
           [{_fp_hash('duck')}
            for i in generate_series(1, length(text) - {_FP_W - 1})] AS hs
    FROM documents WHERE length(text) >= {_FP_W}
)
SELECT doc_id, list_min(hs) AS fp_min, len(hs) AS n_windows,
       len(list_distinct(hs)) AS n_distinct_windows
FROM w
""")
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint via rolling hash (winnowing-lite).

    Base-31 polynomial hash over every 8-char window; the fingerprint is
    the minimum window hash (one representative per doc — same idea as
    MOSS winnowing with a single global window). Integer arithmetic only
    → bit-exact across engines.

    Implementation note (measured, sf0.1): the pure-expression form
    (``transform(sequence(...), i -> 8 × substring+ascii)``) is an
    interpreted HOF lambda — 11.6 s. This is the documented exception
    where a vectorized Arrow UDF beats built-ins: numpy sliding-window
    dot over codepoints does the identical int64 math at C speed
    (~0.4 s, 30×). Map-only stage either way — no shuffle, scales
    linearly with executors.
    """
    import numpy as np
    import pandas as pd

    pows = np.array(_FP_POW, dtype=np.int64)

    def fp(batches):
        for pdf in batches:
            fp_min, n_win, n_dis = [], [], []
            for text in pdf["text"]:
                # ord() == ascii()/codepoint semantics of the SQL twin
                a = np.fromiter((ord(c) for c in text), dtype=np.int64,
                                count=len(text))
                w = np.lib.stride_tricks.sliding_window_view(a, _FP_W)
                hs = w @ pows
                fp_min.append(int(hs.min()))
                n_win.append(len(hs))
                n_dis.append(len(np.unique(hs)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "fp_min": fp_min,
                                "n_windows": n_win,
                                "n_distinct_windows": n_dis})

    d = load_table(spark, sf_dir, "documents")
    # fan_out: one Python worker was doing the whole corpus (single-task
    # scan); the sliding-window hash parallelizes linearly (io.fan_out)
    return (fan_out(d.filter(F.length("text") >= _FP_W)
                    .select("doc_id", "text"))
            .mapInPandas(fp, schema="doc_id long, fp_min long, "
                                    "n_windows int, n_distinct_windows int"))


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


_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
_PII_PHONE = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"


@register("text_pii_scrub", f"""
SELECT doc_id,
       md5(substring(
           regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                          '{_PII_PHONE}', '<PHONE>', 'g'), 1, 64))
           AS scrubbed_prefix_md5,
       len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phones
FROM documents
""")
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (emails/phones → placeholder tokens) with
    per-doc redaction counts — the compliance stage every training-data
    pipeline runs before anything else sees the text. This corpus is
    synthetic and clean (counts are 0), so what the oracle verifies is
    the negative case: scrubbing MUST be the identity on clean text
    (md5 of the scrubbed prefix matches), and the patterns agree across
    regex dialects (kept POSIX-simple per PARITY.md #3: no backslash
    classes).
    Map-only scan; at 100 TB this fuses with the quality gate into the
    same stage (see pipeline_llm_prep).
    """
    d = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", _PII_EMAIL, "<EMAIL>"),
        _PII_PHONE, "<PHONE>")
    return d.select(
        "doc_id",
        F.md5(F.substring(scrubbed, 1, 64)).alias("scrubbed_prefix_md5"),
        F.size(F.expr(f"regexp_extract_all(text, '{_PII_EMAIL}', 0)"))
        .alias("n_emails"),
        F.size(F.expr(f"regexp_extract_all(text, '{_PII_PHONE}', 0)"))
        .alias("n_phones"))


@register("text_tfidf", """
WITH tf AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
),
tfc AS (SELECT doc_id, token, count(*) AS tf FROM tf GROUP BY 1, 2),
df AS (SELECT token, count(*) AS df FROM tfc GROUP BY token),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT doc_id, token,
           floor((tf * ln(n_docs::DOUBLE / df)) * 1000000.0 + 0.5)
               / 1000000.0 AS score
    FROM tfc JOIN df USING (token) CROSS JOIN n
)
SELECT doc_id, token, score
FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, token) <= 3
""")
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (tf · ln(N/df)) — the keyword
    signature used for topic tagging / near-dup triage in corpus prep.

    Hash discipline: the score is ROUNDED 6dp BEFORE ranking on both
    engines, with the token as tie-break — otherwise last-bit float
    drift between engines could flip rank-3 vs rank-4 and the results
    would be unstable, not just unhashable. Shape: token df is a
    token-keyed aggregate joined back to the (doc, token) tf relation
    on the SAME key (no extra shuffle of the big side beyond the tf
    groupBy); N is a 1-row broadcast; the final top-k is a per-doc
    window. All three joins/windows ride the explode's shuffle keys.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tfc = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfc = tfc.groupBy("token").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (tfc.join(dfc, "token").crossJoin(F.broadcast(n))
              .select("doc_id", "token",
                      rnd(F.col("tf") * F.log(F.col("n_docs")
                                              / F.col("df")), 6)
                      .alias("score")))
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "token")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("doc_id", "token", "score"))


@register("text_gopher_repetition", f"""
WITH w AS (
  SELECT doc_id,
         string_split(text, ' ') AS l,
         length(text)            AS n_chars
  FROM documents
), b AS (
  SELECT doc_id, l, n_chars,
         len(l) AS n_words,
         len(list_distinct(l)) AS n_distinct,
         list_transform(generate_series(1, len(l) - 1),
                        i -> l[i] || ' ' || l[i + 1]) AS bg
  FROM w
)
SELECT doc_id,
       n_words,
       {sql_rnd("1.0 - n_distinct::DOUBLE / n_words", 6)} AS dup_word_frac,
       {sql_rnd("list_max(list_transform(list_distinct(bg),"
                " p -> len(list_filter(bg, x -> x = p))))::DOUBLE"
                " / len(bg)", 6)} AS top_bigram_frac,
       {sql_rnd("(n_chars - (n_words - 1))::DOUBLE / n_words", 6)}
           AS mean_word_len
FROM b
WHERE len(bg) > 0
""")
def text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule repetition signals (Rae et al. 2021, public) per doc.

    The filters every LLM corpus pipeline applies before training:
    duplicate-word fraction, fraction of bigrams taken by the most
    frequent bigram, mean word length. All computed with array
    higher-order functions inside whole-stage codegen — a map-only scan,
    no shuffle, no UDF. The per-doc bigram mode is O(distinct² ) in the
    doc's own length only, so 100 TB scales linearly in corpus size;
    word soups past ~10k words would switch to the explode+groupBy
    form (`text_tfidf`'s shape) to bound per-row compute.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    base = d.select(
        "doc_id", F.length("text").alias("n_chars"),
        words.alias("l"), F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"))
    bg = F.zip_with(
        F.slice("l", 1, F.col("n_words") - 1),
        F.slice("l", 2, F.col("n_words") - 1),
        lambda a, b: F.concat(a, F.lit(" "), b))
    base = base.withColumn("bg", bg).filter(F.size("bg") > 0)
    top_cnt = F.array_max(F.transform(
        F.array_distinct("bg"),
        lambda p: F.size(F.filter(F.col("bg"), lambda x: x == p))))
    return base.select(
        "doc_id", "n_words",
        rnd(1.0 - F.col("n_distinct").cast("double") / F.col("n_words"), 6)
        .alias("dup_word_frac"),
        rnd(top_cnt.cast("double") / F.size("bg"), 6)
        .alias("top_bigram_frac"),
        rnd((F.col("n_chars") - (F.col("n_words") - 1)).cast("double")
            / F.col("n_words"), 6).alias("mean_word_len"))


@register("text_chunk_overlap", """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
           WHERE text IS NOT NULL)
SELECT doc_id,
       (s // 40)::INT AS chunk_idx,
       len(l[s+1:s+50]) AS n_toks,
       md5(array_to_string(l[s+1:s+50], ' ')) AS chunk_md5
FROM w, unnest(generate_series(0, greatest(len(l) - 1, 0), 40)) AS g(s)
""")
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping chunking: 50-token windows at stride 40
    (10-token overlap), the indexing transform every retrieval corpus
    runs before embedding.

    Map-only: `sequence` generates the start offsets per doc, `slice`
    cuts the windows — no shuffle, no UDF, and the chunk count per doc
    is ceil(n/stride), so output volume is bounded at 1.25× input
    tokens. At 100 TB this runs fused into the same scan as quality
    filtering (`pipeline_llm_prep` composition) and the md5 keys feed
    exact chunk-dedup before any embedding cost is paid.
    """
    # a NULL document has no chunks (both engines; the engines'
    # split(NULL) shapes diverge — r7 null sweep)
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    base = d.select("doc_id", F.split("text", " ").alias("l"))
    starts = F.expr("sequence(0, greatest(size(l) - 1, 0), 40)")
    c = base.select("doc_id", F.explode(starts).alias("s"), "l")
    chunk = F.expr("slice(l, s + 1, 50)")
    return c.select(
        "doc_id",
        (F.col("s") / 40).cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_toks"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"))


@register("text_unigram_logprob", f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), freq AS (
  SELECT w, count(*)::DOUBLE AS c FROM tok GROUP BY w
), total AS (
  SELECT sum(c) AS t FROM freq
)
SELECT doc_id,
       count(*) AS n_toks,
       {sql_rnd('avg(-ln(f.c / (SELECT t FROM total)))', 6)} AS avg_nll
FROM tok JOIN freq f USING (w)
GROUP BY doc_id
""")
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram LM quality score: per-doc average negative
    log-probability — the CCNet-style perplexity proxy without KenLM.

    Train = one token count pass (the LM is just the corpus unigram
    distribution); score = explode tokens, look up p(w), average −ln p.
    The frequency table is vocabulary-sized, so at 100 TB it BROADCASTS
    to the scoring scan (plan: the token relation never shuffles for
    the lookup — only the per-doc average shuffles doc-keyed rows, and
    that partial-aggregates). Low avg_nll = stereotyped/common text;
    high = rare-token soup — both tails get dropped by quality cuts.
    Float parity: one ln + one divide per distinct token, averaged in
    doc-local order-independent form, rounded 6dp.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    # materialize the trained LM once (vocab-sized — at scale this is
    # the persisted model artifact); without it every reuse of `freq`
    # re-planned the corpus scan (6 scans; now 2 = train + score)
    freq = (tok.groupBy("w").agg(F.count("*").cast("double").alias("c"))
            .localCheckpoint(eager=True))
    total = freq.agg(F.sum("c").alias("t"))
    scored = (tok.join(F.broadcast(freq), "w")
              .crossJoin(F.broadcast(total)))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").alias("n_toks"),
                 rnd(F.avg(-F.log(F.col("c") / F.col("t"))), 6)
                 .alias("avg_nll")))


# OLS-from-moments text shared between F.expr and the oracle —
# x = ln(rank), z = ln(freq) over the top-200 vocabulary
_ZSLOPE = "((sxz - (sx * sz) / n) / (sxx - (sx * sx) / n))"
_ZINTC = f"((sz - {_ZSLOPE} * sx) / n)"
_ZR2 = (f"(((sxz - (sx * sz) / n) * (sxz - (sx * sz) / n))"
        f" / ((sxx - (sx * sx) / n) * (szz - (sz * sz) / n)))")


@register("text_zipf_slope", f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), freq AS (
  SELECT w, count(*) AS c FROM tok WHERE w <> '' GROUP BY w
), ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r
  FROM freq
  QUALIFY row_number() OVER (ORDER BY c DESC, w) <= 200
), m AS (
  SELECT CAST(count(*) AS DOUBLE)         AS n,
         sum(ln(CAST(r AS DOUBLE)))       AS sx,
         sum(ln(CAST(c AS DOUBLE)))       AS sz,
         sum(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))) AS sxx,
         sum(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE))) AS sxz,
         sum(ln(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE))) AS szz
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_points,
       floor({_ZSLOPE} * 10000.0 + 0.5) / 10000.0 AS zipf_slope,
       floor({_ZINTC} * 10000.0 + 0.5) / 10000.0 AS log_intercept,
       floor({_ZR2} * 10000.0 + 0.5) / 10000.0 AS r2
FROM m
""")
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary: OLS slope of
    ln(freq) on ln(rank) for the top-200 terms — natural language sits
    near −1; a synthetic or templated corpus shows up immediately as a
    flat or kinked slope. The one-number corpus-health check beside
    `text_unigram_logprob`'s per-doc score.

    Ranking is exact-integer (count DESC, token) so both engines pick
    the identical 200 points; ln() is ≤1-ulp on each engine and the
    moment sums over 200 terms drift ~1e-14 — four orders below the
    4dp rounding margin. The OLS algebra is one shared expression
    text (the `ml_ols_normal_equations` discipline).

    100 TB: one token-frequency shuffle (the same aggregate
    `text_wordcount` runs), a 200-row window, and a scalar fit.
    """
    d = load_table(spark, sf_dir, "documents")
    freq = (d.select(F.explode(F.split("text", " ")).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w").agg(F.count("*").alias("c")))
    wnd = Window.orderBy(F.col("c").desc(), F.col("w"))
    ranked = (freq.withColumn("r", F.row_number().over(wnd))
              .filter(F.col("r") <= 200))
    lr = F.log(F.col("r").cast("double"))
    lc = F.log(F.col("c").cast("double"))
    m = ranked.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(lr).alias("sx"),
        F.sum(lc).alias("sz"),
        F.sum(lr * lr).alias("sxx"),
        F.sum(lr * lc).alias("sxz"),
        F.sum(lc * lc).alias("szz"))
    return m.select(
        F.col("n").cast("long").alias("n_points"),
        rnd(F.expr(_ZSLOPE), 4).alias("zipf_slope"),
        rnd(F.expr(_ZINTC), 4).alias("log_intercept"),
        rnd(F.expr(_ZR2), 4).alias("r2"))


@register("text_vocab_growth", """
WITH tok AS MATERIALIZED (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), bounds AS (
    SELECT d AS decile,
           ((SELECT max(doc_id) + 1 FROM documents) * d) // 10 AS bound
    FROM unnest(generate_series(1, 10)) AS g(d)
), first_seen AS MATERIALIZED (
    SELECT token, min(doc_id) AS first_doc FROM tok GROUP BY token
), tokens_cum AS (
    SELECT b.decile, count(*) AS n_tokens
    FROM bounds b JOIN tok t ON t.doc_id < b.bound
    GROUP BY b.decile
), vocab_cum AS (
    SELECT b.decile, count(*) AS n_vocab
    FROM bounds b JOIN first_seen f ON f.first_doc < b.bound
    GROUP BY b.decile
)
SELECT t.decile, t.n_tokens, v.n_vocab,
       floor(v.n_vocab::DOUBLE / t.n_tokens * 1000000.0 + 0.5) / 1000000.0
           AS type_token_ratio
FROM tokens_cum t JOIN vocab_cum v ON t.decile = v.decile
""")
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve: cumulative token count,
    cumulative DISTINCT vocabulary, and type-token ratio at each corpus
    decile (by doc_id order) — the corpus-health curve that flags
    crawl loops (vocab plateaus) and boilerplate floods (TTR collapse)
    before training data ships.

    Cumulative-distinct does NOT need a running window over tokens: a
    token enters the vocabulary at its FIRST document (one groupBy
    min), so each decile's vocab is a count of first_doc < bound — the
    same first-occurrence trick `win_cumulative_distinct` uses. Both
    fact-sized passes are partial aggs; the 10-row bound table
    broadcasts. TTR denominators via one shared token scan.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    max_id = d.agg((F.max("doc_id") + 1).alias("m"))
    # Integer floor division on BOTH engines (r3 advisor): Spark's `/` is
    # float (121*? -> 120.1) while the oracle's `//` floors — for corpora
    # whose (max_doc_id+1)*d is not a multiple of 10 the boundary doc
    # would land in different deciles.
    bounds = (spark.range(1, 11).select(F.col("id").alias("decile"))
              .crossJoin(F.broadcast(max_id))
              .select("decile", F.floor(F.col("m") * F.col("decile") / 10)
                      .alias("bound")))
    first_seen = tok.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    tokens_cum = (tok.join(F.broadcast(bounds), F.col("doc_id") < F.col("bound"))
                  .groupBy("decile").agg(F.count("*").alias("n_tokens")))
    vocab_cum = (first_seen
                 .join(F.broadcast(bounds), F.col("first_doc") < F.col("bound"))
                 .groupBy("decile").agg(F.count("*").alias("n_vocab")))
    return (tokens_cum.join(vocab_cum, "decile")
            .select("decile", "n_tokens", "n_vocab",
                    rnd(F.col("n_vocab").cast("double") / F.col("n_tokens"), 6)
                    .alias("type_token_ratio")))


@register("text_top_terms", f"""
WITH tok AS MATERIALIZED (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS MATERIALIZED (
    SELECT doc_id, token, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2
), df AS (
    SELECT token, count(*)::DOUBLE AS df FROM tf GROUP BY 1
), n AS (SELECT count(*)::DOUBLE AS n FROM documents)
SELECT doc_id, token,
       {sql_rnd('tf * ln((SELECT n FROM n) / df)', 6)} AS tfidf, rn
FROM (
    SELECT tf.doc_id, tf.token, tf.tf, df.df,
           row_number() OVER (PARTITION BY tf.doc_id
                              ORDER BY tf.tf * ln((SELECT n FROM n) / df.df)
                                       DESC, tf.token) AS rn
    FROM tf JOIN df USING (token)
)
WHERE rn <= 3 AND doc_id < 50
""")
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: top-3 tf-idf terms per document (first 50
    docs emitted) — the tag/keyword generator for search facets and
    the quick what-is-this-document summary.

    Reuses `sim_sparse_tfidf_topk`'s weight algebra without the
    similarity join: tf and idf are the same two partial aggregates,
    the per-doc top-k is a WindowGroupLimit (map-side partial top-k
    before the doc shuffle). Tie-break on token keeps equal-weight
    terms deterministic. At 100 TB the idf table broadcasts and the
    window rides the tf aggregation's existing doc distribution.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = (tok.groupBy("doc_id", "token")
          .agg(F.count("*").cast("double").alias("tf")))
    df = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    n = d.agg(F.count("*").cast("double").alias("n"))
    weighted = (tf.join(F.broadcast(df), "token")
                .crossJoin(F.broadcast(n))
                .select("doc_id", "token",
                        (F.col("tf") * F.log(F.col("n") / F.col("df")))
                        .alias("w")))
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("w").desc(), F.col("token")))
    return (weighted.withColumn("rn", rn)
            .filter((F.col("rn") <= 3) & (F.col("doc_id") < 50))
            .select("doc_id", "token", rnd(F.col("w"), 6).alias("tfidf"), "rn"))


@register("text_boilerplate_prefix", f"""
WITH pref AS (
  SELECT doc_id, source,
         array_to_string(string_split(text, ' ')[1:5], ' ') AS prefix
  FROM documents WHERE text IS NOT NULL
), df AS (
  SELECT prefix, count(*) AS pdf FROM pref GROUP BY prefix
)
SELECT source,
       count(*) AS n_docs,
       count(CASE WHEN pdf >= 2 THEN 1 END) AS n_boilerplate,
       {sql_rnd('count(CASE WHEN pdf >= 2 THEN 1 END)::DOUBLE'
                ' / count(*)::DOUBLE', 6)} AS boilerplate_share
FROM pref JOIN df USING (prefix)
GROUP BY source
""")
def text_boilerplate_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-header detector: docs whose leading 5-word prefix
    recurs across the corpus (navigation chrome, license headers,
    scraped-template intros) — per source, the count and share of
    boilerplate-prefixed docs. The C4/Gopher-style cleanup signal that
    catches what full-document dedup misses: documents that differ in
    body but share scraped chrome.

    The prefix is a bounded slice (5 words regardless of doc length) so
    the grouped key stays small; one hash-agg builds the prefix DF table
    and one broadcast-able join tags the docs (prefix cardinality ≤
    corpus, typically ≪ — at 100 TB the DF table is the only shuffle
    and the hot prefixes are exactly the skew AQE splits).
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    pref = d.select(
        "doc_id", "source",
        F.array_join(F.slice(F.split("text", " "), 1, 5), " ")
        .alias("prefix"))
    dfreq = pref.groupBy("prefix").agg(F.count("*").alias("pdf"))
    boiler = F.count(F.when(F.col("pdf") >= 2, 1))
    return (pref.join(dfreq, "prefix")
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 boiler.alias("n_boilerplate"),
                 rnd(boiler.cast("double") / F.count("*").cast("double"), 6)
                 .alias("boilerplate_share")))


@register("text_ngram_novelty", f"""
WITH grams AS (
  SELECT doc_id, source,
         array_to_string(words[i:i+2], ' ') AS gram
  FROM (SELECT doc_id, source, string_split(text, ' ') AS words
        FROM documents WHERE text IS NOT NULL),
       (SELECT unnest(range(1, 200)) AS i)
  WHERE i + 2 <= len(words)
), first_seen AS (
  SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram
), per_doc AS (
  SELECT g.doc_id, g.source,
         count(*) AS n_grams,
         count(CASE WHEN f.first_doc = g.doc_id THEN 1 END) AS n_novel
  FROM grams g JOIN first_seen f ON f.gram = g.gram
  GROUP BY g.doc_id, g.source
)
SELECT source,
       count(*) AS n_docs,
       sum(n_grams)::BIGINT AS total_grams,
       sum(n_novel)::BIGINT AS novel_grams,
       {sql_rnd('sum(n_novel)::DOUBLE / sum(n_grams)::DOUBLE', 6)}
           AS novelty_rate
FROM per_doc GROUP BY source
""")
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-novelty scoring: the fraction of each source's 3-grams
    FIRST seen in its own documents (by ingestion order = doc_id) —
    the "is this feed adding new content or re-serving the corpus"
    signal that decides whether to keep paying for a crawl source.
    Near-zero novelty = the source is recombining what earlier docs
    already said; dedup won't catch it because no single document
    matches.

    One explode (posting-list shape, the `dedup_near_jaccard`
    infrastructure) → min-agg per gram → join back on the gram key;
    both gram-keyed stages share one shuffle layout. The 3-gram space
    is Zipf-bounded like every posting table; at 100 TB first_seen is
    the same rolling dictionary an incremental ingest maintains
    (`pipeline_incremental_refresh` shape) instead of a full re-scan.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    words = F.split("text", " ")
    # Mirror the oracle's window exactly (r3 advisor): start positions
    # capped at 199 (0-based j <= 198) and docs with <3 tokens emit
    # nothing — without the guard `sequence(0, size-3)` DESCENDS for
    # short docs and null-skipping concat_ws fabricates partial grams.
    grams = (d.select("doc_id", "source", words.alias("words"))
             .filter(F.expr("size(words) >= 3"))
             .select("doc_id", "source",
                     F.posexplode(F.expr(
                         "transform(sequence(0, least(size(words) - 3, 198)),"
                         " j -> concat_ws(' ', words[j], words[j+1],"
                         " words[j+2]))")).alias("i", "gram"))
             .filter(F.col("gram").isNotNull())
             .select("doc_id", "source", "gram"))
    first_seen = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (grams.join(first_seen, "gram")
               .groupBy("doc_id", "source")
               .agg(F.count("*").alias("n_grams"),
                    F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
                    .alias("n_novel")))
    return (per_doc.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_grams").alias("total_grams"),
                 F.sum("n_novel").alias("novel_grams"),
                 rnd(F.sum("n_novel").cast("double")
                     / F.sum("n_grams").cast("double"), 6)
                 .alias("novelty_rate")))


@register("text_cooccurrence_pmi", f"""
WITH dw AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL
), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM dw),
df AS (SELECT w, count(*) AS dfreq FROM dw GROUP BY w),
pairs AS (
  SELECT a.w AS w1, b.w AS w2, count(*) AS n_both
  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY a.w, b.w
)
SELECT w1, w2, n_both,
       {sql_rnd('ln(n_both::DOUBLE * (SELECT n_docs FROM n)::DOUBLE'
                ' / (d1.dfreq::DOUBLE * d2.dfreq::DOUBLE))', 6)} AS pmi,
       rk
FROM (
  SELECT w1, w2, n_both,
         row_number() OVER (ORDER BY n_both DESC, w1, w2) AS rk
  FROM pairs
) p
JOIN df d1 ON d1.w = p.w1
JOIN df d2 ON d2.w = p.w2
WHERE rk <= 20
""")
def text_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word co-occurrence mining: the 20 most frequent within-document
    word pairs with their PMI (pointwise mutual information — positive
    means the pair travels together more than chance, ~0 means the
    words are just individually common). The collocation detector
    behind phrase extraction and "customers also mention" features.

    The (doc, word) distinct explode bounds the self-join: pairs per
    doc ≤ C(distinct words, 2), vocabulary-bounded on this corpus and
    frequency-capped at web scale (stopword/df ceilings block the hot
    rows — same lever as `dedup_near_jaccard_capped`). DF tables
    broadcast; the pair count is one hash agg; the rank runs on the
    pair aggregate, never raw postings. ln appears only in the
    6dp-rounded emitted score, ranking is on exact integers (PARITY
    #31 both ways).
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    dw = (d.select("doc_id", F.explode(F.array_distinct(
        F.split("text", " "))).alias("w"))
          .distinct())
    n = dw.agg(F.countDistinct("doc_id").alias("n_docs"))
    df = dw.groupBy("w").agg(F.count("*").alias("dfreq"))
    a = dw.select(F.col("doc_id").alias("da"), F.col("w").alias("w1"))
    b = dw.select(F.col("doc_id").alias("db"), F.col("w").alias("w2"))
    pairs = (a.join(b, (F.col("da") == F.col("db"))
                    & (F.col("w1") < F.col("w2")))
             .groupBy("w1", "w2").agg(F.count("*").alias("n_both")))
    ranked = (pairs.withColumn("rk", F.row_number().over(
        Window.orderBy(F.col("n_both").desc(), "w1", "w2")))
        .filter(F.col("rk") <= 20))
    d1 = df.select(F.col("w").alias("w1"), F.col("dfreq").alias("df1"))
    d2 = df.select(F.col("w").alias("w2"), F.col("dfreq").alias("df2"))
    pmi = F.log(F.col("n_both").cast("double")
                * F.col("n_docs").cast("double")
                / (F.col("df1").cast("double") * F.col("df2").cast("double")))
    return (ranked.join(F.broadcast(d1), "w1").join(F.broadcast(d2), "w2")
            .join(F.broadcast(n))
            .select("w1", "w2", "n_both", rnd(pmi, 6).alias("pmi"), "rk"))


@register("text_js_divergence", f"""
WITH tw AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL AND source IN ('src0', 'src1')
), counts AS (
  SELECT source, w, count(*) AS c FROM tw WHERE w <> '' GROUP BY source, w
), tots AS (
  SELECT source, sum(c)::BIGINT AS tot FROM counts GROUP BY source
), vocab AS (SELECT DISTINCT w FROM counts),
grid AS (
  SELECT v.w,
         coalesce(a.c, 0)::DOUBLE
             / (SELECT tot FROM tots WHERE source = 'src0')::DOUBLE AS p,
         coalesce(b.c, 0)::DOUBLE
             / (SELECT tot FROM tots WHERE source = 'src1')::DOUBLE AS q
  FROM vocab v
  LEFT JOIN (SELECT w, c FROM counts WHERE source = 'src0') a ON a.w = v.w
  LEFT JOIN (SELECT w, c FROM counts WHERE source = 'src1') b ON b.w = v.w
)
SELECT count(*) AS n_vocab,
       {sql_rnd('sum(CASE WHEN p > 0'
                ' THEN 0.5 * p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END'
                ' + CASE WHEN q > 0'
                ' THEN 0.5 * q * ln(q / ((p + q) / 2.0)) ELSE 0.0 END)', 6)}
           AS js_divergence
FROM grid
""")
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between two sources' word
    distributions — the SYMMETRIC, always-finite distribution
    distance (KL blows up on any word one source lacks; JS's mixture
    midpoint never does), the standard "did this crawl's language
    actually change" measure that `ingest_psi_drift`'s 5-bin length
    histogram is too coarse to see.

    Word counts are one grouped pass; the two-source grid outer-joins
    on the shared vocabulary (vocab-bounded, the `text_cooccurrence_
    pmi` argument); zero-probability terms contribute EXACTLY 0 via
    explicit CASE arms (no epsilon hacks — JS needs none, unlike
    PSI), and ln lives only inside the 6dp-rounded bounded sum
    (PARITY #31).
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isin("src0", "src1"))
    tw = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    counts = (tw.filter(F.col("w") != "")
              .groupBy("source", "w").agg(F.count("*").alias("c")))
    # per-source totals as ONE-ROW aggregates, never filtered frames
    # (r9 skew sweep): when a source has zero docs, a filtered frame
    # is EMPTY and the cross join annihilates the whole grid
    # (n_vocab=0) while the oracle's scalar subquery yields NULL and
    # keeps the vocab rows — the conditional sum is NULL-on-absent on
    # both engines
    t0 = counts.agg(F.sum(F.when(F.col("source") == "src0",
                                 F.col("c"))).alias("tot0"))
    t1 = counts.agg(F.sum(F.when(F.col("source") == "src1",
                                 F.col("c"))).alias("tot1"))
    a = (counts.filter(F.col("source") == "src0")
         .select("w", F.col("c").alias("c0")))
    b = (counts.filter(F.col("source") == "src1")
         .select("w", F.col("c").alias("c1")))
    vocab = counts.select("w").distinct()
    grid = (vocab.join(a, "w", "left").join(b, "w", "left")
            .join(F.broadcast(t0)).join(F.broadcast(t1))
            .select(
                (F.coalesce(F.col("c0"), F.lit(0)).cast("double")
                 / F.col("tot0").cast("double")).alias("p"),
                (F.coalesce(F.col("c1"), F.lit(0)).cast("double")
                 / F.col("tot1").cast("double")).alias("q")))
    m = (F.col("p") + F.col("q")) / 2.0
    term = (F.when(F.col("p") > 0,
                   0.5 * F.col("p") * F.log(F.col("p") / m)).otherwise(0.0)
            + F.when(F.col("q") > 0,
                     0.5 * F.col("q") * F.log(F.col("q") / m)).otherwise(0.0))
    return grid.agg(F.count("*").alias("n_vocab"),
                    rnd(F.sum(term), 6).alias("js_divergence"))


_DOMAINS = (
    ("query_engine", ("join", "scan", "filter", "sort", "agg", "query",
                      "group", "merge")),
    ("storage", ("row", "column", "table", "key", "hash", "part", "batch",
                 "vector")),
    ("streaming", ("stream", "window", "order", "line", "data", "value")),
)


def _domain_score_sql(tokens: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{t}'" for t in tokens)
    return (f"len(list_filter(string_split(text, ' '),"
            f" t -> t IN ({inlist})))")


@register("text_domain_classify", f"""
WITH scored AS (
    SELECT doc_id, lang,
           {", ".join(f"{_domain_score_sql(toks)} AS sc_{i}"
                      for i, (_, toks) in enumerate(_DOMAINS))}
    FROM documents
), pick AS (
    SELECT doc_id, lang, dom AS domain, sc
    FROM scored, LATERAL (
        SELECT unnest(['{_DOMAINS[0][0]}', '{_DOMAINS[1][0]}',
                       '{_DOMAINS[2][0]}']) AS dom,
               unnest([sc_0, sc_1, sc_2]) AS sc) u
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY sc DESC, dom) = 1
)
SELECT domain, lang, count(*) AS n_docs
FROM pick GROUP BY 1, 2
""")
def text_domain_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-list topic/domain classification (argmax of per-domain
    token-hit counts, `text_lang_id`'s n-gram-heuristic discipline
    applied to topic): the curation step that routes documents to
    domain-specific pipelines and feeds the training-mix accounting
    (`pipeline_training_mix` needs a domain column from SOMEWHERE —
    this is the cheapest somewhere).

    Scale shape: scoring is a map-only scan expression (one
    `array_intersect`-style filter per domain over the in-row token
    array — no explode, no shuffle); the only shuffle is the final
    (domain, lang) count with map-side partials. Determinism: scores
    are integers and the argmax tie-breaks on domain name, so the
    cross-engine verdict is exact with no float in sight.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def _hit_counter(ts: tuple[str, ...]):
        # one-arg lambda via closure: a default-arg lambda would have
        # arity 2 and F.filter would feed it the element INDEX
        return lambda t: t.isin(*ts)

    scores = [
        F.size(F.filter(toks, _hit_counter(dtoks))).alias(f"sc_{i}")
        for i, (_, dtoks) in enumerate(_DOMAINS)]
    scored = d.select("doc_id", "lang", *scores)
    pairs = F.array(*[
        F.struct(F.lit(name).alias("dom"), F.col(f"sc_{i}").alias("sc"))
        for i, (name, _) in enumerate(_DOMAINS)])
    pick = (scored.select("doc_id", "lang", F.explode(pairs).alias("p"))
            .withColumn("rn", F.row_number().over(
                Window.partitionBy("doc_id")
                .orderBy(F.col("p.sc").desc(), F.col("p.dom"))))
            .filter(F.col("rn") == 1))
    return (pick.groupBy(F.col("p.dom").alias("domain"), "lang")
            .agg(F.count("*").alias("n_docs")))


_FERT_BPE = f"len(regexp_extract_all(text, '{_BPE_PAT}'))"


@register("text_tokenizer_fertility", f"""
SELECT lang,
       count(*) AS n_docs,
       sum({_FERT_BPE})::BIGINT AS n_bpe_tokens,
       sum(len(string_split(text, ' ')))::BIGINT AS n_ws_tokens,
       sum(length(text))::BIGINT AS n_chars,
       {sql_rnd(f"sum({_FERT_BPE})::DOUBLE"
                " / sum(len(string_split(text, ' ')))", 4)} AS bpe_per_word,
       {sql_rnd(f"sum(length(text))::DOUBLE / sum({_FERT_BPE})", 4)}
           AS chars_per_bpe_token
FROM documents
GROUP BY lang
""")
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish tokens per whitespace
    word and characters per token — THE number multilingual training
    budgets turn on (a language with 2x fertility pays 2x the context
    window for the same text; data-mix weights and per-language cost
    models both start here). Uses the same POSIX-simple pre-tokenizer
    regex as `text_token_bpe`, aggregated to the per-language view.

    Scale shape: tokenization is a map-only scan expression; the only
    shuffle carries (lang, partial sums) — 5 groups. The ratios
    divide two exact int64 sums, so both engines round the identical
    double (no accumulation-order exposure at all).
    """
    d = load_table(spark, sf_dir, "documents")
    n_bpe = F.size(F.expr(f"regexp_extract_all(text, '{_BPE_PAT}', 0)"))
    n_ws = F.size(F.split("text", " "))
    return (d.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(n_bpe).alias("n_bpe_tokens"),
                 F.sum(n_ws).alias("n_ws_tokens"),
                 F.sum(F.length("text")).alias("n_chars"))
            .select("lang", "n_docs", "n_bpe_tokens", "n_ws_tokens",
                    "n_chars",
                    # ratio is NULL when the denominator is 0 (a lang
                    # shard of empty/whitespace docs) — DuckDB's native
                    # x/0 semantics; Spark ANSI would throw instead
                    rnd(F.when(F.col("n_ws_tokens") > 0,
                               F.col("n_bpe_tokens").cast("double")
                               / F.col("n_ws_tokens")), 4)
                    .alias("bpe_per_word"),
                    rnd(F.when(F.col("n_bpe_tokens") > 0,
                               F.col("n_chars").cast("double")
                               / F.col("n_bpe_tokens")), 4)
                    .alias("chars_per_bpe_token")))


@register("text_perplexity_ngram", """
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS l
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
), uni AS (
  SELECT w, count(*)::BIGINT AS c
  FROM (SELECT unnest(l) AS w FROM toks) GROUP BY 1
), tot AS (SELECT sum(c)::BIGINT AS t FROM uni),
bg AS (
  SELECT doc_id, source, l[i] AS w1, l[i + 1] AS w2
  FROM toks, LATERAL unnest(generate_series(1, len(l) - 1)) AS u(i)
  WHERE len(l) >= 2
), bgc AS (
  SELECT w1, w2, count(*)::BIGINT AS bc FROM bg GROUP BY 1, 2
), scored AS (
  SELECT bg.doc_id, bg.source,
         floor(-ln(0.75::DOUBLE * bgc.bc / u1.c
                   + 0.25::DOUBLE * u2.c / tot.t) * 1000000.0::DOUBLE
               + 0.5::DOUBLE)::BIGINT AS v_u
  FROM bg
  JOIN bgc ON bg.w1 = bgc.w1 AND bg.w2 = bgc.w2
  JOIN uni u1 ON bg.w1 = u1.w
  JOIN uni u2 ON bg.w2 = u2.w
  CROSS JOIN tot
), per_doc AS (
  SELECT doc_id, source, sum(v_u) // count(*) AS doc_ce_u
  FROM scored GROUP BY 1, 2
)
SELECT source, count(*)::BIGINT AS n_docs,
       floor((sum(doc_ce_u)::DOUBLE / count(*) / 1000000.0::DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS avg_ce,
       max(doc_ce_u)::DOUBLE / 1000000.0::DOUBLE AS max_ce
FROM per_doc GROUP BY source
""")
def text_perplexity_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring: a Jelinek-Mercer-interpolated
    BIGRAM language model is trained on the corpus itself (one counts
    pass) and every document is scored by its mean bigram surprisal
    (cross-entropy in nats) — the filter that separates fluent text
    from gibberish in production pretraining pipelines; reported per
    source (avg + worst doc), the granularity a curation run acts on.

    p(w2|w1) = 0.75·B(w1,w2)/U(w1) + 0.25·U(w2)/T — the unigram
    backoff term can never be zero for in-corpus tokens, so no
    smoothing guards are needed. Determinism design: each bigram's
    surprisal is QUANTIZED TO MICRO-NATS (floor(−ln p·1e6+0.5) over
    exact integer counts) the moment it leaves the ln(), so every
    aggregation after that — per-doc sums, the per-doc mean
    (integer DIV), per-source sums — is EXACT integer arithmetic with
    no float association anywhere; ln's ≤1-ulp cross-engine drift
    (PARITY #31) is absorbed by the micro-nat grid (boundary
    distances pinned in tests/test_guard_band.py). Scale shape: LM
    counts are map-side-combinable aggregates; scoring is a posting
    join on the bigram key (corpus-sized, shuffle-partitioned, never
    broadcast), and the doc/source rollups ride exact integers.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = (d.filter(F.col("text").isNotNull()
                     & F.col("source").isNotNull())
            .select("doc_id", "source", F.split("text", " ").alias("l")))
    uni = (toks.select(F.explode("l").alias("w"))
           .groupBy("w").agg(F.count("*").alias("c")))
    tot = uni.agg(F.sum("c").alias("t"))
    bigrams = F.expr(
        "transform(sequence(1, size(l) - 1),"
        " i -> struct(element_at(l, i) as w1, element_at(l, i + 1) as w2))")
    bg = (toks.filter(F.size("l") >= 2)
          .select("doc_id", "source", F.explode(bigrams).alias("b"))
          .select("doc_id", "source",
                  F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")))
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("bc"))
    p = (F.lit(0.75) * F.col("bc") / F.col("c1")
         + F.lit(0.25) * F.col("c2") / F.col("t"))
    scored = (bg
              .join(bgc, ["w1", "w2"])
              .join(uni.select(F.col("w").alias("w1"),
                               F.col("c").alias("c1")), "w1")
              .join(uni.select(F.col("w").alias("w2"),
                               F.col("c").alias("c2")), "w2")
              .crossJoin(F.broadcast(tot))
              .select("doc_id", "source",
                      F.floor(-F.log(p) * 1000000.0 + 0.5)
                      .cast("long").alias("v_u")))
    per_doc = (scored.groupBy("doc_id", "source")
               .agg(F.expr("sum(v_u) div count(*)").alias("doc_ce_u")))
    return (per_doc.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 rnd(F.sum("doc_ce_u").cast("double") / F.count("*")
                     / 1000000.0, 6).alias("avg_ce"),
                 (F.max("doc_ce_u").cast("double") / 1000000.0)
                 .alias("max_ce")))
