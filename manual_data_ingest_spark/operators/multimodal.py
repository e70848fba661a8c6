"""Multimodal (binary) column operators (north star, driver BASELINE.json:6).

Images / audio / video are opaque ``binary`` columns with typed
metadata. The container ships no image/audio libraries, so the DECODE
step is a deterministic fake behind an import-try (see
``_try_real_decoder``) — but everything Spark-side is real and tested:
the binary column itself, Arrow batch transfer, ``mapInPandas``
signatures, output schemas, and the metadata math.

The fixture has no binary media, so binaries are synthesized
deterministically: ``image = utf-8 bytes of documents.text``. The
DuckDB oracles are BYTE-TRUE (``encode(text)`` + hex-dump slicing —
see ``_BYTE_SUM_SQL``), so they stay exact on non-ASCII text too; the
old character-function forms only agreed on a pure-ASCII corpus.

Scale notes: media decode is the textbook mapInPandas workload — pure
per-row CPU, no shuffle, linear scaling with executors; keep batch
sizes bounded via spark.sql.execution.arrow.maxRecordsPerBatch when
rows are megabytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from manual_data_ingest_spark.io import load_table
from manual_data_ingest_spark.functions.rounding import rnd, sql_rnd
from manual_data_ingest_spark.registry import register


def _try_real_decoder():
    """Return a real image decoder if the environment has one.

    This container ships neither Pillow nor OpenCV, so production decode
    raises and the deterministic stub below is used. The stub keeps the
    same (bytes) -> (width, height, channels, checksum) contract.
    """
    try:  # pragma: no cover — not installed in this environment
        import PIL.Image  # noqa: F401

        def real_decode(buf: bytes):
            raise NotImplementedError(
                "real decode path: PIL present but fixture bytes are not "
                "images; wire actual media here in production")

        return real_decode
    except ImportError:
        return None


# Byte-true oracle fragments (single-sourced). DuckDB's `text::BLOB`
# cast REJECTS non-ASCII bytes ("Invalid byte encountered" — the cast
# parses \x escapes, it does not re-encode), so string→bytes is
# `encode(text)`; and per-byte access has no blob indexing, so bytes
# are read from the hex dump two characters at a time. Both verified
# equal to Python's utf-8 encode on multilingual probes. The Spark
# side (numpy over Arrow binary batches) is byte-true by construction,
# so these fragments make the ORACLE match it beyond ASCII — the old
# `ascii(substring(text, i, 1))` form was codepoint-based and only
# agreed because the stock corpus is pure ASCII.
_NBYTES_SQL = "octet_length(encode(text))"
_BYTE_SUM_SQL = (
    "list_sum(list_transform("
    f" generate_series(1, {_NBYTES_SQL}),"
    " i -> ('0x' || substring(hex(encode(text)), 2*i-1, 2))::INT))")


@register("multimodal_manifest", """
SELECT doc_id,
       'image/fake' AS media_type,
       md5(text) AS media_md5,
       octet_length(encode(text)) AS n_bytes
FROM documents
""")
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # typed-metadata manifest over an opaque binary column — md5/length
    # computed JVM-side on the BYTES (no Python boundary)
    d = load_table(spark, sf_dir, "documents")
    media = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        F.md5(media).alias("media_md5"),
        F.length(media).alias("n_bytes"))


@register("multimodal_decode", f"""
SELECT doc_id,
       octet_length(encode(text))             AS n_bytes,
       1 + octet_length(encode(text)) % 640   AS width,
       1 + octet_length(encode(text)) % 480   AS height,
       3                                    AS channels,
       CASE WHEN text IS NOT NULL
            THEN (coalesce({_BYTE_SUM_SQL}, 0) % 2147483647)::BIGINT
       END AS px_checksum,
       (1 + octet_length(encode(text)) % 640) * 64
           // greatest(1 + octet_length(encode(text)) % 640,
                       1 + octet_length(encode(text)) % 480) AS thumb_w,
       (1 + octet_length(encode(text)) % 480) * 64
           // greatest(1 + octet_length(encode(text)) % 640,
                       1 + octet_length(encode(text)) % 480) AS thumb_h
FROM documents
""")
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # image decode + resize-stub over mapInPandas: bytes cross JVM→Python
    # as Arrow binary batches; numpy computes per-image features; the
    # resize is integer aspect-preserving math (thumb bounded to 64px).
    import numpy as np
    import pandas as pd

    real = _try_real_decoder()

    def decode(batches):
        for pdf in batches:
            n_bytes, width, height, checksum = [], [], [], []
            thumb_w, thumb_h = [], []
            for buf in pdf["media"]:
                if real is not None:  # pragma: no cover
                    raise NotImplementedError("real decoder not wired")
                if buf is None:
                    # decode(NULL) = NULL: a missing buffer has no
                    # decodable metadata (channels stays the constant
                    # format declaration — same as the oracle's literal)
                    n_bytes.append(None)
                    width.append(None)
                    height.append(None)
                    checksum.append(None)
                    thumb_w.append(None)
                    thumb_h.append(None)
                    continue
                arr = np.frombuffer(buf, dtype=np.uint8)
                n = arr.size
                w = 1 + n % 640
                h = 1 + n % 480
                m = max(w, h)
                n_bytes.append(n)
                width.append(w)
                height.append(h)
                checksum.append(int(arr.sum(dtype=np.int64)) % 2147483647)
                thumb_w.append(w * 64 // m)
                thumb_h.append(h * 64 // m)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "width": width,
                "height": height,
                "channels": 3,
                "px_checksum": checksum,
                "thumb_w": thumb_w,
                "thumb_h": thumb_h,
            })

    d = load_table(spark, sf_dir, "documents")
    # NO fan_out here (measured r12): repartitioning the binary media
    # column shuffles the heavy payload bytes to parallelize a decode
    # that is too cheap to amortize them (0.27→0.53 s at sf0.1,
    # 0.34→0.91 s at 4×) — the guide §8 rule (move heavy bytes as few
    # times as possible) beats the §2.5 unsplittable-input remedy when
    # the per-byte work is trivial.
    media = d.select("doc_id", F.col("text").cast("binary").alias("media"))
    return media.mapInPandas(
        decode,
        schema="doc_id long, n_bytes long, width long, height long, "
               "channels int, px_checksum long, thumb_w long, thumb_h long")


@register("multimodal_frame_sample", """
SELECT doc_id,
       CASE WHEN octet_length(encode(text)) = 0 THEN 0
            ELSE (octet_length(encode(text)) - 1) // 500 + 1 END AS n_frames,
       CASE WHEN octet_length(encode(text)) = 0 THEN NULL
            ELSE ('0x' || substring(hex(encode(text)), 1, 2))::INT
       END AS first_frame_byte,
       CASE WHEN octet_length(encode(text)) = 0 THEN NULL
            ELSE ('0x' || substring(hex(encode(text)),
                 2 * (((octet_length(encode(text)) - 1) // 500) * 500 + 1)
                   - 1, 2))::INT
       END AS last_frame_byte
FROM documents
""")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # video frame-sampling stub: every 500th byte is a "frame"; real
    # decoders swap into the same mapInPandas slot with the same schema.
    d = load_table(spark, sf_dir, "documents")
    # NO fan_out here (measured r12): repartitioning the binary media
    # column shuffles the heavy payload bytes to parallelize a decode
    # that is too cheap to amortize them (0.27→0.53 s at sf0.1,
    # 0.34→0.91 s at 4×) — the guide §8 rule (move heavy bytes as few
    # times as possible) beats the §2.5 unsplittable-input remedy when
    # the per-byte work is trivial.
    media = d.select("doc_id", F.col("text").cast("binary").alias("media"))
    return media.mapInPandas(
        _frame_sample_batches, schema=_FRAME_SAMPLE_SCHEMA)


_FRAME_SAMPLE_SCHEMA = ("doc_id long, n_frames long, "
                        "first_frame_byte long, last_frame_byte long")


def _frame_sample_batches(batches):
    """mapInPandas body for frame sampling. Zero-length media is a
    first-class case (this is the designated real-media slot): 0 frames,
    NULL first/last bytes — advisor-flagged IndexError guard, unit-tested
    in test_unit_operators.py."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        n_frames, first_b, last_b = [], [], []
        for buf in pdf["media"]:
            if buf is None:  # decode(NULL) = NULL; b"" stays the 0-frame case
                n_frames.append(None)
                first_b.append(None)
                last_b.append(None)
                continue
            arr = np.frombuffer(buf, dtype=np.uint8)
            frames = arr[::500]
            n_frames.append(len(frames))
            first_b.append(int(frames[0]) if len(frames) else None)
            last_b.append(int(frames[-1]) if len(frames) else None)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "n_frames": n_frames,
                            "first_frame_byte": first_b,
                            "last_frame_byte": last_b})


@register("multimodal_audio_stub", f"""
SELECT doc_id,
       {sql_rnd('octet_length(encode(text)) / 16000.0', 6)} AS duration_sec,
       16000 AS sample_rate,
       CASE WHEN text IS NOT NULL THEN
         {sql_rnd(f'(coalesce({_BYTE_SUM_SQL}, 0) % 1000) / 1000.0', 6)}
       END AS rms_stub
FROM documents
""")
def multimodal_audio_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    # audio feature extraction stub: 16 kHz mono PCM interpretation of the
    # bytes; duration + a deterministic rms placeholder. librosa/torchaudio
    # are absent in this container — the real path is the same mapInPandas
    # shape with the stub swapped out.
    import numpy as np
    import pandas as pd

    def features(batches):
        for pdf in batches:
            dur, rms = [], []
            for buf in pdf["media"]:
                if buf is None:  # decode(NULL) = NULL (rate is the format const)
                    dur.append(None)
                    rms.append(None)
                    continue
                arr = np.frombuffer(buf, dtype=np.uint8)
                dur.append(np.floor(arr.size / 16000.0 * 1e6 + 0.5) / 1e6)
                rms.append(np.floor((int(arr.sum(dtype=np.int64)) % 1000)
                                    / 1000.0 * 1e6 + 0.5) / 1e6)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "duration_sec": dur,
                                "sample_rate": 16000, "rms_stub": rms})

    d = load_table(spark, sf_dir, "documents")
    # NO fan_out here (measured r12): repartitioning the binary media
    # column shuffles the heavy payload bytes to parallelize a decode
    # that is too cheap to amortize them (0.27→0.53 s at sf0.1,
    # 0.34→0.91 s at 4×) — the guide §8 rule (move heavy bytes as few
    # times as possible) beats the §2.5 unsplittable-input remedy when
    # the per-byte work is trivial.
    media = d.select("doc_id", F.col("text").cast("binary").alias("media"))
    return media.mapInPandas(
        features, schema="doc_id long, duration_sec double, "
                         "sample_rate int, rms_stub double")


@register("multimodal_aspect_bucket", """
WITH sized AS (
  SELECT doc_id,
         1 + octet_length(encode(text)) % 640 AS w,
         1 + octet_length(encode(text)) % 480 AS h
  FROM documents WHERE text IS NOT NULL
), tagged AS (
  SELECT doc_id, w, h, (w * 1000) // h AS rm,
         CASE WHEN (w * 1000) // h < 500 THEN 0
              WHEN (w * 1000) // h < 750 THEN 1
              WHEN (w * 1000) // h < 900 THEN 2
              WHEN (w * 1000) // h < 1111 THEN 3
              WHEN (w * 1000) // h < 1333 THEN 4
              WHEN (w * 1000) // h < 2000 THEN 5
              ELSE 6 END AS bucket_id
  FROM sized
), dims AS (
  SELECT bucket_id,
         [896, 768, 704, 576, 512, 448, 384][bucket_id + 1] AS bh,
         [384, 448, 512, 576, 704, 768, 896][bucket_id + 1] AS bw
  FROM (SELECT DISTINCT bucket_id FROM tagged)
)
SELECT t.bucket_id,
       count(*) AS n_images,
       min(t.rm)::BIGINT AS min_ratio_m,
       max(t.rm)::BIGINT AS max_ratio_m,
       sum(t.w * t.h)::BIGINT AS native_pixels,
       max(d.bw)::BIGINT AS bucket_w,
       max(d.bh)::BIGINT AS bucket_h,
       (2097152 // (max(d.bw) * max(d.bh)))::BIGINT AS batch_capacity,
       ((count(*) + 2097152 // (max(d.bw) * max(d.bh)) - 1)
        // (2097152 // (max(d.bw) * max(d.bh))))::BIGINT AS n_batches
FROM tagged t JOIN dims d USING (bucket_id)
GROUP BY t.bucket_id
""")
def multimodal_aspect_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing report (r11) — the batching prep every
    image-training pipeline runs (the SDXL recipe): images batch
    efficiently only with SAME-resolution peers, so each image joins
    the nearest of 7 canonical aspect buckets (w:h from 384×896
    portrait to 896×384 landscape around a 576² square) and the
    report gives per-bucket volume, native-pixel mass, the per-batch
    capacity under a 2^21-pixel budget, and how many batches the
    bucket fills.

    Numeric discipline: dimensions come from the same deterministic
    stub as `multimodal_decode` (1 + n_bytes mod 640/480 — real
    decoders are env-gated); the ratio key is INTEGER milli-ratio
    (w·1000 div h) against integer breakpoints, so bucket boundaries
    are exact on both engines — no float ratio ever exists. Pure
    JVM expressions end-to-end (no UDF): one hash aggregate over a
    map-side-computed bucket id; the canonical-dimension lookup is a
    7-entry CASE, constant-folded.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    media = F.col("text").cast("binary")
    n = F.length(media)
    w = (n % 640 + 1).cast("long")
    h = (n % 480 + 1).cast("long")
    sized = d.select("doc_id", w.alias("w"), h.alias("h"))
    rm = F.expr("w * 1000 div h")
    breaks = [500, 750, 900, 1111, 1333, 2000]
    bucket = F.lit(6)
    for i, b in reversed(list(enumerate(breaks))):
        bucket = F.when(rm < b, F.lit(i)).otherwise(bucket)
    widths = [384, 448, 512, 576, 704, 768, 896]
    bw = F.lit(None).cast("long")
    bh = F.lit(None).cast("long")
    for i, wv in enumerate(widths):
        bw = F.when(F.col("bucket_id") == i, F.lit(wv).cast("long")) \
              .otherwise(bw)
        bh = F.when(F.col("bucket_id") == i,
                    F.lit(widths[6 - i]).cast("long")).otherwise(bh)
    tagged = sized.select("doc_id", "w", "h", rm.alias("rm"),
                          bucket.alias("bucket_id"))
    agg = (tagged.groupBy("bucket_id")
           .agg(F.count("*").alias("n_images"),
                F.min("rm").alias("min_ratio_m"),
                F.max("rm").alias("max_ratio_m"),
                F.sum(F.col("w") * F.col("h")).alias("native_pixels")))
    cap = (F.lit(2097152).cast("long") / (bw * bh)).cast("long")
    return (agg.withColumn("bucket_w", bw)
            .withColumn("bucket_h", bh)
            .withColumn("batch_capacity", cap)
            .withColumn("n_batches",
                        F.expr("(n_images + batch_capacity - 1)"
                               " div batch_capacity")))


@register("multimodal_shard_assign", """
WITH sized AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
), packed AS (
  SELECT doc_id, n_bytes,
         ((sum(n_bytes) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - n_bytes) // 10000)::BIGINT AS shard_id
  FROM sized
)
SELECT shard_id,
       count(*) AS n_items,
       sum(n_bytes)::BIGINT AS total_bytes,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM packed GROUP BY shard_id
""")
def multimodal_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard assignment: pack media records into
    ~10 KB shards by START-OFFSET binning — shard_id = floor(cumulative
    bytes BEFORE this record / capacity) over the deterministic doc_id
    order, so every record lands in exactly one shard, shard boundaries
    are reproducible, and consecutive records stay together (the
    property dataloader streaming needs).

    The running sum is the one global-order operation; since r9 it
    EXECUTES hierarchically (tools/plan_audit.py flagged the original
    unpartitioned-window form): `with_exact_running_sum`
    (functions/ranking.py) buckets on doc_id quantile cuts, running-
    sums bytes per bucket under a PARTITIONED window, and adds
    broadcast cumulative bucket-byte offsets — exact because bytes are
    integers and bucket-major order is the doc_id order. Shard
    manifests (this output) are what the training job mounts; the
    tar-bytes concat itself is a `foreachPartition` writer downstream.
    """
    from manual_data_ingest_spark.functions.ranking import (
        with_exact_running_sum)

    d = load_table(spark, sf_dir, "documents")
    sized = d.select("doc_id",
                     F.octet_length(F.col("text").cast("binary"))
                     .alias("n_bytes"))
    packed = (with_exact_running_sum(sized, "n_bytes", "doc_id", [])
              .withColumn("shard_id",
                          F.expr("(running_sum - n_bytes) div 10000")))
    return (packed.groupBy("shard_id")
            .agg(F.count("*").alias("n_items"),
                 F.sum("n_bytes").alias("total_bytes"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc")))


@register("multimodal_phash_dedup", """
WITH hx AS MATERIALIZED (
    SELECT doc_id, hex(encode(text)) AS h,
           octet_length(encode(text)) AS nb
    FROM documents
    WHERE text IS NOT NULL AND octet_length(encode(text)) > 0
), chars AS MATERIALIZED (
    -- byte-true bins: the Spark side histograms UTF-8 BYTES (numpy
    -- bincount over the Arrow binary), so the oracle reads bytes from
    -- the hex dump, not codepoints from substring()
    SELECT doc_id,
           ('0x' || substring(h, 2 * i - 1, 2))::INT // 16 AS bin
    FROM hx, unnest(generate_series(1, nb)) AS g(i)
), hist AS (
    SELECT doc_id, bin, count(*)::DOUBLE AS cnt FROM chars GROUP BY 1, 2
), avgc AS (
    SELECT doc_id, avg(cnt) AS a FROM hist GROUP BY 1
), ph AS (
    SELECT h.doc_id,
           sum(CASE WHEN h.cnt > avgc.a THEN (1::BIGINT << h.bin)
                    ELSE 0 END)::BIGINT AS phash
    FROM hist h JOIN avgc ON h.doc_id = avgc.doc_id
    GROUP BY h.doc_id
)
SELECT phash, count(*) AS n_docs,
       min(doc_id) AS keep_id, max(doc_id) AS max_dup_id
FROM ph GROUP BY phash HAVING count(*) >= 2
""")
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash dedup over the binary media column: documents
    whose byte-HISTOGRAM signature collides form a duplicate group
    (keep lowest id). A real deployment computes a DCT pHash inside the
    decode UDF (env-gated here like `multimodal_decode`); the stand-in
    is honestly perceptual-SHAPED — a 16-bin byte histogram thresholded
    at its own mean, so it is invariant to byte ORDER (re-encoded /
    shuffled media with the same intensity distribution collide), not
    an exact-content md5.

    Spark-side plumbing is the real thing: bytes cross to Python as
    Arrow binary batches via ``mapInPandas``, numpy ``bincount`` builds
    each histogram, and only the 8-byte signature returns — at 100 TB
    the shuffle carries (doc_id, phash), never media bytes, and the
    group-by is `dedup_exact`'s single hash-agg shape. The mean
    threshold divides identical operands in both engines (sum of int
    counts / bin count, one IEEE division), so the signature is
    hash-exact cross-engine.
    """
    import numpy as np
    import pandas as pd

    real = _try_real_decoder()

    def phash(batches):
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                if real is not None:  # pragma: no cover
                    raise NotImplementedError("real pHash not wired")
                arr = np.frombuffer(buf, dtype=np.uint8)
                counts = np.bincount(arr >> 4, minlength=16)
                nz = np.nonzero(counts)[0]
                a = counts[nz].sum() / float(len(nz))
                h = int(((counts[nz] > a).astype(np.int64)
                         << nz.astype(np.int64)).sum())
                ids.append(doc_id)
                hashes.append(h)
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    d = load_table(spark, sf_dir, "documents")
    media = (d.filter(F.col("text").isNotNull() & (F.length("text") > 0))
             .select("doc_id", F.col("text").cast("binary").alias("media")))
    sigs = media.mapInPandas(phash, schema="doc_id long, phash long")
    return (sigs.groupBy("phash")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("keep_id"),
                 F.max("doc_id").alias("max_dup_id"))
            .filter(F.col("n_docs") >= 2))


@register("multimodal_pair_batches", f"""
WITH pairs AS (
  SELECT d.doc_id, d.lang,
         length(d.text) - length(replace(d.text, ' ', '')) + 1 AS n_words,
         e.label,
         ('0x' || substr(md5(d.doc_id::VARCHAR || '|clip'), 1, 4))::INT % 16
             AS batch_id
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
  WHERE d.text IS NOT NULL AND e.embedding IS NOT NULL
)
SELECT batch_id,
       count(*) AS n_pairs,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT label) AS n_labels,
       {sql_rnd('avg(n_words::DOUBLE)', 4)} AS avg_words
FROM pairs GROUP BY batch_id
""")
def multimodal_pair_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-style contrastive-batch assembly: pair each caption
    (documents) with its media embedding (embeddings, vec_id = doc_id),
    assign pairs to 16 training batches by salted content-key hash, and
    report per-batch composition (pairs, language/label diversity, mean
    caption length) — the batch-balance audit run before contrastive
    training, where a batch full of near-identical captions collapses
    the loss.

    The pair join is id-keyed (co-partitionable/bucketable at 100 TB);
    batch assignment is map-side salted-md5 (the `sample_hash` portable
    pattern — reproducible across engines and backfills, unlike rand()
    batching); the report is one 16-group partial agg. Real media
    plumbing (binary columns, Arrow batches) lives in
    `multimodal_decode`/`frame_sample`; this operator is the PAIRING
    stage between them and the trainer.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull())
    n_words = (F.length("text")
               - F.length(F.regexp_replace("text", " ", "")) + 1)
    batch = F.expr(
        "cast(conv(substring(md5(concat(cast(doc_id as string), '|clip')),"
        " 1, 4), 16, 10) as int) % 16")
    return (d.join(e, d.doc_id == e.vec_id)
            .select("doc_id", "lang", "label",
                    n_words.alias("n_words"), batch.alias("batch_id"))
            .groupBy("batch_id")
            .agg(F.count("*").alias("n_pairs"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.countDistinct("label").alias("n_labels"),
                 rnd(F.avg(F.col("n_words").cast("double")), 4)
                 .alias("avg_words")))
