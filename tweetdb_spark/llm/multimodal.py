"""Multimodal-column operators (north star: image/audio/video as
opaque binary columns with typed metadata).

The pattern for 100 TB multimodal stores:
  - payloads live in a ``binary`` column (or object-store URIs),
    metadata in typed sibling columns;
  - decode / feature-extract / resize / frame-sample run as
    Arrow-batched ``mapInPandas`` stages — Python touches each batch
    once, schema declared up front, no driver involvement;
  - partitioning carries over from the scan (no shuffle: decode is a
    narrow map).

No image/audio codec libraries exist in this environment, so the
codec call itself is STUBBED: :func:`decode_image` raises
``NotImplementedError`` unless Pillow is importable, and the
*registered operators* use :func:`fake_decode` — a deterministic
byte-arithmetic stand-in — so the Spark-side plumbing (binary schema,
Arrow batch shape, UDF signature, partition behavior) is real and
oracle-checkable end-to-end.  The fixture payload is the documents'
utf-8 bytes standing in for encoded media.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tweetdb_spark.registry import query

def _ascii_sane(col: str):
    """Replace non-printable-ASCII codepoints with '?' so the synthetic
    payload's bytes equal its codepoints on any corpus — keeps the
    byte-level UDFs and the character-level DuckDB oracles equivalent
    (real opaque payloads skip this; their oracle is bytes-only
    metadata as in multimodal_meta)."""
    from pyspark.sql import functions as F

    return F.regexp_replace(col, "[^ -~]", "?")


# frame_idx is serialized '|'-joined rather than array<int>: array cells
# crash the driver's pandas canonicalizer (r01 agg_collect), and the
# sampled indices are small ints so the encoding is lossless
DECODED_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, n_frames int, "
    "resized_w int, resized_h int, frame_idx string"
)


def decode_image(payload: bytes):
    """Real codec path — requires an image library (not provisioned).

    On a production cluster this body is ``PIL.Image.open(io.BytesIO(
    payload))`` (or pyav for video); the surrounding mapInPandas
    plumbing is unchanged.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env has no codecs
        raise NotImplementedError(
            "image codec not available in this environment; "
            "operators use fake_decode() instead"
        ) from exc
    raise NotImplementedError("wire PIL decode here when codecs are provisioned")


def fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in decoder: (width, height, n_frames) from
    the leading bytes.  Exists so the full pipeline is testable and
    oracle-checkable without codec libraries."""
    width = payload[0] % 64 + 16 if payload else 16
    height = payload[1] % 64 + 16 if len(payload) > 1 else 16
    n_frames = len(payload) % 7 + 1
    return width, height, n_frames


@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5,
           'application/octet-stream' AS media_type
    FROM documents
    """,
)
def multimodal_meta(spark, t):
    """Typed metadata over an opaque binary payload column.

    ``encode(text)`` materializes the binary column; length and
    content hash are computed JVM-side (no Python) — the manifest
    columns every multimodal table carries next to its payload.
    """
    payload = F.encode("text", "utf-8")
    return t["documents"].select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
        F.lit("application/octet-stream").alias("media_type"),
    )


@query(
    "multimodal_features",
    oracle="""
    WITH sane AS (
      -- ASCII-sanitize so codepoints == bytes on any corpus (the Spark
      -- side applies the identical replacement before encoding)
      SELECT doc_id, regexp_replace(text, '[^ -~]', '?', 'g') AS text
      FROM documents
    ), bytes AS (
      SELECT doc_id,
             ascii(substr(text, CAST(i AS INT), 1)) // 32 AS bucket
      FROM sane, LATERAL unnest(range(1, length(text) + 1)) AS t(i)
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN bucket = 0 THEN 1 ELSE 0 END) AS BIGINT) AS f0,
           CAST(SUM(CASE WHEN bucket = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(SUM(CASE WHEN bucket = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
           CAST(SUM(CASE WHEN bucket = 3 THEN 1 ELSE 0 END) AS BIGINT) AS f3,
           CAST(SUM(CASE WHEN bucket >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS f_hi,
           count(*) AS n_bytes
    FROM bytes GROUP BY doc_id
    """,
)
def multimodal_features(spark, t):
    """Feature extraction over binary payloads (byte-histogram stub).

    The feature-extract stage of the multimodal pipeline as an
    Arrow-batched ``mapInPandas``: each payload reduces to a fixed-dim
    feature vector (here a 5-bin byte histogram; a real extractor
    returns CLIP/codec features from the same signature).  Fixed-width
    typed output columns — the shape a downstream embedding table
    ingests.  Deterministic, so fully oracle-checked.
    """
    src = t["documents"].select(
        "doc_id", F.encode(_ascii_sane("text"), "utf-8").alias("payload")
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    # a payload with no bytes contributes no byte rows:
                    # the oracle's LATERAL unnest(range(...)) drops the
                    # doc entirely, so the UDF must too (r11 NULL-survey
                    # catch — bytes(None) used to crash the UDF)
                    continue
                raw = bytes(payload)
                hist = [0, 0, 0, 0, 0]
                for b in raw:
                    hist[min(b // 32, 4)] += 1
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "f0": hist[0],
                        "f1": hist[1],
                        "f2": hist[2],
                        "f3": hist[3],
                        "f_hi": hist[4],
                        "n_bytes": len(raw),
                    }
                )
            yield pd.DataFrame(out)

    return src.mapInPandas(
        featurize,
        "doc_id long, f0 long, f1 long, f2 long, f3 long, f_hi long, n_bytes long",
    )


@query(
    "multimodal_decode_stub",
    oracle="""
    WITH sane AS (
      SELECT doc_id, regexp_replace(text, '[^ -~]', '?', 'g') AS text
      FROM documents
    ), d AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             ascii(substr(text, 1, 1)) % 64 + 16 AS width,
             ascii(substr(text, 2, 1)) % 64 + 16 AS height,
             octet_length(encode(text)) % 7 + 1 AS n_frames
      FROM sane
    )
    SELECT doc_id, n_bytes, width, height, n_frames,
           width // 2 AS resized_w,
           height // 2 AS resized_h,
           array_to_string(range(0, n_frames, 2), '|') AS frame_idx
    FROM d
    """,
)
def multimodal_decode_stub(spark, t):
    """Decode → resize → frame-sample pipeline over binary payloads.

    ``mapInPandas``: each Arrow batch of (doc_id, payload) rows is
    decoded in Python, emitting typed media columns + a frame-sample
    index array (every 2nd frame).  The decoder is the deterministic
    stub (see module docstring); swap :func:`fake_decode` for
    :func:`decode_image` when codecs exist — schema and plumbing are
    the production shape either way.
    """
    src = t["documents"].select(
        "doc_id", F.encode(_ascii_sane("text"), "utf-8").alias("payload")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    # NULL payload → all media columns NULL, mirroring
                    # the oracle's NULL propagation (r11 NULL-survey)
                    out.append(
                        {
                            "doc_id": int(doc_id),
                            "n_bytes": None,
                            "width": None,
                            "height": None,
                            "n_frames": None,
                            "resized_w": None,
                            "resized_h": None,
                            "frame_idx": None,
                        }
                    )
                    continue
                raw = bytes(payload)
                width, height, n_frames = fake_decode(raw)
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "n_bytes": len(raw),
                        "width": width,
                        "height": height,
                        "n_frames": n_frames,
                        "resized_w": width // 2,
                        "resized_h": height // 2,
                        "frame_idx": "|".join(
                            str(i) for i in range(0, n_frames, 2)
                        ),
                    }
                )
            yield pd.DataFrame(out)

    return src.mapInPandas(decode_batches, DECODED_SCHEMA)


@query(
    "multimodal_dedup",
    oracle="""
    SELECT md5(text) AS payload_md5,
           MIN(doc_id) AS keep_doc_id,
           count(*) AS n_copies,
           CAST(MIN(octet_length(encode(text))) AS BIGINT) AS n_bytes
    FROM documents
    GROUP BY 1
    """,
)
def multimodal_dedup(spark, t):
    """Exact dedup on opaque binary payloads: group by payload md5,
    keep the first doc_id — dedup_exact's shape applied to the
    multimodal column (same fixture stand-in as multimodal_meta:
    ``encode(text)`` materializes the bytes; a real table would carry
    image/audio bytes or object-store URIs plus a content hash).

    The shuffle carries a 32-hex digest + two ints per row, never the
    payload — the property that makes binary dedup viable at 100 TB,
    where payloads are MBs and the hash column is what you'd persist
    at ingest so dedup never re-reads the blobs at all (byte length
    rides along as the tiebreak-stable metadata the keeper inherits).
    """
    payload = F.encode("text", "utf-8")
    return (
        t["documents"]
        .select(
            F.md5(payload).alias("payload_md5"),
            "doc_id",
            F.octet_length(payload).alias("n_bytes"),
        )
        .groupBy("payload_md5")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
            F.min("n_bytes").cast("bigint").alias("n_bytes"),
        )
    )


@query(
    "multimodal_shard_manifest",
    oracle="""
    WITH blobs AS (
      SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    ), ordered AS (
      SELECT doc_id, n_bytes,
             ((doc_id % 2147483647) * 2654435761) % 2147483647 AS shuf,
             SUM(n_bytes) OVER (
               ORDER BY ((doc_id % 2147483647) * 2654435761) % 2147483647,
                        doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_bytes AS offset_global
      FROM blobs
    )
    SELECT doc_id, n_bytes,
           CAST(offset_global // 65536 AS BIGINT) AS shard_id,
           CAST(offset_global % 65536 AS BIGINT) AS shard_offset
    FROM ordered
    """,
)
def multimodal_shard_manifest(spark, t):
    """WebDataset-style shard packing for blob corpora: assign every
    payload a (shard, byte-offset) in deterministically shuffled
    order, 64 KB target shards — the manifest a training dataloader
    reads to fetch samples with ONE ranged GET each.

    Large-scale multimodal training wants few big archives, not 10^9
    tiny objects; the builder needs (a) a reproducible global sample
    order (the same portable multiplicative shuffle as
    ``corpus_shuffle``), (b) exact byte offsets (running SUM window
    over blob lengths, lengths computed JVM-side from the binary
    column — payloads never leave the executors), and (c) shard
    boundaries by cumulative byte budget, so shards are size-uniform
    regardless of per-blob size skew.  All integer arithmetic — the
    whole manifest is value-hash-checked.  At 100 TB: ONE global-sort
    shuffle of (id, length) pairs — bytes don't move until the final
    shard write streams them in manifest order; appending a new batch
    re-runs only the tail (offsets are monotone in the shuffle key).
    A row whose blob exceeds the budget simply spans shards, exactly
    like tar.  The prefix sum is TWO-LEVEL (within 64 contiguous
    key-range groups, plus a 64-row base-offset table) — no global
    window ever sees the corpus, same trick as corpus_pack.
    """
    shuf = "((doc_id % 2147483647) * 2654435761) % 2147483647"
    # two-level prefix sum (corpus_pack's pattern): the shuffle-key
    # space splits into 64 CONTIGUOUS ranges, so (group, within-group
    # order) == global order; running sums parallelize across groups
    # and only the 64 group totals see a global window — never the
    # corpus.  Output values identical to a single global window.
    grp = F.expr(f"({shuf}) div {(2147483647 // 64) + 1}")
    blobs = t["documents"].select(
        "doc_id",
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
        F.expr(shuf).alias("shuf"),
        grp.alias("grp"),
    )
    w_in = (
        Window.partitionBy("grp")
        .orderBy("shuf", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = blobs.withColumn(
        "cum_in", F.sum("n_bytes").over(w_in) - F.col("n_bytes")
    )
    w_base = Window.orderBy("grp").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        blobs.groupBy("grp")
        .agg(F.sum("n_bytes").alias("grp_bytes"))
        .withColumn("base", F.coalesce(F.sum("grp_bytes").over(w_base), F.lit(0)))
        .select("grp", "base")
    )
    ordered = within.join(F.broadcast(bases), "grp").withColumn(
        "offset_global", F.col("base") + F.col("cum_in")
    )
    return ordered.select(
        "doc_id",
        "n_bytes",
        F.expr("offset_global div 65536").alias("shard_id"),
        (F.col("offset_global") % 65536).cast("long").alias("shard_offset"),
    )
