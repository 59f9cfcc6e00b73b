"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern (BASELINE.json north star): media travels as a ``binary``
column with a typed metadata struct beside it; decode/feature-extract
runs as Arrow-batched ``mapInPandas`` so each Python worker touches a
columnar batch, never a row at a time. The actual image/audio codecs
are NOT in this container, so the decode step is stubbed: the
deterministic fake decoder is the DEFAULT, and the real codec is an
explicit opt-in (``make_decode_batches(codec="real")``) — never chosen
by import detection.
The Spark-side plumbing — schema, batch iteration, partitioning — is
real and oracle-checked (the fake decode is pure arithmetic on byte
length, so DuckDB can verify the full pipeline).

At 100 TB: binary payloads stay columnar end-to-end (parquet binary →
Arrow batch → pandas), decode parallelism is per-partition, and the
metadata struct lets Catalyst prune/filter without touching payload
bytes (e.g. ``WHERE meta.n_bytes < 1e6`` never deserializes media).
"""

from __future__ import annotations

from pinot_pulsar_plugin_spark.caching import persist_once

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.operators.common import make_registry, t

QUERIES, ORACLE, query = make_registry()

# The decode codec is chosen EXPLICITLY (``make_decode_batches(codec=)``),
# never by import detection: the deterministic fake decoder is the
# default so the pipeline's behavior doesn't change if an image library
# happens to be installed; the real codec is opt-in.


def fake_decode_dims(n_bytes: int) -> tuple[int, int, int]:
    """Deterministic stand-in for a media decoder: dimensions derived
    from payload length. Replaced by a real codec when available."""
    return (n_bytes * 7) % 640 + 1, (n_bytes * 13) % 480 + 1, n_bytes % 30 + 1


@query(
    "m55_multimodal_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS digest,
           CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS modality
    FROM documents
    """,
)
def m55_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata columns: size, content digest,
    modality tag. The binary column itself stays internal (payload
    bytes never leave the JVM); only metadata is projected out."""
    d = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")  # stand-in binary media
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("digest"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
    )


_DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, n_frames int, feat_mean double"
)


def make_decode_batches(codec: str = "fake"):
    """Build the Arrow-batched decode function as a closure so
    cloudpickle serializes it BY VALUE — executors never need this
    package importable (same constraint as the pulsarlike source;
    driver processes may run from any cwd).

    ``codec="fake"`` (default) is the deterministic stand-in decoder;
    ``codec="real"`` is the opt-in hook where a production build would
    run ``Image.open(io.BytesIO(buf))`` / resize / frame-sample — it is
    a clearly-marked stub here because no image/audio library ships in
    this container. The choice is an explicit option, NOT import
    detection, so installing pillow can never change a green pipeline.
    """
    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec {codec!r}: expected 'fake' or 'real'")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            if codec == "real":
                raise NotImplementedError(
                    "real media decode is an opt-in stub: no image/audio "
                    "codec ships in this container (plumbing is identical "
                    "to the fake path: Arrow batch in, typed features out)"
                )
            n_bytes = pdf["payload"].map(len)
            width = (n_bytes * 7) % 640 + 1
            height = (n_bytes * 13) % 480 + 1
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width.astype("int32"),
                    "height": height.astype("int32"),
                    "n_frames": (n_bytes % 30 + 1).astype("int32"),
                    "feat_mean": (width + height) / 1000.0,
                }
            )

    return decode_batches


@query(
    "m56_decode_pipeline",
    """
    WITH b AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents)
    SELECT doc_id,
           CAST((n_bytes * 7) % 640 + 1 AS INTEGER) AS width,
           CAST((n_bytes * 13) % 480 + 1 AS INTEGER) AS height,
           CAST(n_bytes % 30 + 1 AS INTEGER) AS n_frames,
           CAST((n_bytes * 7) % 640 + 1 + (n_bytes * 13) % 480 + 1 AS DOUBLE)
             / 1000.0 AS feat_mean
    FROM b
    """,
)
def m56_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal decode pipeline through ``mapInPandas``: binary
    payload column → Arrow batch → (stub) decode → typed features. The
    oracle replays the deterministic fake decode in SQL, verifying the
    Python batch plumbing end-to-end (row alignment, dtype mapping,
    batch boundaries)."""
    d = t(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return payloads.mapInPandas(make_decode_batches(), schema=_DECODE_SCHEMA)


@query(
    "m57_frame_sample",
    """
    WITH b AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
      WHERE CAST(doc_id % 3 AS INTEGER) = 2),
    frames AS (
      SELECT doc_id, n_bytes,
             unnest(generate_series(0, CAST(n_bytes % 30 AS INTEGER), 5)) AS frame_idx
      FROM b)
    SELECT doc_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST((n_bytes * 7 + frame_idx * 31) % 256 AS INTEGER) AS frame_sig
    FROM frames
    """,
)
def m57_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over 'video' payloads (every 5th frame of the
    decoded n_frames): the explode-per-frame pattern a real video
    pipeline uses — one row per sampled frame with a per-frame feature.
    The decode is the deterministic fake (frame count from payload
    length, signature from arithmetic) so the full explode/project
    plumbing is oracle-checked; a real codec slots into the same shape
    via make_decode_batches(codec='real').

    Scale shape: explode multiplies rows ~6x but only (doc_id, n_bytes,
    frame_idx) travel — payload bytes never leave the scan; no shuffle
    at all (pure per-row generate + project)."""
    d = t(spark, sf_dir, "documents")
    vids = d.filter(F.col("doc_id") % 3 == 2).select(
        "doc_id", F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes")
    )
    frames = vids.select(
        "doc_id",
        "n_bytes",
        F.explode(
            F.sequence(F.lit(0), (F.col("n_bytes") % 30).cast("int"), F.lit(5))
        ).alias("frame_idx"),
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        ((F.col("n_bytes") * 7 + F.col("frame_idx") * 31) % 256)
        .cast("int")
        .alias("frame_sig"),
    )


_TARGET = 224  # fit-within-square resize target (the ViT-style input)


def make_resize_batches(codec: str = "fake"):
    """Arrow-batched resize step (closure → pickled by value, like
    make_decode_batches). The fake codec derives source dims from
    payload length and computes the fit-within-224 scaled dims; a real
    build swaps in ``Image.resize`` on the payload with the identical
    batch signature — the plumbing (schema, alignment, dtypes) is what
    the oracle verifies."""
    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec {codec!r}: expected 'fake' or 'real'")

    def resize_batches(batches):
        import numpy as np
        import pandas as _pd

        for pdf in batches:
            if codec == "real":
                raise NotImplementedError(
                    "real resize is an opt-in stub: no image codec ships "
                    "in this container"
                )
            n_bytes = pdf["payload"].map(len).to_numpy(dtype="int64")
            w = (n_bytes * 7) % 640 + 1
            h = (n_bytes * 13) % 480 + 1
            scale = np.minimum(
                np.minimum(float(_TARGET) / w, float(_TARGET) / h), 1.0
            )
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "out_w": np.maximum(1, np.floor(w * scale)).astype("int32"),
                    "out_h": np.maximum(1, np.floor(h * scale)).astype("int32"),
                    "scale": np.round(scale, 6),
                }
            )

    return resize_batches


@query(
    "m58_resize_pipeline",
    f"""
    WITH b AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
      WHERE CAST(doc_id % 3 AS INTEGER) = 0),
    dims AS (
      SELECT doc_id,
             (n_bytes * 7) % 640 + 1 AS w,
             (n_bytes * 13) % 480 + 1 AS h
      FROM b),
    scaled AS (
      SELECT doc_id, w, h,
             LEAST(LEAST({_TARGET}.0 / w, {_TARGET}.0 / h), 1.0) AS scale
      FROM dims)
    SELECT doc_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(GREATEST(1, FLOOR(w * scale)) AS INTEGER) AS out_w,
           CAST(GREATEST(1, FLOOR(h * scale)) AS INTEGER) AS out_h,
           ROUND(scale, 6) AS scale
    FROM scaled
    """,
)
def m58_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize step over 'image'-modality payloads: fit-within-224
    preserving aspect ratio, computed in an Arrow-batched mapInPandas
    (the step between decode and feature extraction in a real
    multimodal ingest). The fake codec keeps it oracle-checkable; the
    real codec is an explicit opt-in with the same batch shape. Scale
    shape: per-partition map, payload bytes never shuffle, output is
    metadata-width only."""
    d = t(spark, sf_dir, "documents")
    payloads = (
        d.filter(F.col("doc_id") % 3 == 0)
        .select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    )
    return payloads.mapInPandas(
        make_resize_batches(),
        schema="doc_id bigint, width int, height int, out_w int, out_h int, scale double",
    )


_MEDIA_CHUNK = 4096  # bytes per upload/processing chunk


@query(
    "m59_payload_chunk_manifest",
    f"""
    SELECT d.doc_id,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
           CAST(s.i AS INTEGER) AS chunk_idx,
           CAST(s.i * {_MEDIA_CHUNK} AS BIGINT) AS byte_start,
           CAST(LEAST({_MEDIA_CHUNK},
                      octet_length(encode(d.text)) - s.i * {_MEDIA_CHUNK})
             AS BIGINT) AS byte_len
    FROM documents d,
         LATERAL (SELECT unnest(generate_series(0,
             CAST((octet_length(encode(d.text)) - 1) / {_MEDIA_CHUNK} AS INTEGER)))
             AS i) s
    """,
)
def m59_payload_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-range chunk manifest for large media payloads: the planning
    step of chunked upload / range-request processing — each payload
    becomes (chunk_idx, byte_start, byte_len) rows of {_MEDIA_CHUNK}
    bytes, the last chunk truncated. Only LENGTH arithmetic touches the
    plan; payload bytes are never deserialized (the m55 principle:
    metadata flows, media stays opaque), so this runs at scan speed and
    the actual byte slicing happens in whatever worker later consumes
    a (start, len) pair.

    Scale shape: pure narrow map (sequence + posexplode over an integer
    computed from octet_length), zero shuffles, no Python; output size
    is bytes/chunk_size rows per payload."""
    d = t(spark, sf_dir, "documents")
    payload_len = F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long")
    # floor division on BOTH engines: DuckDB's int/int returns a double
    # that CAST would ROUND (not truncate), so a 2049..4096-byte payload
    # would grow a phantom chunk — // and div are the portable floors
    n_chunks_minus1 = F.expr(f"CAST((n_bytes - 1) div {_MEDIA_CHUNK} AS INT)")
    ex = d.select("doc_id", payload_len.alias("n_bytes")).select(
        "doc_id",
        "n_bytes",
        F.posexplode(
            F.sequence(F.lit(0), n_chunks_minus1)
        ).alias("chunk_idx", "_i"),
    )
    return ex.select(
        "doc_id",
        "n_bytes",
        "chunk_idx",
        (F.col("chunk_idx").cast("long") * _MEDIA_CHUNK).alias("byte_start"),
        F.least(
            F.lit(_MEDIA_CHUNK).cast("long"),
            F.col("n_bytes") - F.col("chunk_idx").cast("long") * _MEDIA_CHUNK,
        ).alias("byte_len"),
    )


# ---------------------------------------------------------------------------
# m60: perceptual-hash (aHash) near-duplicate image candidates
# ---------------------------------------------------------------------------
#
# The image-dedup step of a multimodal curation pipeline: decode each
# payload to a tiny grayscale block, hash it perceptually, and pair up
# payloads whose hashes are within a small Hamming distance — robust to
# re-encodes and small edits where d43's byte digest is not. The decode
# is the container's deterministic fake (64 pixels sampled at even
# strides from the payload bytes); the hash is average-hash (aHash):
# bit k = pixel_k > integer mean. Real-codec swap-in happens at the
# same seam as m56 (make_decode_batches) without touching the
# candidate-join shape.
#
# Candidate generation is the d46 banding idea applied to media: the
# 64-bit hash splits into 4 x 16-bit bands and pairs meet via an
# equi-join on (band_idx, band_value) — never a cross join. Pigeonhole
# gives FULL recall for Hamming <= 3 (4 diffs are needed to touch all
# 4 bands); above that the band join is the standard LSH-style
# heuristic (found iff the diffs cluster in <= 3 bands), and the
# oracle replays the identical banding so parity covers the heuristic
# too. The rerank is exact xor + bit_count on the two hashes.

_AHASH_SAMPLES = 64
_AHASH_BANDS = 4
_AHASH_MAX_HAMMING = 10

_M60_HASH_SQL = f"""
    px AS (
      -- the index derives from BYTE length but substr counts CHARS on
      -- both engines: clamp to char length so multibyte text cannot
      -- index past the end (where DuckDB ord('') = -1 but Spark
      -- ascii('') = 0 — a silent parity divergence); empty text pins
      -- every pixel to 0 for the same reason
      SELECT doc_id,
             list_transform(range({_AHASH_SAMPLES}),
               k -> CASE WHEN len(text) = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(ord(substr(text,
                      CAST(LEAST(1 + (k * octet_length(encode(text)))
                                 // {_AHASH_SAMPLES}, len(text))
                           AS INTEGER), 1)) AS BIGINT) END)
               AS px
      FROM documents),
    h AS (
      SELECT doc_id,
             list_reduce(
               list_transform(range({_AHASH_SAMPLES}), k ->
                 CASE WHEN px[CAST(k + 1 AS INTEGER)] * {_AHASH_SAMPLES}
                           > list_reduce(px, (a, b) -> a + b)
                      -- bit 63 = signed-64 MIN (1<<63 overflows); the
                      -- k % 63 keeps the other branch shift-safe even
                      -- under eager vectorized branch evaluation
                      THEN CASE WHEN k = 63
                                THEN CAST('-9223372036854775808' AS BIGINT)
                                ELSE CAST(1 AS BIGINT)
                                     << CAST(k % 63 AS INTEGER) END
                      ELSE CAST(0 AS BIGINT) END),
               (a, b) -> a + b) AS ahash
      FROM px)
"""

@query(
    "m60_phash_neardup_candidates",
    f"""
    WITH {_M60_HASH_SQL},
    bands AS (
      SELECT doc_id, ahash, b.i AS band_idx,
             (ahash >> (b.i * 16)) & 65535 AS band_val
      FROM h, LATERAL (SELECT unnest(generate_series(0, {_AHASH_BANDS - 1}))
                       AS i) b),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.ahash AS ha, b.ahash AS hb
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(ha, hb)) <= {_AHASH_MAX_HAMMING}
    """,
)
def m60_phash_neardup_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup pairs over media payloads (see block
    comment): aHash in pure integer arithmetic (sampled byte > scaled
    integer mean — the *64 trick avoids any division ambiguity), 16-bit
    band buckets for full-recall candidate generation at Hamming <=
    {_AHASH_MAX_HAMMING}, exact xor/bit_count rerank.

    Scale shape: the hash is an in-row expression at scan speed
    (payload bytes never shuffle); the only event-volume exchange keys
    on (band_idx, band_val) carrying (doc_id, ahash) — 16-byte rows;
    a hot band bucket (e.g. black frames) is an AQE skew-split case.
    The oracle replays the identical arithmetic, so parity proves the
    whole pipeline including band recall."""
    d = t(spark, sf_dir, "documents")
    n_bytes = F.octet_length(F.encode(F.col("text"), "UTF-8"))
    # pixel k samples the char at 1 + floor(k * n_bytes / 64), clamped
    # to the CHAR length (substr counts chars; the index derives from
    # bytes — see the oracle comment for the multibyte hazard) and
    # pinned to 0 on empty text (Spark ascii('')=0, DuckDB ord('')=-1)
    pix = F.transform(
        F.sequence(F.lit(0), F.lit(_AHASH_SAMPLES - 1)),
        lambda k: F.when(F.col("cl") == 0, F.lit(0).cast("long")).otherwise(
            F.ascii(
                F.substring(
                    F.col("text"),
                    F.least(
                        (F.lit(1) + (k * F.col("nb")) / _AHASH_SAMPLES).cast("int"),
                        F.col("cl"),
                    ),
                    1,
                )
            ).cast("long")
        ),
    )
    base = d.select(
        "doc_id", n_bytes.alias("nb"), F.length("text").alias("cl"), F.col("text")
    )
    withpix = base.select("doc_id", pix.alias("px"))
    tot = F.aggregate("px", F.lit(0).cast("long"), lambda a, v: a + v)
    # bit-value constants (shift amounts must be Python ints for the
    # DSL): bit 63 is the signed-64 MIN, matching the oracle's literal
    bitvals = F.array(
        *[F.lit((1 << k) if k < 63 else -(1 << 63)).cast("long")
          for k in range(_AHASH_SAMPLES)]
    )
    ahash = F.aggregate(
        F.zip_with(
            "px",
            bitvals,
            lambda p, bit: F.when(
                p * _AHASH_SAMPLES > F.col("tot"), bit
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    # persist the hash table: without a materialization barrier the
    # projection collapses and the interpreted higher-order ahash
    # expression is RE-EVALUATED inside the join condition for every
    # candidate pair (measured 80s vs 9.3s at sf0.1, ROUND5_NOTES) —
    # the d44 persist
    # rationale applied to expression cost instead of scan cost
    h = (
        withpix.withColumn("tot", tot)
        .select("doc_id", ahash.alias("ahash"))
        .transform(persist_once)
    )
    bands = h.select(
        "doc_id",
        "ahash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("ahash"), i * 16).bitwiseAND(
                        F.lit(65535)
                    )
                    for i in range(_AHASH_BANDS)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.ahash").alias("ha"),
            F.col("b.ahash").alias("hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select("doc_a", "doc_b", ham.cast("int").alias("hamming")).filter(
        F.col("hamming") <= _AHASH_MAX_HAMMING
    )


# ---------------------------------------------------------------------------
# m61: training-batch tensor collation (the loader-facing batch shape)
# ---------------------------------------------------------------------------
#
# The last hop of a multimodal curation pipeline: collate decoded
# media into FIXED-SHAPE training batches — the (N, features) float32
# tensors a data loader hands the trainer. Batch membership is
# deterministic (batch_id = doc_id div 16 — at scale the id comes from
# the shard manifest m59 plans, so collation needs no global sort or
# window). The decode is the container's deterministic fake (the m60
# byte-sampling arithmetic, 64 "pixels"/payload); a real codec swaps
# in at the same seam.
#
# The tensor assembly runs as a grouped-map applyInPandas: each group
# IS one training batch, stacked into a float32 (n, 64) ndarray inside
# the UDF (shape/dtype asserted — the plumbing the loader contract
# cares about), while the emitted audit columns are computed on an
# int64 view so parity with the SQL oracle is exact integer
# arithmetic, proving the tensor CONTENT and not just its shape.

_BATCH_DOCS = 16


@query(
    "m61_training_batches",
    f"""
    WITH px AS (
      -- the m60 sampling arithmetic (see that oracle's multibyte and
      -- empty-text notes)
      SELECT doc_id,
             list_transform(range({_AHASH_SAMPLES}),
               k -> CASE WHEN len(text) = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(ord(substr(text,
                      CAST(LEAST(1 + (k * octet_length(encode(text)))
                                 // {_AHASH_SAMPLES}, len(text))
                           AS INTEGER), 1)) AS BIGINT) END)
               AS px
      FROM documents),
    per_doc AS (
      SELECT doc_id,
             list_reduce(px, (a, b) -> a + b) AS s,
             list_min(px) AS mn,
             list_max(px) AS mx
      FROM px)
    SELECT doc_id // {_BATCH_DOCS} AS batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(s) AS BIGINT) AS px_sum,
           CAST(MIN(mn) AS BIGINT) AS px_min,
           CAST(MAX(mx) AS BIGINT) AS px_max
    FROM per_doc GROUP BY doc_id // {_BATCH_DOCS}
    """,
)
def m61_training_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collate payloads into fixed-shape training batches (see block
    comment): deterministic membership, float32 tensor assembly in a
    grouped-map UDF, integer audit columns oracle-proving content.

    Scale shape: the pixel array is an in-row JVM expression at scan
    speed; the only exchange keys on batch_id carrying (doc_id,
    px[64]) ≈ 0.5 KB rows; each Arrow group is one bounded training
    batch (≤ {_BATCH_DOCS} rows), so UDF memory is batch-sized
    regardless of corpus size."""
    import numpy as np
    import pandas as pd

    d = t(spark, sf_dir, "documents")
    n_bytes = F.octet_length(F.encode(F.col("text"), "UTF-8"))
    pix = F.transform(
        F.sequence(F.lit(0), F.lit(_AHASH_SAMPLES - 1)),
        lambda k: F.when(F.col("cl") == 0, F.lit(0).cast("long")).otherwise(
            F.ascii(
                F.substring(
                    F.col("text"),
                    F.least(
                        (F.lit(1) + (k * F.col("nb")) / _AHASH_SAMPLES).cast("int"),
                        F.col("cl"),
                    ),
                    1,
                )
            ).cast("long")
        ),
    )
    rows = (
        d.select("doc_id", n_bytes.alias("nb"), F.length("text").alias("cl"), "text")
        .select(
            "doc_id",
            F.expr(f"doc_id div {_BATCH_DOCS}").alias("batch_id"),
            pix.alias("px"),
        )
    )

    def collate(pdf: pd.DataFrame) -> pd.DataFrame:
        ints = np.stack([np.asarray(p, dtype=np.int64) for p in pdf["px"]])
        tensor = ints.astype(np.float32)  # the loader-facing batch
        assert tensor.shape == (len(pdf), _AHASH_SAMPLES)
        assert tensor.dtype == np.float32
        return pd.DataFrame(
            {
                "batch_id": [int(pdf["batch_id"].iloc[0])],
                "n_members": [len(pdf)],
                "px_sum": [int(ints.sum())],
                "px_min": [int(ints.min())],
                "px_max": [int(ints.max())],
            }
        )

    return rows.groupBy("batch_id").applyInPandas(
        collate,
        "batch_id long, n_members long, px_sum long, px_min long, px_max long",
    )


# --- m62: payload dedup savings by modality ------------------------------
#
# d59's multimodal twin: media payloads dedup by exact content digest
# (sha-256 over the binary — m55's metadata column), and the savings
# report rolls up per MODALITY: duplicate groups, redundant copies,
# and exact bytes reclaimable by keeping one copy per digest. At
# 100 TB this is the blob-store compaction read: only 32-byte digests
# and byte counts ride the exchanges — payload bytes never move.

_M62 = """
    WITH meta AS (
      SELECT doc_id, sha256(text) AS digest,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS modality
      FROM documents),
    grp AS (
      SELECT modality, digest, CAST(COUNT(*) AS BIGINT) AS sz,
             CAST(SUM(n_bytes) AS BIGINT) AS tot_bytes,
             CAST(MIN(n_bytes) AS BIGINT) AS one_copy
      FROM meta GROUP BY 1, 2)
    SELECT modality,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(sz) AS BIGINT) AS n_payloads,
           CAST(SUM(sz - 1) AS BIGINT) AS n_redundant,
           CAST(SUM(tot_bytes - one_copy) AS BIGINT) AS bytes_saved
    FROM grp GROUP BY 1
"""


@query("m62_payload_dedup_savings", _M62)
def m62_payload_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-digest payload dedup savings per modality (see block
    comment). Copies of one digest have identical bytes, so the kept
    copy's size is MIN(n_bytes) = every member's size — the savings
    arithmetic needs no keeper election at all, unlike d59's
    normalized-text groups where copies differ in raw length.

    Scale shape: one scan computing (digest, bytes, modality), one
    combinable aggregate keyed on the 32-byte digest, and a
    #modalities-row rollup."""
    d = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    meta = d.select(
        F.sha2(payload, 256).alias("digest"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
    )
    grp = meta.groupBy("modality", "digest").agg(
        F.count(F.lit(1)).alias("sz"),
        F.sum("n_bytes").alias("tot_bytes"),
        F.min("n_bytes").alias("one_copy"),
    )
    return grp.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("sz").alias("n_payloads"),
        F.sum(F.col("sz") - 1).alias("n_redundant"),
        F.sum(F.col("tot_bytes") - F.col("one_copy")).alias("bytes_saved"),
    )


# --- m63: decode failure-rate audit (Arrow batch path) ---------------------
#
# The error-accounting read every media-ingest pipeline publishes:
# per modality, how many payloads fail decode and how many bytes they
# represent. The decode itself runs through the REAL Arrow-batched
# mapInPandas path (deliberate Python surface #11 — the same batch
# shape a libvips/ffmpeg codec plugs into), with the stub codec
# failing DETERMINISTICALLY when octet_length % 97 == 0 — so the
# Python plumbing's accounting is verifiable against a pure-SQL
# arithmetic oracle, which is exactly what makes this op a correctness
# proof of the batch path rather than a trust-me stub.

_M63_SCHEMA = "modality string, n_bytes bigint, failed int"


def make_failure_batches():
    """mapInPandas generator: stub-decode each payload, emitting its
    modality, size, and deterministic failure flag."""

    def decode_batches(batches):
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            out = pdf[["modality"]].copy()
            out["n_bytes"] = n_bytes.astype("int64")
            out["failed"] = (n_bytes % 97 == 0).astype("int32")
            yield out

    return decode_batches


_M63 = """
    WITH meta AS (
      SELECT CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             CASE WHEN octet_length(encode(text)) % 97 = 0
                  THEN 1 ELSE 0 END AS failed
      FROM documents)
    SELECT modality,
           CAST(COUNT(*) AS BIGINT) AS n_payloads,
           CAST(SUM(failed) AS BIGINT) AS n_failed,
           CAST(SUM(failed) * 1000000 // COUNT(*) AS BIGINT) AS fail_ppm,
           CAST(SUM(CASE WHEN failed = 1 THEN n_bytes ELSE 0 END) AS BIGINT)
             AS bytes_failed
    FROM meta GROUP BY 1
"""


@query("m63_decode_failure_audit", _M63)
def m63_decode_failure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality decode failure accounting through the Arrow batch
    path (see block comment).

    Scale shape: payloads stream through mapInPandas in Arrow batches
    (binary never shuffles — the aggregate keys on the 3-value
    modality after the map); the rollup is 3 rows. A real codec swaps
    into the SAME batch function with identical accounting."""
    d = t(spark, sf_dir, "documents")
    payloads = d.select(
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    decoded = payloads.mapInPandas(make_failure_batches(), schema=_M63_SCHEMA)
    return decoded.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_payloads"),
        F.sum("failed").cast("long").alias("n_failed"),
        F.expr("sum(failed) * 1000000 div count(1)").alias("fail_ppm"),
        F.sum(
            F.when(F.col("failed") == 1, F.col("n_bytes")).otherwise(0)
        ).alias("bytes_failed"),
    )
