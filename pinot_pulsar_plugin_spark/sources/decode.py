"""JSON decode-or-drop projection — the PulsarJSONMessageDecoder analog.

Reference semantics (PulsarJSONMessageDecoder.java):
- bytes → JSON → typed row, restricted to ``fieldsToRead`` (:47-59);
- any decode failure drops the row (logged, returns null) instead of
  failing the pipeline (:69-72).

Spark-first: ``from_json`` is a Catalyst expression (codegen'd, no
Python), so the decode runs JVM-side at full scan speed and column
pruning flows through it. Malformed detection uses PERMISSIVE mode's
corrupt-record column (Spark's ``from_json`` yields an all-null struct,
not a null, on parse failure — so a bare null check can't see drops);
dropped-row accounting is then a cheap filter, batch- and
streaming-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

_CORRUPT = "_corrupt_payload"


def _with_corrupt_field(schema: StructType | str) -> StructType:
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    return StructType(list(schema.fields) + [StructField(_CORRUPT, StringType())])


def _decoded_col(
    payload_col: str,
    schema: StructType | str,
    pre_decode=None,
) -> Column:
    raw = F.col(payload_col).cast("string")
    if pre_decode is not None:
        raw = pre_decode(raw)
    # Jackson-BOM parity (ADVICE r9): the reference decodes bytes via
    # Jackson's byte-source bootstrapper, which strips a UTF-8 BOM
    # before parsing — a BOM-prefixed object payload is KEPT there.
    # Spark's from_json parses a String, where a leading U+FEFF is a
    # parse error, so strip one here (and the '{' guard below then
    # sees the real first character). UTF-16/32 BOM payloads would
    # need a charset-aware binary decode — the binary→string cast is
    # UTF-8-only, so those stay divergent by design.
    raw = F.regexp_replace(raw, "^\uFEFF", "")
    full = _with_corrupt_field(schema)
    # Jackson-strictness parity: the reference parses with a DEFAULT
    # ObjectMapper (PulsarJSONMessageDecoder.java:41), where
    # ALLOW_SINGLE_QUOTES and ALLOW_NON_NUMERIC_NUMBERS are OFF — a
    # {'single':'quoted'} or {"v": NaN} payload throws and the row
    # drops (:69-72). Spark's from_json DEFAULTS both options ON, so
    # without pinning them such payloads would be silently KEPT here.
    # Every other Spark JSON option already matches Jackson defaults
    # (unquoted field names, comments, leading zeros, unquoted control
    # chars: all off).
    parsed = F.from_json(
        raw,
        full,
        {
            "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": _CORRUPT,
            "allowSingleQuotes": "false",
            "allowNonNumericNumbers": "false",
        },
    )
    # Jackson-object parity (found by the r8 decode-corruption fuzz):
    # a VALID-JSON non-object payload — bare scalar, array, quoted
    # string — parses "successfully" to an all-null struct with a NULL
    # corrupt marker, so it would slip past drop_malformed as a ghost
    # all-NULL row. The reference's decoder treats the payload as an
    # object and throws on anything else (decoder:69-72 catches → row
    # dropped), so force non-object payloads malformed. An object
    # payload starts with '{' after JSON whitespace (space, tab, LF,
    # CR — RFC 8259 §2; Spark's ltrim strips ONLY ' ', so it would
    # misclassify b'\n{...}' as non-object and drop a valid row);
    # '{}'-style empty objects still decode to all-NULL KEPT rows,
    # same as Jackson.
    non_object = raw.isNull() | ~raw.rlike(r"^[ \t\r\n]*\{")
    forced = F.struct(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in full.fields[:-1]],
        F.coalesce(raw, F.lit("")).alias(_CORRUPT),
    )
    return F.when(non_object, forced).otherwise(parsed)


def decode_json(
    df: DataFrame,
    schema: StructType | str,
    fields: list[str] | None = None,
    *,
    payload_col: str = "value",
    keep_cols: tuple[str, ...] = ("offset", "partition"),
    drop_malformed: bool = True,
    pre_decode=None,
    extractor=None,
) -> DataFrame:
    """Decode a binary JSON payload column into typed columns.

    ``fields`` projects the decoded struct (the decoder's
    ``fieldsToRead`` pushdown, decoder:48); ``drop_malformed`` drops
    rows whose payload fails to parse (decoder:69-72). Rows whose
    payload parses but misses fields keep nulls for those fields — the
    same leniency Jackson + the extractor give the reference.

    Typing boundary (deliberate divergence): the reference plugin
    never types fields — its extractor emits raw parsed Java objects
    and coercion to the table schema happens DOWNSTREAM in Pinot's
    ingestion transform, outside the plugin. This engine is
    schema-on-read: the typed ``schema`` binds at decode, so a field
    that parses but can't bind (quoted number for a bigint, float for
    an int, bigint overflow) marks the row corrupt and drops it under
    ``drop_malformed`` — use a string/permissive schema plus explicit
    casts in the ``extractor`` hook when Pinot-transform-style
    coercion is wanted. Parse-level strictness (single quotes,
    NaN/Infinity, BOM, object-only) matches the reference exactly;
    see ``_decoded_col``.

    Pluggable-extractor hooks (the ``RECORD_EXTRACTOR_CONFIG_KEY``
    analog, PulsarJSONMessageDecoder.java:42-43,57 — the reference lets
    a deployment swap the class that turns a parsed payload into row
    fields):

    - ``pre_decode``: ``Column -> Column`` over the RAW payload string
      before parsing — normalizes non-JSON-standard framings (envelope
      prefixes, key=value lines) into JSON, so the decode itself stays
      a single JVM-side ``from_json``.
    - ``extractor``: ``Column -> Column`` over the PARSED struct,
      applied between parse and projection — field-level extraction
      (unwrap envelopes, retype, rename), exactly where the reference
      invokes its extractor (decoder:57).

    Both hooks build Catalyst ``Column`` expressions, so custom
    extraction keeps whole-stage codegen — no Python in the row path.
    """
    out = df.withColumn(
        "_decoded", _decoded_col(payload_col, schema, pre_decode)
    )
    if drop_malformed:
        out = out.filter(F.col(f"_decoded.{_CORRUPT}").isNull())
    if extractor is not None:
        out = out.withColumn("_decoded", extractor(F.col("_decoded")))
    proj: list[Column] = [F.col(c) for c in keep_cols if c in df.columns]
    if fields is None:
        fields = [
            f.name for f in out.schema["_decoded"].dataType.fields if f.name != _CORRUPT
        ]
    proj += [F.col(f"_decoded.{n}").alias(n) for n in fields]
    return out.select(*proj)


def compacted_view(df: DataFrame, key_cols: list[str], *, offset_col: str = "offset",
                   partition_col: str = "partition") -> DataFrame:
    """Latest value per key — the engine-side analog of the reference's
    ``readCompacted(true)`` (PulsarPartitionLevelConsumer.java:68).

    Spark sources have no compacted-read mode, so compaction is an
    operator: window by key, keep the row with the max (partition,
    offset). At scale this is one shuffle on the key — identical cost
    to what a compacted broker read saves, and it works on historical
    data the broker already compacted away.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(*key_cols).orderBy(
        F.desc(partition_col), F.desc(offset_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def malformed_count(
    df: DataFrame, *, payload_col: str = "value", schema: StructType | str = ""
) -> DataFrame:
    """Count rows that would be dropped by :func:`decode_json` — the
    observability hook for the decoder's drop-and-log behavior."""
    bad = _decoded_col(payload_col, schema).getField(_CORRUPT).isNotNull()
    return df.select(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(bad, 1)).alias("n_malformed"),
    )
