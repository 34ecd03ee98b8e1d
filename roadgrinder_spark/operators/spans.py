"""Pack/unpack between the interleaved-document substrate and the
SGID-shaped relations.

BASELINE.json `input_hint`: the engine's canonical input is an Iceberg
table `documents(doc_id string, spans array<struct<kind,text,media_ref,
offset>>)`. Road and address-point records ride inside spans:
  kind='road'|'addrpnt'  text=JSON attribute payload
  kind='media'           media_ref=the WKT geometry blob ref
Offsets strictly increase within a doc; the per-row invariant vs the
reference is span-sequence equality (kind, text, media_ref, order).

Pack groups `group_size` records per document (doc_id = kind prefix +
floor(objectid / group_size)); each record contributes an attribute span
at offset 2*i and a media span at 2*i+1 — a genuinely interleaved layout.

All of it is built-ins: to_json/from_json, collect_list + array_sort (the
sort restores deterministic span order after the shuffle), explode. At
scale the pack is one hash aggregate keyed by doc_id; unpack is a narrow
map — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..schemas import ADDRPNTS_SCHEMA, ROADS_SCHEMA

#: JSON payload schema = relation schema minus the geometry blob ref
_ROADS_PAYLOAD = StructType([f for f in ROADS_SCHEMA.fields if f.name != "geometry"])
_ADDRPNTS_PAYLOAD = ADDRPNTS_SCHEMA


def _pack(df: DataFrame, kind: str, payload_cols: list[str], media_col, group_size: int) -> DataFrame:
    rec = F.to_json(F.struct(*[F.col(c) for c in payload_cols]))
    idx = (F.col("objectid") % group_size).cast("int")
    # offset leads the staging struct so array_sort orders spans by offset;
    # re-projected to the canonical (kind, text, media_ref, offset) after.
    spans = F.array(
        F.struct(
            (idx * 2).alias("offset"),
            F.lit(kind).alias("kind"),
            rec.alias("text"),
            F.lit("").alias("media_ref"),
        ),
        F.struct(
            (idx * 2 + 1).alias("offset"),
            F.lit("media").alias("kind"),
            F.lit("").alias("text"),
            media_col.alias("media_ref"),
        ),
    )
    doc_id = F.concat(
        F.lit(kind + "-"), F.floor(F.col("objectid") / group_size).cast("string")
    )
    return (
        df.select(doc_id.alias("doc_id"), F.explode(spans).alias("span"))
        .groupBy("doc_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(span)), "
                "s -> struct(s.kind AS kind, s.text AS text, "
                "s.media_ref AS media_ref, s.offset AS offset))"
            ).alias("spans")
        )
    )


def pack_documents(
    roads: DataFrame, addrpnts: DataFrame, group_size: int = 16
) -> DataFrame:
    """Interleaved span-document table from the two relations."""
    r = _pack(
        roads,
        "road",
        [f.name for f in _ROADS_PAYLOAD.fields],
        F.col("geometry"),
        group_size,
    )
    p = _pack(
        addrpnts,
        "addrpnt",
        [f.name for f in _ADDRPNTS_PAYLOAD.fields],
        F.concat(
            F.lit("POINT ("),
            F.col("px").cast("string"),
            F.lit(" "),
            F.col("py").cast("string"),
            F.lit(")"),
        ),
        group_size,
    )
    return r.unionByName(p)


def _unpack(docs: DataFrame, kind: str, payload: StructType) -> DataFrame:
    attr = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == kind)
        .select(F.from_json(F.col("s.text"), payload).alias("r"))
        .select("r.*")
    )
    return attr


def unpack_roads(docs: DataFrame) -> DataFrame:
    """documents → roads relation (media span re-joined as `geometry`).

    The media span carrying the WKT lives at offset = attr offset + 1 in
    the same doc; rebuild geometry by pairing spans within the doc — a
    JVM-side array zip, no shuffle."""
    paired = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(transform(spans, (s, i) -> "
                "CASE WHEN s.kind <> 'media' THEN "
                "struct(s.kind AS kind, s.text AS text, "
                "element_at(spans, i + 2).media_ref AS media_ref) END), "
                "x -> x IS NOT NULL)"
            )
        ).alias("s"),
    )
    return (
        paired.filter(F.col("s.kind") == "road")
        .select(
            F.from_json(F.col("s.text"), _ROADS_PAYLOAD).alias("r"),
            F.col("s.media_ref").alias("geometry"),
        )
        .select("r.*", "geometry")
    )


def unpack_addrpnts(docs: DataFrame) -> DataFrame:
    return _unpack(docs, "addrpnt", _ADDRPNTS_PAYLOAD)


def span_stats(docs: DataFrame) -> DataFrame:
    """Per-doc statistics of the interleaved span sequence — the
    substrate-level audit: span counts by kind, media payload mass, and
    the span-sequence ordering invariant (offsets strictly increasing —
    the per-row invariant BASELINE.json's input_hint names) evaluated
    engine-side per document. Pure JVM array functions, no shuffle."""
    offs = F.expr("transform(spans, s -> s.offset)")
    return docs.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.size(F.expr("filter(spans, s -> s.kind = 'media')")).alias("n_media"),
        F.size(F.expr("filter(spans, s -> s.kind <> 'media')")).alias("n_attr"),
        F.expr(
            "CAST(aggregate(spans, 0L, (a, s) -> a + length(s.media_ref)) AS BIGINT)"
        ).alias("media_chars"),
        (offs == F.array_sort(F.array_distinct(offs))).alias("offsets_increasing"),
    )


def oracle_span_stats_sql(group_size: int = 16) -> str:
    """Reconstructs the per-doc counts from the source relations (the
    pack emits exactly one attr + one media span per record, and the
    media_ref strings are the same WKT the media oracle rebuilds).
    offsets_increasing is asserted TRUE — if the engine's pack ever
    breaks span ordering, its computed bool diverges and the row fails.
    Requires the roads/addrpnts CTEs in scope."""
    return f"""
sp_docs AS (
  SELECT 'road-' || CAST(CAST(FLOOR(objectid / {group_size}) AS BIGINT) AS STRING) AS doc_id,
         count(*) AS n_rec,
         CAST(sum(length(geometry)) AS BIGINT) AS media_chars
  FROM roads GROUP BY 1
  UNION ALL
  SELECT 'addrpnt-' || CAST(CAST(FLOOR(objectid / {group_size}) AS BIGINT) AS STRING) AS doc_id,
         count(*) AS n_rec,
         CAST(sum(length('POINT (' || CAST(px AS STRING) || ' ' || CAST(py AS STRING) || ')')) AS BIGINT) AS media_chars
  FROM addrpnts GROUP BY 1
)
SELECT doc_id, n_rec * 2 AS n_spans, n_rec AS n_media, n_rec AS n_attr,
       media_chars, TRUE AS offsets_increasing
FROM sp_docs"""


def span_media_align(docs: DataFrame, drop_mod: int = 3) -> DataFrame:
    """Media-to-context alignment over the interleaved span sequence:
    for each media span, the offset of the nearest PRECEDING retained
    text span in the same document — the caption/context attachment
    step of a multimodal curation pipeline. Text spans whose index is
    divisible by drop_mod are dropped first (simulating a quality
    filter), so the lookback genuinely searches past removed spans and
    media with no surviving predecessor gets NULL.

    Pure span-array plumbing: one explode, one per-doc window
    (last-ignorenulls over offset order), no joins; shuffle is one
    hash partitioning by doc_id. Returns (doc_id, offset, media_ref,
    ctx_offset)."""
    from pyspark.sql import Window

    s = docs.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )
    # text spans sit at even offsets 2*idx; idx % drop_mod == 0 drops
    # ⟺ offset % (2*drop_mod) == 0 — stays integer-only in both dialects
    kept = s.filter(
        (F.col("kind") == "media") | (F.col("offset") % (2 * drop_mod) != 0)
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ctx = F.last(
        F.when(F.col("kind") != "media", F.col("offset")), ignorenulls=True
    ).over(w)
    return (
        kept.withColumn("ctx_offset", ctx)
        .filter(F.col("kind") == "media")
        .select("doc_id", "offset", "media_ref", "ctx_offset")
    )


def oracle_span_media_align_sql(group_size: int = 16, drop_mod: int = 3) -> str:
    """DuckDB oracle: reconstructs the span sequence per doc from the
    source relations (the pack layout: text at 2*idx, media at 2*idx+1,
    idx = objectid % group_size; media_ref strings are the same WKT the
    media oracles rebuild), applies the same drop + lookback window.
    Requires the roads/addrpnts CTEs in scope."""
    return f"""
sa_recs AS (
  SELECT 'road-' || CAST(CAST(FLOOR(objectid / {group_size}) AS BIGINT) AS STRING) AS doc_id,
         CAST(objectid % {group_size} AS INTEGER) AS idx,
         geometry AS media_ref
  FROM roads
  UNION ALL
  SELECT 'addrpnt-' || CAST(CAST(FLOOR(objectid / {group_size}) AS BIGINT) AS STRING) AS doc_id,
         CAST(objectid % {group_size} AS INTEGER) AS idx,
         'POINT (' || CAST(px AS STRING) || ' ' || CAST(py AS STRING) || ')' AS media_ref
  FROM addrpnts
),
sa_spans AS (
  SELECT doc_id, idx * 2 AS "offset", 'text' AS kind,
         CAST(NULL AS STRING) AS media_ref
  FROM sa_recs WHERE idx % {drop_mod} <> 0
  UNION ALL
  SELECT doc_id, idx * 2 + 1 AS "offset", 'media' AS kind, media_ref
  FROM sa_recs
),
sa_ctx AS (
  SELECT doc_id, "offset", kind, media_ref,
         last_value(CASE WHEN kind <> 'media' THEN "offset" END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY "offset"
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ctx_offset
  FROM sa_spans
)
SELECT doc_id, "offset", media_ref, ctx_offset
FROM sa_ctx WHERE kind = 'media'"""
