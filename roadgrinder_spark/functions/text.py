"""Text-analysis column builders for the training-data pipeline
(language-ID heuristic, quality scoring, token counting, fingerprinting).

Everything except the rolling-hash fingerprint is built from the shared
Spark/DuckDB arithmetic subset (length/replace/trim/case), so each op is
oracle-checkable. Counting a pattern via replace-difference instead of
regex keeps the two engines' semantics provably identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# occurrence counting: (len(s) - len(replace(s, pat, ''))) / len(pat)
# ---------------------------------------------------------------------------

def occurrences(col: Column, pat: str) -> Column:
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(pat), F.lit(""))))
        / F.lit(len(pat))
    ).cast("long")


def occurrences_sql(expr: str, pat: str) -> str:
    p = pat.replace("'", "''")
    return (
        f"CAST((length({expr}) - length(replace({expr}, '{p}', ''))) "
        f"/ {len(pat)} AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# token count over whitespace-collapsed text
# ---------------------------------------------------------------------------

def token_count(col: Column) -> Column:
    """Tokens = space-runs + 1 on trimmed text ('' -> 0). Uses the same
    replace-difference arithmetic as the oracle (no regex-split semantics
    to disagree on)."""
    collapsed = F.regexp_replace(F.trim(col), r"\s+", " ")
    return (
        F.when(collapsed == "", F.lit(0))
        .otherwise(
            F.length(collapsed) - F.length(F.replace(collapsed, F.lit(" "), F.lit(""))) + 1
        )
        .cast("long")
    )


def token_count_sql(expr: str) -> str:
    collapsed = rf"regexp_replace(trim({expr}), '\s+', ' ', 'g')"
    return (
        f"CAST(CASE WHEN {collapsed} = '' THEN 0 ELSE "
        f"length({collapsed}) - length(replace({collapsed}, ' ', '')) + 1 "
        f"END AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# language-ID heuristic: marker-word hit counts, deterministic argmax
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " los "],
}
#: argmax precedence when scores tie (first wins); 'und' = undetermined
LANG_ORDER = ["en", "de", "fr", "es"]


def lang_scores(col: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    return {
        lang: sum(occurrences(padded, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """Highest marker count wins; ties broken by LANG_ORDER; all-zero → 'und'."""
    scores = lang_scores(col)
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    out = F.lit("und")
    for lang in reversed(LANG_ORDER):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best == 0, F.lit("und")).otherwise(out)


def lang_id_sql(expr: str) -> str:
    padded = f"(' ' || {expr} || ' ')"
    score = {
        lang: "(" + " + ".join(occurrences_sql(padded, m) for m in markers) + ")"
        for lang, markers in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(score[lang] for lang in LANG_ORDER) + ")"
    out = "'und'"
    for lang in reversed(LANG_ORDER):
        out = f"CASE WHEN {score[lang]} = {best} THEN '{lang}' ELSE {out} END"
    return f"CASE WHEN {best} = 0 THEN 'und' ELSE {out} END"


# ---------------------------------------------------------------------------
# quality score: length + stopword signals -> [0, 1]
# ---------------------------------------------------------------------------

def quality_score(col: Column) -> Column:
    """Deterministic heuristic: 0.5 * min(1, tokens/200)
    + 0.3 * min(1, 10*stopwords/tokens) + 0.2 * (avg word len in [3,8]).
    Same expression shape as quality_score_sql — doubles match exactly."""
    toks = token_count(col)
    stop = sum(occurrences(F.concat(F.lit(" "), col, F.lit(" ")), m)
               for m in LANG_MARKERS["en"])
    collapsed = F.regexp_replace(F.trim(col), r"\s+", " ")
    chars = F.length(F.replace(collapsed, F.lit(" "), F.lit("")))
    awl = F.when(toks > 0, chars / toks).otherwise(F.lit(0.0))
    length_part = F.least(F.lit(1.0), toks / F.lit(200.0)) * 0.5
    stop_part = (
        F.when(toks > 0, F.least(F.lit(1.0), stop * F.lit(10.0) / toks)).otherwise(F.lit(0.0))
        * 0.3
    )
    awl_part = F.when((awl >= 3.0) & (awl <= 8.0), F.lit(0.2)).otherwise(F.lit(0.0))
    return length_part + stop_part + awl_part


def quality_score_sql(expr: str) -> str:
    toks = token_count_sql(expr)
    padded = f"(' ' || {expr} || ' ')"
    stop = "(" + " + ".join(occurrences_sql(padded, m) for m in LANG_MARKERS["en"]) + ")"
    collapsed = rf"regexp_replace(trim({expr}), '\s+', ' ', 'g')"
    chars = f"length(replace({collapsed}, ' ', ''))"
    awl = f"(CASE WHEN {toks} > 0 THEN {chars} / {toks} ELSE 0.0 END)"
    return (
        f"least(1.0, {toks} / 200.0) * 0.5 "
        f"+ (CASE WHEN {toks} > 0 THEN least(1.0, {stop} * 10.0 / {toks}) ELSE 0.0 END) * 0.3 "
        f"+ (CASE WHEN {awl} >= 3.0 AND {awl} <= 8.0 THEN 0.2 ELSE 0.0 END)"
    )


# ---------------------------------------------------------------------------
# document fingerprint: winnowing over rolling k-gram hashes — fully
# JVM-side (higher-order functions over portable polynomial k-gram hashes,
# functions/phash.py — DuckDB-reproducible); no Python in the hot path.
# Robust-winnowing variant: fingerprint set = distinct per-window minima of
# k-gram hashes (Schleimer et al., SIGMOD'03 scheme).
# ---------------------------------------------------------------------------

from . import phash


def kgram_hashes(col_name: str, k: int = 8) -> Column:
    """array<long> of portable poly hashes over each k-char gram."""
    return F.expr(
        f"transform(transform(sequence(1, greatest(1, length({col_name}) - {k - 1})), "
        f"i -> substring({col_name}, i, {k})), s -> {phash.poly8_sql('s', phash.B1)})"
    )


def winnow_fingerprints(col_name: str, k: int = 8, window: int = 4) -> Column:
    """array<long> fingerprint set: sorted distinct minima of each
    length-`window` window over the k-gram hash sequence.

    NOTE: re-evaluates the gram array per window (the gram expr sits
    inside the window lambda) — fine for tests/small batches; the staged
    `fingerprint_frame` below is the O(L) production path."""
    gexpr = (
        f"transform(transform(sequence(1, greatest(1, length({col_name}) - {k - 1})), "
        f"i -> substring({col_name}, i, {k})), s -> {phash.poly8_sql('s', phash.B1)})"
    )
    return F.expr(
        f"array_sort(array_distinct(transform("
        f"sequence(1, greatest(1, size({gexpr}) - {window - 1})), "
        f"w -> array_min(slice({gexpr}, w, {window})))))"
    )


def fingerprint_frame(
    docs, text_col: str = "text", k: int = 8, window: int = 4
):
    """(doc_id, fingerprint: md5 string of the winnowed minima set) —
    staged through withColumn so the gram array is computed once per doc
    (Catalyst does not CSE expressions repeated inside lambdas)."""
    from ..session import spread_input

    return (
        spread_input(docs).withColumn(
            "_gs",
            F.expr(
                f"transform(sequence(1, greatest(1, length({text_col}) - {k - 1})), "
                f"i -> substring({text_col}, i, {k}))"
            ),
        )
        .withColumn("_g", F.expr(f"transform(_gs, s -> {phash.poly8_sql('s', phash.B1)})"))
        .withColumn(
            "_w",
            F.expr(
                f"transform(sequence(1, greatest(1, size(_g) - {window - 1})), "
                f"w -> array_min(slice(_g, w, {window})))"
            ),
        )
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    ",", F.expr("array_sort(array_distinct(_w))").cast("array<string>")
                )
            ).alias("fingerprint"),
        )
    )


def oracle_fingerprint_sql(k: int = 8, window: int = 4) -> str:
    """DuckDB SQL reproducing fingerprint_frame: window-min over the gram
    hash sequence (ROWS BETWEEN CURRENT AND window-1 FOLLOWING truncates
    at the partition end exactly like Spark's slice())."""
    return f"""
fp_g0 AS (
  SELECT d.doc_id, CAST(p.pos AS INT) AS pos,
         substring(d.text, CAST(p.pos AS INT), {k}) AS gs
  FROM documents d,
       LATERAL (SELECT unnest(range(1, greatest(1, length(d.text) - {k - 1}) + 1)) AS pos) p
),
fp_g AS (SELECT doc_id, pos, {phash.poly8_sql('gs', phash.B1)} AS g FROM fp_g0),
fp_w AS (
  SELECT doc_id, pos,
         min(g) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS m,
         count(*) OVER (PARTITION BY doc_id) AS n
  FROM fp_g
)
SELECT doc_id,
       md5(array_to_string(list_sort(list(DISTINCT m)), ',')) AS fingerprint
FROM fp_w WHERE pos <= greatest(1, n - {window - 1}) GROUP BY doc_id"""


# ---------------------------------------------------------------------------
# corpus char-bigram LM quality score: two-pass (corpus statistics -> per-
# doc scoring). Score = mean log transition probability
# avg ln(c(ab)/c(a·)) over a doc's bigram occurrences — the standard
# char-LM quality signal (garbage text scores far lower). ln() is 1-ulp
# libm-accurate in both engines; after a 300-term mean and round(6) the
# residual cross-engine risk is ~1e-9 per doc (same order as the
# double-summation reorder already accepted for avg()).
#
# Scale: the LM table is charset²-sized (tiny) -> broadcast join; the
# per-doc pass is one explode + broadcast lookups + a hash aggregate.
# ---------------------------------------------------------------------------


def bigram_lm_scores(docs, text_col: str = "text"):
    """(doc_id, n_bigrams, lm_score): corpus-bigram transition-probability
    mean per document, rounded to 6 dp for engine-portable hashing."""
    from ..session import spread_input

    bgs = (
        spread_input(docs)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(1, length({text_col}) - 1)), "
                    f"i -> substring({text_col}, i, 2))"
                )
            ).alias("bg"),
        )
        .filter(F.length("bg") == 2)
    )
    lm_bg = bgs.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    lm_pre = (
        bgs.select(F.substring("bg", 1, 1).alias("pre"))
        .groupBy("pre")
        .agg(F.count(F.lit(1)).alias("c_pre"))
    )
    scored = (
        bgs.join(F.broadcast(lm_bg), "bg")
        .withColumn("pre", F.substring("bg", 1, 1))
        .join(F.broadcast(lm_pre), "pre")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log(F.col("c_bg") / F.col("c_pre"))), 6).alias("lm_score"),
        )
    )


def oracle_bigram_lm_sql() -> str:
    return """
lm_bgs AS (
  SELECT d.doc_id, substring(d.text, CAST(p.pos AS INT), 2) AS bg
  FROM documents d,
       LATERAL (SELECT unnest(range(1, greatest(1, length(d.text) - 1) + 1)) AS pos) p
  WHERE length(substring(d.text, CAST(p.pos AS INT), 2)) = 2
),
lm_bg AS (SELECT bg, count(*) AS c_bg FROM lm_bgs GROUP BY bg),
lm_pre AS (SELECT substring(bg, 1, 1) AS pre, count(*) AS c_pre
           FROM lm_bgs GROUP BY 1)
SELECT b.doc_id, count(*) AS n_bigrams,
       round(avg(ln(g.c_bg / p.c_pre)), 6) AS lm_score
FROM lm_bgs b
JOIN lm_bg g ON g.bg = b.bg
JOIN lm_pre p ON p.pre = substring(b.bg, 1, 1)
GROUP BY b.doc_id"""

BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN)).cast("long")


def bpe_ish_token_count_sql(expr: str) -> str:
    return (
        rf"CAST(len(regexp_extract_all({expr}, "
        rf"'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# PII redaction: sequential regex scrubbing of emails / SSNs / IPv4s /
# phone numbers — the standard pre-training hygiene pass. Patterns stay
# inside the Java-regex ∩ RE2 common subset (character classes, bounded
# repetition, \b) so the DuckDB oracle applies the SAME patterns; Spark's
# regexp_replace is replace-all by default, DuckDB needs the 'g' flag.
# Application order matters (IPv4 before phone: dotted quads would
# otherwise half-match the phone pattern) and is identical in both
# engines. Counts are taken on the ORIGINAL text.
#
# Scale: a narrow projection — no shuffle, whole-stage codegen, streams
# through any corpus at scan speed.
# ---------------------------------------------------------------------------

#: (label, pattern, replacement) in application order
PII_PATTERNS = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssns", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phones", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def pii_redact(docs, text_col: str = "text"):
    """(doc_id, text_redacted, n_emails, n_ssns, n_ips, n_phones)."""
    out = F.col(text_col)
    counts = []
    for label, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{label}")
        )
        out = F.regexp_replace(out, pat, repl)
    return docs.select("doc_id", out.alias("text_redacted"), *counts)


def oracle_pii_redact_sql(table: str = "documents", text_col: str = "text") -> str:
    out = text_col
    counts = []
    for label, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        counts.append(
            f"CAST(len(regexp_extract_all({text_col}, '{p}')) AS BIGINT) AS n_{label}"
        )
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return (
        f"SELECT doc_id, {out} AS text_redacted, {', '.join(counts)} FROM {table}"
    )


# ---------------------------------------------------------------------------
# hashed n-gram embedding (the "hashing trick" vectorizer): a REAL text
# featurizer with no external model — embedding[j] = number of k-gram
# OCCURRENCES whose portable polynomial hash lands in bucket j (mod dim).
# Integer counts, so the vector is EXACT cross-engine (no float drift)
# and downstream cosine/ANN operators (operators/vectors.py,
# operators/dedup.embedding_near_dups) consume it after a double cast.
# One narrow projection per doc (O(len·dim) JVM higher-order work), no
# shuffle, no Python.
# ---------------------------------------------------------------------------

from .phash import B1 as _EMB_BASE
from .phash import poly8_sql as _poly8_sql


def hashed_ngram_embedding_rows(
    docs, dim: int = 64, k: int = 3, text_col: str = "text"
):
    """Dense row form (doc_id, bucket, cnt) of the hashed embedding.

    Plan: gram-hash transform → explode → ONE (doc_id, bucket) hash
    aggregate → zero-filled dense frame. The first cut counted buckets
    with 64 per-row `filter(_h, ...)` higher-order calls — Spark HOFs are
    INTERPRETED per element and the hash transform re-evaluated per
    bucket, measured 183 s at sf0.1; this explode+aggregate plan does the
    identical arithmetic once per gram (0.9 s) and is the shape that
    scales (shuffle keyed by doc, bounded per-key width = dim)."""
    # texts shorter than k yield NO grams (an empty/NULL text must embed
    # as the zero vector, not as one phantom truncated gram — review r3)
    grams = (
        f"CASE WHEN length({text_col}) >= {k} THEN "
        f"transform(sequence(1, length({text_col}) - {k - 1}), "
        f"i -> substring({text_col}, i, {k})) "
        f"ELSE CAST(array() AS array<string>) END"
    )
    hashes = f"transform(_gs, s -> {_poly8_sql('s', _EMB_BASE)} % {dim})"
    from ..session import spread_input as _spread_in

    cnts = (
        _spread_in(docs.select("doc_id", text_col))
        .withColumn("_gs", F.expr(grams))
        .select("doc_id", F.explode(F.expr(hashes)).alias("bucket"))
        .where(F.col("bucket").isNotNull())
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    frame = docs.select("doc_id").distinct().select(
        "doc_id", F.explode(F.expr(f"sequence(0, {dim - 1})")).alias("bucket")
    )
    return frame.join(cnts, ["doc_id", "bucket"], "left").select(
        "doc_id", "bucket", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")
    )


def hashed_ngram_embedding(docs, dim: int = 64, k: int = 3, text_col: str = "text"):
    """(doc_id, embedding: array<bigint>[dim]) — bag-of-k-gram counts
    folded into `dim` buckets by the portable hash. Null, empty, or
    shorter-than-k text → the all-zero vector (no phantom truncated
    gram; matches the oracle's dense zero fill). Assembled from the row
    form (see hashed_ngram_embedding_rows for the plan rationale)."""
    rows = hashed_ngram_embedding_rows(docs, dim=dim, k=k, text_col=text_col)
    return rows.groupBy("doc_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(bucket, cnt))), s -> s.cnt)"
        ).alias("embedding")
    )


def oracle_hashed_embedding_sql(
    table: str = "documents", dim: int = 64, k: int = 3, text_col: str = "text"
) -> str:
    """DuckDB mirror: lateral gram explode → bucket counts → dense
    zero-filled ordered list per doc. Docs whose text yields no grams
    (NULL) get the all-zero vector via the documents × buckets frame."""
    h = _poly8_sql("g.gs", _EMB_BASE)
    return f"""
he_grams AS (
  SELECT d.doc_id, ({h}) % {dim} AS bucket
  FROM {table} d,
       LATERAL (SELECT substring(d.{text_col}, CAST(p.pos AS INT), {k}) AS gs
                FROM (SELECT unnest(range(1, CASE WHEN length(d.{text_col}) >= {k}
                      THEN length(d.{text_col}) - {k - 1} + 1 ELSE 1 END)) AS pos) p) g
),
he_counts AS (
  SELECT doc_id, bucket, count(*) AS c FROM he_grams GROUP BY 1, 2
),
he_frame AS (
  SELECT d.doc_id, b.bucket FROM (SELECT DISTINCT doc_id FROM {table}) d,
       LATERAL (SELECT unnest(range(0, {dim})) AS bucket) b
)
SELECT f.doc_id,
       list(CAST(coalesce(c.c, 0) AS BIGINT) ORDER BY f.bucket) AS embedding
FROM he_frame f LEFT JOIN he_counts c
  ON c.doc_id = f.doc_id AND c.bucket = f.bucket
GROUP BY f.doc_id"""


def oracle_hashed_embedding_rows_sql(
    table: str = "documents", dim: int = 64, k: int = 3, text_col: str = "text"
) -> str:
    """Row-form mirror (doc_id, bucket, cnt) — scalar columns only, the
    shape the driver gate value-hashes (array-typed result columns are
    not part of the gate contract)."""
    h = _poly8_sql("g.gs", _EMB_BASE)
    return f"""
he_grams AS (
  SELECT d.doc_id, ({h}) % {dim} AS bucket
  FROM {table} d,
       LATERAL (SELECT substring(d.{text_col}, CAST(p.pos AS INT), {k}) AS gs
                FROM (SELECT unnest(range(1, CASE WHEN length(d.{text_col}) >= {k}
                      THEN length(d.{text_col}) - {k - 1} + 1 ELSE 1 END)) AS pos) p) g
),
he_counts AS (
  SELECT doc_id, bucket, count(*) AS c FROM he_grams GROUP BY 1, 2
),
he_frame AS (
  SELECT d.doc_id, b.bucket FROM (SELECT DISTINCT doc_id FROM {table}) d,
       LATERAL (SELECT unnest(range(0, {dim})) AS bucket) b
)
SELECT f.doc_id, f.bucket, CAST(coalesce(c.c, 0) AS BIGINT) AS cnt
FROM he_frame f LEFT JOIN he_counts c
  ON c.doc_id = f.doc_id AND c.bucket = f.bucket"""


# ---------------------------------------------------------------------------
# repetition quality signals (the Gopher/MassiveText-style repetition
# rules that sit next to quality_score in a filtering pipeline):
#   dup_line_frac  — fraction of a doc's lines that are repeats
#   top2gram_frac  — share of word-bigram occurrences taken by the doc's
#                    single most frequent bigram
# Line stats are per-row JVM array ops; the bigram mode is explode → one
# (doc, bigram) hash aggregate → per-doc max/sum — NOT a per-row
# higher-order mode search (the interpreted-HOF lesson: never scan an
# array O(n²) inside a lambda when an explode+aggregate does it in one
# shuffle).
# ---------------------------------------------------------------------------

def repetition_stats(docs, text_col: str = "text"):
    """(doc_id, n_lines, dup_line_frac, n_bigrams, top2gram_frac).
    Null text propagates null metrics; docs with < 2 words have
    n_bigrams = 0 and null top2gram_frac."""
    lines = f"split({text_col}, '\\n')"
    base = docs.select(
        "doc_id",
        F.expr(f"size({lines})").alias("n_lines"),
        F.round(
            F.expr(
                f"1.0 - CAST(size(array_distinct({lines})) AS DOUBLE) / size({lines})"
            ),
            6,
        ).alias("dup_line_frac"),
        F.expr(f"filter(split({text_col}, '\\\\s+'), w -> w <> '')").alias("_w"),
    )
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, greatest(0, size(_w) - 2)), "
                # get(): null (not an ANSI error) beyond the end on
                # 0/1-word docs
                "i -> concat(get(_w, i), ' ', get(_w, i + 1)))"
            )
        ).alias("bg"),
    ).where(F.col("bg").isNotNull())
    per_bg = bigrams.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    agg = per_bg.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top2gram_frac"),
    )
    return (
        base.select("doc_id", "n_lines", "dup_line_frac")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            "dup_line_frac",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "top2gram_frac",
        )
    )


def oracle_repetition_sql(table: str = "documents", text_col: str = "text") -> str:
    return rf"""
rp_base AS (
  SELECT doc_id,
         len(string_split({text_col}, chr(10))) AS n_lines,
         round(1.0 - CAST(len(list_distinct(string_split({text_col}, chr(10)))) AS DOUBLE)
               / len(string_split({text_col}, chr(10))), 6) AS dup_line_frac,
         list_filter(regexp_split_to_array({text_col}, '\s+'), w -> w <> '') AS _w
  FROM {table}
),
rp_bg AS (
  SELECT b.doc_id, concat(b._w[CAST(p.i AS INT)], ' ', b._w[CAST(p.i AS INT) + 1]) AS bg
  FROM rp_base b,
       LATERAL (SELECT unnest(range(1, greatest(1, len(b._w) - 1) + 1)) AS i) p
  WHERE len(b._w) >= 2 AND CAST(p.i AS INT) <= len(b._w) - 1
),
rp_cnt AS (SELECT doc_id, bg, count(*) AS c FROM rp_bg GROUP BY 1, 2),
rp_agg AS (
  SELECT doc_id, sum(c) AS n_bigrams, round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top2gram_frac
  FROM rp_cnt GROUP BY doc_id
)
SELECT b.doc_id, b.n_lines, b.dup_line_frac,
       CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams, a.top2gram_frac
FROM rp_base b LEFT JOIN rp_agg a ON a.doc_id = b.doc_id"""


# ---------------------------------------------------------------------------
# cross-document paragraph dedup (round 4). Within-doc repetition lives in
# repetition_stats; THIS op measures corpus-level boilerplate — the
# header/footer/licence paragraphs that appear verbatim across documents
# (the C4/RefinedWeb line-dedup signal). Plan: explode lines → distinct
# (doc, md5(line)) → ONE count-per-line aggregate → per-doc rollup. Two
# shuffles total, everything keyed by a 128-bit line hash (never the line
# text), so the heavy aggregation state is fixed-width at any corpus size.
# ---------------------------------------------------------------------------

def paragraph_dedup(docs, text_col: str = "text"):
    """Per doc: (n_paras, n_shared, shared_frac) where a 'paragraph' is a
    trimmed non-empty line and 'shared' means the identical paragraph
    occurs in >= 2 distinct documents. Docs with no paragraphs keep a row
    with zero counts and null frac (mirror of repetition_stats nulls)."""
    para = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.col(text_col), "\n", -1)).alias("line"),
        )
        .select("doc_id", F.trim(F.col("line")).alias("p"))
        .filter(F.col("p") != "")
        .select("doc_id", F.md5(F.col("p")).alias("ph"))
        .distinct()
    )
    cnt = para.groupBy("ph").agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (
        para.join(cnt, "ph")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("_np"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias("_ns"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("_np", F.lit(0)).alias("n_paras"),
            F.coalesce("_ns", F.lit(0)).alias("n_shared"),
            F.round(F.col("_ns") / F.col("_np"), 6).alias("shared_frac"),
        )
    )


def oracle_paragraph_dedup_sql(table: str = "documents", text_col: str = "text") -> str:
    return f"""
pd_para AS (
  SELECT DISTINCT d.doc_id, md5(trim(l.line)) AS ph
  FROM {table} d,
       LATERAL (SELECT unnest(string_split(d.{text_col}, chr(10))) AS line) l
  WHERE trim(l.line) <> ''
),
pd_cnt AS (SELECT ph, count(*) AS n_docs FROM pd_para GROUP BY ph),
pd_doc AS (
  SELECT p.doc_id, count(*) AS _np,
         sum(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS _ns
  FROM pd_para p JOIN pd_cnt c ON c.ph = p.ph GROUP BY p.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a._np, 0) AS BIGINT) AS n_paras,
       CAST(coalesce(a._ns, 0) AS BIGINT) AS n_shared,
       round(CAST(a._ns AS DOUBLE) / a._np, 6) AS shared_frac
FROM {table} d LEFT JOIN pd_doc a ON a.doc_id = d.doc_id"""


# ---------------------------------------------------------------------------
# exact global token top-k (round 4): the EXACT heavy-hitter companion to
# the Count-Min sketch in operators/sketches.py. One hash aggregate, then
# TakeOrderedAndProject for the global top-k (distributed partial top-k
# per partition, k rows to the driver — never a global sort).
# ---------------------------------------------------------------------------

def token_topk(docs, k: int = 50, text_col: str = "text"):
    """Top-k whitespace tokens by exact count, rank ties broken by token
    text so both engines agree on the cut."""
    from pyspark.sql import Window

    toks = docs.select(
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit(""))
        ).alias("tok")
    )
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    topk = cnt.orderBy(F.col("n").desc(), F.col("tok").asc()).limit(k)
    # rank assignment runs over the k collected rows only — the global
    # sort above is a TakeOrderedAndProject, not a full exchange
    w = Window.orderBy(F.col("n").desc(), F.col("tok").asc())
    return topk.withColumn("rank", F.row_number().over(w))


def oracle_token_topk_sql(
    k: int = 50, table: str = "documents", text_col: str = "text"
) -> str:
    return rf"""
tt_tok AS (
  SELECT t.tok FROM {table} d,
       LATERAL (SELECT unnest(regexp_split_to_array(d.{text_col}, '\s+')) AS tok) t
  WHERE t.tok <> ''
),
tt_cnt AS (SELECT tok, count(*) AS n FROM tt_tok GROUP BY tok)
SELECT tok, n, rank FROM (
  SELECT *, row_number() OVER (ORDER BY n DESC, tok) AS rank FROM tt_cnt
) WHERE rank <= {k}"""


# ---------------------------------------------------------------------------
# per-doc TF-IDF top terms (round 4): the classic keyword extractor over
# the corpus — tf·ln(N/df) with exact integer tf/df and the same 1-ulp
# ln() discipline bigram_lm_scores already proved cross-engine. Plan:
# explode → (doc, term) counts → term df counts → join → per-doc window
# top-k. The window partitions by doc_id (bounded per-doc term counts),
# never globally.
# ---------------------------------------------------------------------------

def tfidf_topk_terms(
    docs, k: int = 5, text_col: str = "text", broadcast_vocab: bool = True
):
    """Per doc: top-k terms by tf * ln(N / df), rank ties broken by term
    text. Returns (doc_id, term, tf, df, score, rank); score rounded to
    6 dp (ln is within 1 ulp per engine).

    broadcast_vocab=True ships the document-frequency table to every
    task so the score join never shuffles the (doc, term) pair set by
    its heavily-skewed term key — measured 33.7 s → 5.8-9.5 s on a
    480k-doc corpus. Pass False for open-vocabulary corpora whose
    distinct-term table outgrows broadcast; the shuffle join falls back
    to AQE skew splitting."""
    from pyspark.sql import Window

    n_docs = docs.count()
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit(""))
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf IS the distinct (doc, term) set — derive df from it instead of
    # re-shuffling the raw token stream through a second distinct (the
    # identical aggregation subtree becomes a ReusedExchange): measured
    # 33.7 s → ~17 s on a 480k-doc corpus
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if broadcast_vocab:
        df_ = F.broadcast(df_)
    scored = tf.join(df_, "term").select(
        "doc_id", "term", "tf", "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def oracle_tfidf_sql(
    n_docs: int | None = None,
    k: int = 5,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """n_docs=None emits a scalar-subquery corpus count, so the oracle is
    correct at ANY sf the gate runs (the subquery's BIGINT → DOUBLE cast
    equals the engine's float(docs.count()) literal exactly)."""
    return rf"""
ti_tok AS (
  SELECT d.doc_id, t.term FROM {table} d,
       LATERAL (SELECT unnest(regexp_split_to_array(d.{text_col}, '\s+')) AS term) t
  WHERE t.term <> ''
),
ti_tf AS (SELECT doc_id, term, count(*) AS tf FROM ti_tok GROUP BY 1, 2),
ti_df AS (
  SELECT term, count(*) AS df
  FROM (SELECT DISTINCT doc_id, term FROM ti_tok) GROUP BY term
),
ti_scored AS (
  SELECT f.doc_id, f.term, f.tf, d.df,
         round(f.tf * ln({float(n_docs) if n_docs is not None
                          else f"CAST((SELECT count(*) FROM {table}) AS DOUBLE)"} / d.df), 6) AS score
  FROM ti_tf f JOIN ti_df d ON d.term = f.term
)
SELECT doc_id, term, tf, df, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS rank
  FROM ti_scored
) WHERE rank <= {k}"""


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (round 5): the ranked-retrieval companion to
# tfidf_topk_terms — Okapi BM25 with the standard k1/b shape, scored for a
# fixed query-term set and reduced to the global top-k documents. The
# retrieval primitive behind quality-targeted corpus selection ("pull the
# docs most about X") in a training-data pipeline.
#
# Plan: explode -> per-doc term counts (one hash aggregate, map-side
# combined) -> df of the query terms only (a handful of rows, broadcast) ->
# per-doc score sum -> TakeOrderedAndProject for the global top-k (k rows
# to the driver, never a global sort). The (doc, term) shuffle carries only
# tokens matching the query terms: the filter lands before the aggregate,
# so corpus-scale cost is O(matching postings), not O(all tokens).
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk_docs(
    docs,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
):
    """Top-k docs by summed Okapi BM25 over `query_terms`.

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    with idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)); dl = whitespace token
    count, avgdl its corpus mean. N/avgdl are two scalar probes (count +
    one tiny aggregate). Returns (doc_id, n_hits, score, rank), score
    rounded to 6 dp (ln within 1 ulp per engine, sum order absorbed by
    the round — at most len(query_terms) addends per doc).

    Ties broken by doc_id so both engines agree on the cut."""
    from pyspark.sql import Window

    terms = sorted(set(query_terms))
    n_docs = float(docs.count())
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit(""))
        ).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    avgdl = float(dl.agg(F.avg("dl")).first()[0])
    hits = toks.filter(F.col("term").isin(terms))
    tf = hits.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = F.broadcast(
        tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        tf.join(df_, "term")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.lit(n_docs) - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(float(k1) + 1.0))
                / (
                    F.col("tf")
                    + F.lit(float(k1))
                    * (
                        F.lit(1.0 - float(b))
                        + F.lit(float(b)) * F.col("dl") / F.lit(avgdl)
                    )
                )
            ).alias("s"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.round(F.sum("s"), 6).alias("score"),
        )
    )
    topk = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w))


def oracle_bm25_sql(
    query_terms: list[str],
    k: int = 20,
    table: str = "documents",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB spelling with the SAME expression shapes; N and avgdl are
    scalar subqueries (BIGINT->DOUBLE casts equal the engine's floats:
    counts are integers, and avg over BIGINT is the same IEEE mean both
    engines compute pairwise-free at these scales... avgdl is compared
    through the 6-dp round like every other derived double)."""
    terms_sql = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(query_terms)))
    return rf"""
bm_tok AS (
  SELECT d.doc_id, t.term FROM {table} d,
       LATERAL (SELECT unnest(regexp_split_to_array(d.{text_col}, '\s+')) AS term) t
  WHERE t.term <> ''
),
bm_dl AS (SELECT doc_id, count(*) AS dl FROM bm_tok GROUP BY doc_id),
bm_n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM {table}),
bm_avgdl AS (SELECT CAST(avg(dl) AS DOUBLE) AS avgdl FROM bm_dl),
bm_tf AS (
  SELECT doc_id, term, count(*) AS tf FROM bm_tok
  WHERE term IN ({terms_sql}) GROUP BY 1, 2
),
bm_df AS (SELECT term, count(*) AS df FROM bm_tf GROUP BY term),
bm_scored AS (
  SELECT f.doc_id, count(*) AS n_hits,
         round(sum(
           ln(1.0 + (n.n - d.df + 0.5) / (d.df + 0.5))
           * (f.tf * {float(k1) + 1.0})
           / (f.tf + {float(k1)} * ({1.0 - float(b)} + {float(b)} * l.dl / a.avgdl))
         ), 6) AS score
  FROM bm_tf f
  JOIN bm_df d ON d.term = f.term
  JOIN bm_dl l ON l.doc_id = f.doc_id
  CROSS JOIN bm_n n CROSS JOIN bm_avgdl a
  GROUP BY f.doc_id
)
SELECT doc_id, n_hits, score, rank FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM bm_scored
) WHERE rank <= {k}"""


#: query-term set used by the gate entry (tests pin the same list)
GATE_BM25_TERMS = ("spark", "join", "window")
