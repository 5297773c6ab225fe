"""Training-corpus curation queries (round 2): repetition filtering,
benchmark decontamination, deterministic splits/sampling, and LM scoring.

These extend the LLM-pipeline surface beyond the reference's own operators
(the reference has no corpus tooling at all — its data surface is the
kimball SQL tree, /root/reference/deployer/patch/DWH/kimball/), covering
the four standard curation stages a 100 TB text pipeline runs between
crawl and training: quality/repetition gating (Gopher-style rules),
eval-set decontamination (n-gram overlap), hash-deterministic
train/valid/test splitting + per-source sampling, and model-based scoring
(here a corpus-trained bigram LM).

Scale notes per query live on each function. Everything is exact-integer
or single-division arithmetic — all five are DuckDB-hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..ops import quality, sampling, text


# --------------------------------------------------------------------------
# q81 — Gopher-style repetition gate. dup3_frac = repeated-3-gram fraction,
# top2_frac = share of the most frequent 2-gram. The verdict thresholds are
# integer-exact (d3 < n3; 100*top2 >= 8*n2) so the CASE is hash-stable.
# Scale: two explode+groupBy passes keyed on doc_id — linear, two shuffles,
# no joins beyond the doc_id merge of the two metric legs.
# --------------------------------------------------------------------------
def q81_repetition_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    m = text.repetition_metrics(docs)
    repetitive = (F.col("dup3_frac") > 0) | (F.col("top2_frac") >= 0.08)
    return m.select(
        "doc_id",
        "n3",
        "dup3_frac",
        "top2_frac",
        F.when(repetitive, F.lit("repetitive")).otherwise(F.lit("ok")).alias("verdict"),
    )


_Q81_SQL = """
WITH toks AS (
  SELECT doc_id, generate_subscripts(string_split(text, chr(32)), 1) AS pos,
         unnest(string_split(text, chr(32))) AS token
  FROM documents
),
g3 AS (
  SELECT doc_id, gram FROM (
    SELECT doc_id,
      token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w AS gram
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE gram IS NOT NULL
),
m3 AS (
  SELECT doc_id, COUNT(*) AS n3, COUNT(DISTINCT gram) AS d3 FROM g3 GROUP BY doc_id
),
g2 AS (
  SELECT doc_id, gram FROM (
    SELECT doc_id, token || ' ' || lead(token, 1) OVER w AS gram
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE gram IS NOT NULL
),
m2 AS (
  SELECT doc_id, MAX(c) AS top2, SUM(c) AS n2
  FROM (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram)
  GROUP BY doc_id
)
SELECT m3.doc_id,
  CAST(m3.n3 AS BIGINT) AS n3,
  CAST(m3.n3 - m3.d3 AS DOUBLE) / m3.n3 AS dup3_frac,
  CAST(m2.top2 AS DOUBLE) / m2.n2 AS top2_frac,
  CASE WHEN m3.d3 < m3.n3 OR 100 * m2.top2 >= 8 * m2.n2
       THEN 'repetitive' ELSE 'ok' END AS verdict
FROM m3 JOIN m2 ON m3.doc_id = m2.doc_id
"""


# --------------------------------------------------------------------------
# q82 — eval-set decontamination: the 'src0' slice plays the held-out
# benchmark; a training doc is contaminated if it shares any 5-gram with
# it. Reported per source: docs, flagged docs, total contaminated grams.
# Scale: the distinct-5-gram inverted index is the standard decon shape —
# the gram equi-join shuffles on the gram key (high cardinality, well
# spread); the benchmark side is typically small but unbounded, so no
# broadcast hint — AQE decides. Random 5-gram collisions are negligible
# (vocab^5 keyspace), so hits are true near-dups of benchmark docs.
# --------------------------------------------------------------------------
def q82_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g5 = text.ngram_occurrences(docs, 5, keep_cols=("source",)).distinct()
    bench = g5.where(F.col("source") == "src0").select("gram").distinct()
    train = g5.where(F.col("source") != "src0")
    hits = (
        train.join(bench, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    per_doc = (
        train.groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_g"))
        .join(hits, "doc_id", "left")
        .select("source", F.coalesce("n_hit", F.lit(0)).alias("n_hit"))
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("n_hit") > 0, 1).otherwise(0)).cast("bigint").alias("n_flagged"),
        F.sum("n_hit").cast("bigint").alias("n_hit_grams"),
    )


_Q82_SQL = """
WITH toks AS (
  SELECT doc_id, source, generate_subscripts(string_split(text, chr(32)), 1) AS pos,
         unnest(string_split(text, chr(32))) AS token
  FROM documents
),
g5 AS (
  SELECT DISTINCT doc_id, source, gram FROM (
    SELECT doc_id, source,
      token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w
            || ' ' || lead(token, 3) OVER w || ' ' || lead(token, 4) OVER w AS gram
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE gram IS NOT NULL
),
bench AS (SELECT DISTINCT gram FROM g5 WHERE source = 'src0'),
train AS (SELECT doc_id, source, gram FROM g5 WHERE source <> 'src0'),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n_hit
  FROM train t JOIN bench b ON t.gram = b.gram GROUP BY t.doc_id
),
per_doc AS (
  SELECT g.source, COALESCE(h.n_hit, 0) AS n_hit
  FROM (SELECT doc_id, source, COUNT(*) AS n_g FROM train GROUP BY doc_id, source) g
  LEFT JOIN hits h ON g.doc_id = h.doc_id
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
  CAST(SUM(n_hit) AS BIGINT) AS n_hit_grams
FROM per_doc GROUP BY source
"""


# --------------------------------------------------------------------------
# q83 — deterministic train/valid/test split census. The split is a pure
# projection on md5(doc_id) (ops/sampling.py) — no RNG, no shuffle, stable
# under any cluster layout; the census aggregates (lang, split).
# --------------------------------------------------------------------------
def q83_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_split = docs.withColumn("split", sampling.split_column("doc_id"))
    return with_split.groupBy("lang", "split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


_Q83_SQL = f"""
SELECT lang, {sampling.duck_split_sql("doc_id")} AS split,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q84 — per-source stratified downsampling at hash-deterministic rates
# (10/30/60% by source index mod 3 — the mixing-weights table a real
# pipeline would read from config). The keep decision hashes a salted key
# ('s' || doc_id) so it is independent of q83's split assignment. Pure
# filter + one aggregation; the filter pushes to the scan.
# --------------------------------------------------------------------------
def q84_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    rate = (
        F.when(src_num % 3 == 0, 10).when(src_num % 3 == 1, 30).otherwise(60)
    )
    salted = F.concat(F.lit("s"), F.col("doc_id").cast("string"))
    kept = sampling.hash_bucket(salted, 100) < rate
    return (
        docs.select("source", rate.alias("rate"), kept.cast("int").alias("k"))
        .groupBy("source")
        .agg(
            (F.first("rate").cast("double") / 100).alias("target_rate"),
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum("k").cast("bigint").alias("n_kept"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("kept_frac"),
        )
    )


_Q84_SQL = f"""
WITH flagged AS (
  SELECT source,
    CASE CAST(substring(source, 4, 10) AS INTEGER) % 3
      WHEN 0 THEN 10 WHEN 1 THEN 30 ELSE 60 END AS rate,
    CASE WHEN {sampling.duck_hash_bucket_sql("'s' || CAST(doc_id AS VARCHAR)", 100)}
         < CASE CAST(substring(source, 4, 10) AS INTEGER) % 3
             WHEN 0 THEN 10 WHEN 1 THEN 30 ELSE 60 END
         THEN 1 ELSE 0 END AS k
  FROM documents
)
SELECT source,
  CAST(MIN(rate) AS DOUBLE) / 100 AS target_rate,
  CAST(COUNT(*) AS BIGINT) AS n_total,
  CAST(SUM(k) AS BIGINT) AS n_kept,
  CAST(SUM(k) AS DOUBLE) / COUNT(*) AS kept_frac
FROM flagged GROUP BY source
"""


# --------------------------------------------------------------------------
# q85 — bigram-LM document scoring: train per-lang bigram conditional
# probabilities on the corpus itself, then score each doc by its mean
# P(w2|w1). cond_p is a single IEEE division of exact integers (identical
# doubles cross-engine); the per-doc mean goes through ROUND(.,8) ->
# DECIMAL(18,10) -> exact SUM -> one double division, the num.py recipe
# (binary doubles can never tie at decimal scale 10, so the decimal
# rounding is engine-agnostic). Scale: corpus stats are a (lang,w1,w2)
# aggregation; scoring re-joins doc bigram occurrences to the stats on the
# same key — inverted-index shape, shuffles well spread on bigram keys.
# --------------------------------------------------------------------------
def q85_lm_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.select(
            "lang",
            "doc_id",
            F.col("token").alias("w1"),
            F.lead("token", 1).over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
    )
    corpus = bg.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    uni = toks.groupBy("lang", F.col("token").alias("w1")).agg(
        F.count(F.lit(1)).alias("u")
    )
    cond = corpus.join(uni, ["lang", "w1"]).select(
        "lang", "w1", "w2", (F.col("c").cast("double") / F.col("u")).alias("cond_p")
    )
    scored = bg.join(cond, ["lang", "w1", "w2"]).groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        (
            F.sum(F.round("cond_p", 8).cast("decimal(18,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_condp"),
    )
    band = (
        F.when(F.col("avg_condp") < 0.035, "low")
        .when(F.col("avg_condp") < 0.041, "mid")
        .otherwise("high")
    )
    return scored.select("doc_id", "lang", "n_bigrams", "avg_condp", band.alias("band"))


_Q85_SQL = """
WITH toks AS (
  SELECT lang, doc_id, generate_subscripts(string_split(text, chr(32)), 1) AS pos,
         unnest(string_split(text, chr(32))) AS token
  FROM documents
),
bg AS (
  SELECT lang, doc_id, w1, w2 FROM (
    SELECT lang, doc_id, token AS w1, lead(token, 1) OVER w AS w2
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE w2 IS NOT NULL
),
corpus AS (
  SELECT lang, w1, w2, COUNT(*) AS c FROM bg GROUP BY lang, w1, w2
),
uni AS (
  SELECT lang, token AS w1, COUNT(*) AS u FROM toks GROUP BY lang, token
),
cond AS (
  SELECT corpus.lang, corpus.w1, corpus.w2, CAST(c AS DOUBLE) / u AS cond_p
  FROM corpus JOIN uni ON corpus.lang = uni.lang AND corpus.w1 = uni.w1
),
scored AS (
  SELECT bg.doc_id, bg.lang,
    CAST(COUNT(*) AS BIGINT) AS n_bigrams,
    CAST(SUM(CAST(ROUND(cond_p, 8) AS DECIMAL(18,10))) AS DOUBLE) / COUNT(*) AS avg_condp
  FROM bg JOIN cond ON bg.lang = cond.lang AND bg.w1 = cond.w1 AND bg.w2 = cond.w2
  GROUP BY bg.doc_id, bg.lang
)
SELECT doc_id, lang, n_bigrams, avg_condp,
  CASE WHEN avg_condp < 0.035 THEN 'low'
       WHEN avg_condp < 0.041 THEN 'mid' ELSE 'high' END AS band
FROM scored
"""


# --------------------------------------------------------------------------
# q100 — PII scrubbing (the C4/Dolma-style pre-training redaction stage).
# The synthetic corpus has no organic PII, so each doc gets a DETERMINISTIC
# contact tail derived from doc_id (an email, a phone, an IPv4) appended to
# its real text; the general redaction operator (ops/quality.redact_pii —
# shared Java/RE2-compatible patterns, pure codegen regexp, no UDF) then
# scrubs it. Output: per-lang doc counts, per-pattern hit counts (counted
# on the raw text), and the total redacted length — all exact integers.
# Scale: one scan, per-row regexp in codegen, one groupBy(lang) shuffle of
# 5 partial rows; at 100 TB this is the cheapest kind of pass there is.
# --------------------------------------------------------------------------
def planted_contact() -> F.Column:
    """The deterministic doc_id-derived contact tail q100 appends: one
    email, one phone (rotating through all four shapes the widened
    pattern covers, keyed by doc_id % 4), one IPv4, one full-form IPv6 —
    so every pattern alternative is exercised (and hash-checked) per run.
    Shared with the pytest scrub-invariant so test and query can't
    drift."""
    p4 = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    phone_form = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("555-"), p4))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("(555) 123-"), p4))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("+1-555-123-"), p4))
        .otherwise(F.concat(F.lit("555123"), p4))
    )
    return F.concat(
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com phone "),
        phone_form,
        F.lit(" ssn 123-45-"),
        p4,
        F.lit(" ip 10."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(".0.1 v6 2001:db8:85a3:0:0:8a2e:370:"),
        p4,
    )


def q100_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(F.col("text"), planted_contact())
    counts = quality.pii_counts(F.col("raw"))
    d = docs.select(
        "lang", raw.alias("raw"), quality.redact_pii(raw).alias("red")
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(counts["email"]).cast("bigint").alias("n_email"),
        F.sum(counts["phone"]).cast("bigint").alias("n_phone"),
        F.sum(counts["ssn"]).cast("bigint").alias("n_ssn"),
        F.sum(counts["ipv4"]).cast("bigint").alias("n_ipv4"),
        F.sum(counts["ipv6"]).cast("bigint").alias("n_ipv6"),
        F.sum(F.length("red")).cast("bigint").alias("redacted_chars"),
    )


def _q100_sql() -> str:
    email, e_tok = quality.PII_PATTERNS["email"]
    ssn, s_tok = quality.PII_PATTERNS["ssn"]
    phone, p_tok = quality.PII_PATTERNS["phone"]
    ipv4, i_tok = quality.PII_PATTERNS["ipv4"]
    ipv6, i6_tok = quality.PII_PATTERNS["ipv6"]
    return f"""
WITH d AS (
  SELECT lang,
    text || ' contact user' || CAST(doc_id AS VARCHAR)
      || '@example.com phone '
      || CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN '555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           WHEN 1 THEN '(555) 123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           WHEN 2 THEN '+1-555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           ELSE '555123' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         END
      || ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      || ' ip 10.' || CAST(doc_id % 250 AS VARCHAR) || '.0.1 v6 2001:db8:85a3:0:0:8a2e:370:'
      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
  FROM documents
), r AS (
  SELECT lang, raw,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
      '{email}', '{e_tok}', 'g'),
      '{ssn}', '{s_tok}', 'g'),
      '{phone}', '{p_tok}', 'g'),
      '{ipv4}', '{i_tok}', 'g'),
      '{ipv6}', '{i6_tok}', 'g') AS red
  FROM d
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(len(regexp_extract_all(raw, '{email}'))) AS BIGINT) AS n_email,
  CAST(SUM(len(regexp_extract_all(raw, '{phone}'))) AS BIGINT) AS n_phone,
  CAST(SUM(len(regexp_extract_all(raw, '{ssn}'))) AS BIGINT) AS n_ssn,
  CAST(SUM(len(regexp_extract_all(raw, '{ipv4}'))) AS BIGINT) AS n_ipv4,
  CAST(SUM(len(regexp_extract_all(raw, '{ipv6}'))) AS BIGINT) AS n_ipv6,
  CAST(SUM(length(red)) AS BIGINT) AS redacted_chars
FROM r GROUP BY lang
"""


# --------------------------------------------------------------------------
# q101 — token-budget sequence packing (the GPT-style "concatenate the
# corpus, chunk into fixed-length blocks" pretraining step). Docs are
# ordered deterministically (doc_id) within each lang stream; each doc's
# exclusive running token count gives its start offset, and integer
# division by the block budget yields the first training block it lands in
# and how many blocks it spans. Pure window-cumsum + integer math — exact,
# order-stable, oracle-checkable.
# Scale: ONE shuffle (the per-lang window). A global running sum is the
# one op that fights data-parallelism; at 100 TB you shard the stream
# (lang, shard_id), cumsum within shards, then broadcast per-shard total
# offsets computed from a tiny second pass — same two-phase structure
# Spark's own window exchange uses, with the partial sums made explicit.
# --------------------------------------------------------------------------
def q101_sequence_packing(
    spark: SparkSession, sf_dir: str, block_tokens: int = 512
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn(
        "start_tok",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint"),
    )
    return d.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.expr(f"start_tok div {block_tokens}").cast("bigint").alias("first_block"),
        F.expr(
            f"(start_tok + n_tokens - 1) div {block_tokens}"
            f" - start_tok div {block_tokens} + 1"
        ).cast("bigint").alias("n_blocks"),
    )


_Q101_SQL = """
WITH d AS (
  SELECT doc_id, lang,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, lang, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS start_tok
  FROM d
)
SELECT doc_id, lang, n_tokens,
  CAST(start_tok // 512 AS BIGINT) AS first_block,
  CAST((start_tok + n_tokens - 1) // 512 - start_tok // 512 + 1 AS BIGINT)
    AS n_blocks
FROM c
"""


# --------------------------------------------------------------------------
# q105 — temperature-based mixture sampling (the multilingual/multi-source
# upweighting rule every LLM data recipe uses: sample source i with
# probability ∝ p_i^(1/T), T=2 → kept_i ∝ sqrt(n_i)). Deterministic,
# SUM-FREE formulation so the doubles are bit-identical cross-engine:
# quota_i = least(n_i, floor(sqrt(n_i * N) / 2)) touches only exact
# integers, one IEEE-exact sqrt, and floor — no cross-source normalization
# sum whose addition ORDER could differ between engines. Rare sources keep
# (nearly) everything, hot sources are cut toward sqrt share. Selection is
# the md5 hash-bucket filter (ops/sampling) at rate_ppm = quota*1e6 div n,
# so membership is stable across runs/layouts and joinable later.
# Scale: one count aggregation + one broadcast of the per-source rate
# table + a pure map-side filter — zero extra exchanges over the scan.
# --------------------------------------------------------------------------
def q105_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    total = docs.agg(F.count(F.lit(1)).alias("total"))
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    quota = per_src.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        F.least(
            F.col("n_docs"),
            F.floor(
                F.sqrt(
                    (F.col("n_docs") * F.col("total")).cast("double")
                )
                / 2
            ).cast("bigint"),
        ).alias("quota"),
    )
    rates = quota.select(
        "source",
        "n_docs",
        "quota",
        F.expr("(quota * 1000000) div n_docs").cast("bigint").alias("rate_ppm"),
    )
    kept = (
        docs.join(F.broadcast(rates), "source")
        .where(
            sampling.hash_bucket(
                F.concat(F.lit("m"), F.col("doc_id").cast("string")), 1_000_000
            )
            < F.col("rate_ppm")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("kept_chars"),
        )
    )
    return rates.join(kept, "source", "left").select(
        "source",
        "n_docs",
        "quota",
        "rate_ppm",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        F.coalesce("kept_chars", F.lit(0)).cast("bigint").alias("kept_chars"),
    )


_Q105_SQL = f"""
WITH n AS (SELECT COUNT(*) AS total FROM documents),
s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source),
r AS (
  SELECT source, n_docs,
    LEAST(n_docs,
          CAST(FLOOR(SQRT(CAST(n_docs * n.total AS DOUBLE)) / 2) AS BIGINT)
    ) AS quota
  FROM s CROSS JOIN n
),
rr AS (
  SELECT source, n_docs, quota,
         CAST((quota * 1000000) // n_docs AS BIGINT) AS rate_ppm
  FROM r
),
k AS (
  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept,
         CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
  FROM documents d JOIN rr ON d.source = rr.source
  WHERE {sampling.duck_hash_bucket_sql("'m' || CAST(d.doc_id AS VARCHAR)", 1_000_000)}
        < rr.rate_ppm
  GROUP BY d.source
)
SELECT rr.source, rr.n_docs, rr.quota, rr.rate_ppm,
       COALESCE(k.n_kept, 0) AS n_kept,
       COALESCE(k.kept_chars, 0) AS kept_chars
FROM rr LEFT JOIN k ON rr.source = k.source
"""


# --------------------------------------------------------------------------
# q110 — one-pass column profiler over documents: per column null count,
# exact distinct count, min/max (numeric as double, string as binary-
# collation string), and total string length — the ingest-side data
# profile a pipeline records per table before gating (complements q74's
# rule expectations: q74 checks declared invariants, q110 DISCOVERS the
# shape). ONE aggregation job over one scan: Spark plans the multi-
# DISTINCT via a single expand + two-stage agg (partial combine map-side
# for the algebraic metrics), then the per-column rows are unstacked from
# the single result row — no per-column scans, no driver loop over
# columns at execution time. At 100 TB the exact multi-DISTINCT is the
# one expensive leg (expand multiplies rows by #distinct-aggs);
# exact=False (round 8) swaps every distinct leg for
# approx_count_distinct — HLL++ sketches are algebraic (no expand, pure
# partial-merge aggregation, one unmultiplied scan), the 100 TB mode.
# The DECLARED query stays exact=True so every cell is
# driver-hash-checkable; the HLL mode's ±10% accuracy property is pinned
# in tests/test_skew_and_properties.py (the q32 pattern: sketch outputs
# can't hash-match across engines, their defining property can't flip).
# --------------------------------------------------------------------------
_PROF_NUM = ["doc_id", "n_chars"]
_PROF_STR = ["text", "lang", "source"]


def q110_profile_documents(
    spark: SparkSession, sf_dir: str, exact: bool = True
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nd = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROF_NUM + _PROF_STR:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"nulls_{c}")
        )
        aggs.append(nd(c).alias(f"nd_{c}"))
    for c in _PROF_NUM:
        aggs.append(F.min(c).cast("double").alias(f"min_{c}"))
        aggs.append(F.max(c).cast("double").alias(f"max_{c}"))
    for c in _PROF_STR:
        aggs.append(F.min(c).alias(f"smin_{c}"))
        aggs.append(F.max(c).alias(f"smax_{c}"))
        aggs.append(F.sum(F.length(c)).cast("bigint").alias(f"len_{c}"))
    one = docs.agg(*aggs)
    rows = [
        f"'{c}', n_rows, nulls_{c}, nd_{c}, min_{c}, max_{c}, "
        "CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS BIGINT)"
        for c in _PROF_NUM
    ] + [
        f"'{c}', n_rows, nulls_{c}, nd_{c}, "
        f"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), smin_{c}, smax_{c}, len_{c}"
        for c in _PROF_STR
    ]
    stack = (
        f"stack({len(rows)}, " + ", ".join(rows) + ") AS "
        "(col, n_rows, n_nulls, n_distinct, min_num, max_num, "
        "min_str, max_str, sum_len)"
    )
    return one.selectExpr(stack)


def _q110_col_sql(c: str, numeric: bool) -> str:
    base = (
        f"SELECT '{c}' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,\n"
        f"  CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,\n"
        f"  CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,\n"
    )
    if numeric:
        base += (
            f"  CAST(MIN({c}) AS DOUBLE) AS min_num, CAST(MAX({c}) AS DOUBLE) AS max_num,\n"
            "  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,\n"
            "  CAST(NULL AS BIGINT) AS sum_len\n"
        )
    else:
        base += (
            "  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,\n"
            f"  MIN({c}) AS min_str, MAX({c}) AS max_str,\n"
            f"  CAST(SUM(LENGTH({c})) AS BIGINT) AS sum_len\n"
        )
    return base + "FROM documents"


_Q110_SQL = "\nUNION ALL\n".join(
    [_q110_col_sql(c, True) for c in _PROF_NUM]
    + [_q110_col_sql(c, False) for c in _PROF_STR]
)


QUERIES = {
    "q81_repetition_gate": q81_repetition_gate,
    "q82_decontamination": q82_decontamination,
    "q83_hash_split": q83_hash_split,
    "q84_stratified_sample": q84_stratified_sample,
    "q85_lm_doc_score": q85_lm_doc_score,
    "q100_pii_redaction": q100_pii_redaction,
    "q101_sequence_packing": q101_sequence_packing,
    "q105_temperature_mixture": q105_temperature_mixture,
    "q110_profile_documents": q110_profile_documents,
}

ORACLE = {
    "q81_repetition_gate": _Q81_SQL,
    "q82_decontamination": _Q82_SQL,
    "q83_hash_split": _Q83_SQL,
    "q84_stratified_sample": _Q84_SQL,
    "q85_lm_doc_score": _Q85_SQL,
    "q100_pii_redaction": _q100_sql(),
    "q101_sequence_packing": _Q101_SQL,
    "q105_temperature_mixture": _Q105_SQL,
    "q110_profile_documents": _Q110_SQL,
}
