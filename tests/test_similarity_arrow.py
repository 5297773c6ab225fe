"""The Arrow/NumPy PQ-encode fast path must be BIT-identical to the
higher-order-function expression path it replaces in the q112/q113
family (round-14 optimization: HOF lambdas evaluate interpreted and
dominated the PQ queries' cost; the vectorized twin does the same exact
int64 math in NumPy).

Equality is checked on the driver fixture AND on adversarial synthetic
vectors (negatives, exact halfway grid values, zeros, subnormal-ish
floats) — any drift in quantization, distance, or the first-minimum
tie-break shows up as a row mismatch. The fast path's preconditions
(non-null, fixed-dim, finite) must refuse BY NAME, never fall through
to different results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e02_spark.ops.similarity import (
    pq_encode,
    pq_encode_quantized_arrow,
    with_quantized,
)

SF_SMALL = "/root/testdata/sf0.001"


def _books(m: int, n_codes: int, dsub: int, seed: int = 7):
    import random

    rng = random.Random(seed)
    return [
        [
            [rng.randint(-2_000_000, 2_000_000) for _ in range(dsub)]
            for _ in range(n_codes)
        ]
        for _ in range(m)
    ]


def _compare(df, books):
    expr = (
        with_quantized(pq_encode(df, books))
        .select("vec_id", "pq_codes", "q", "n2")
        .orderBy("vec_id")
        .collect()
    )
    arrow = pq_encode_quantized_arrow(df, books).orderBy("vec_id").collect()
    assert [r.asDict() for r in expr] == [r.asDict() for r in arrow]
    return len(expr)


def test_arrow_encode_matches_expression_on_fixture(spark):
    from e02_spark.queries.llm_q import _pq_books, _t

    e = _t(spark, SF_SMALL, "embeddings")
    books = _pq_books(e, SF_SMALL)
    n = _compare(e, books)
    assert n == e.count() > 0


def test_arrow_encode_matches_expression_adversarial(spark):
    # 8-dim vectors, m=2 subspaces of 4: negatives, exact grid halfway
    # points (x*1e6 integral — floor ties), zeros, tiny magnitudes, and
    # ties between codebook entries (duplicate codes -> first-min rule)
    rows = [
        (0, [0.0, -0.0, 1e-07, -1e-07, 0.5, -0.5, 1.9999999, -1.9999999]),
        (1, [1.0, -1.0, 0.000001, -0.000001, 0.25, -0.25, 1.5, -1.5]),
        (2, [0.1] * 8),
        (3, [-0.1] * 8),
        (4, [1.25, -1.25, 0.75, -0.75, 0.3333333, -0.3333333, 2.0, -2.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    books = _books(m=2, n_codes=4, dsub=4)
    # duplicate code 0 as code 1 in subspace 0: argmin tie — both paths
    # must pick the FIRST minimum
    books[0][1] = list(books[0][0])
    assert _compare(df, books) == 5


def test_arrow_encode_refuses_ragged_and_null(spark):
    books = _books(m=2, n_codes=2, dsub=4)
    ragged = spark.createDataFrame(
        [(0, [0.1] * 8), (1, [0.2] * 5)],
        "vec_id bigint, embedding array<float>",
    )
    with pytest.raises(Exception, match="ragged|expression path"):
        pq_encode_quantized_arrow(ragged, books).collect()
    withnull = spark.createDataFrame(
        [(0, [0.1] * 8), (1, None)], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(Exception, match="NULL|expression path"):
        pq_encode_quantized_arrow(withnull, books).collect()


def test_arrow_encode_column_pruning(spark, tmp_path):
    """The fast path must ship ONLY (vec_id, embedding) into the Python
    worker: an extra wide column must not reach the parquet scan feeding
    the mapInArrow node (guide: opaque functions defeat pruning unless
    the caller selects first — the implementation selects internally).
    ReadSchema of the scan is the proof."""
    src = str(tmp_path / "emb")
    spark.createDataFrame(
        [(0, [0.1] * 8, "x" * 1000)],
        "vec_id bigint, embedding array<float>, payload string",
    ).write.parquet(src)
    books = _books(m=2, n_codes=2, dsub=4)
    plan = (
        pq_encode_quantized_arrow(spark.read.parquet(src), books)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines and all("payload" not in ln for ln in scan_lines)


# --------------------------------------------------------------------------
# seeded_sign_bands_arrow — the exploded multi-band seeded sign-LSH twin
# --------------------------------------------------------------------------
def _banded_expr(df, bits, n_bands):
    from e02_spark.ops.similarity import sign_lsh_bucket_seeded

    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                sign_lsh_bucket_seeded(
                    "embedding", bits=bits, seed=b
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    return (
        df.select("vec_id", F.explode(bands).alias("bd"))
        .select(
            "vec_id",
            F.col("bd.band_idx").cast("int").alias("band_idx"),
            "bd.bucket",
        )
    )


def _compare_bands(spark, df, bits, n_bands, dim):
    from e02_spark.ops.similarity import seeded_sign_bands_arrow

    expr = (
        _banded_expr(df, bits, n_bands)
        .orderBy("vec_id", "band_idx")
        .collect()
    )
    arrow = (
        seeded_sign_bands_arrow(df, bits=bits, n_bands=n_bands, dim=dim)
        .orderBy("vec_id", "band_idx")
        .collect()
    )
    assert [r.asDict() for r in expr] == [r.asDict() for r in arrow]
    return len(arrow)


def test_arrow_seeded_bands_match_expression_on_fixture(spark):
    from e02_spark.queries.llm_q import _t

    e = _t(spark, SF_SMALL, "embeddings")
    # q93's parameterization and a wider one
    n = e.count()
    assert _compare_bands(spark, e, bits=4, n_bands=2, dim=64) == 2 * n
    assert _compare_bands(spark, e, bits=8, n_bands=4, dim=64) == 4 * n


def test_arrow_seeded_bands_match_expression_adversarial(spark):
    # exact-zero projections (all-zero vector: proj == 0.0 -> bit OFF in
    # both paths), sign-boundary values, negatives, mixed magnitudes
    rows = [
        (0, [0.0] * 8),
        (1, [1.0, -1.0, 0.5, -0.5, 0.25, -0.25, 2.0, -2.0]),
        (2, [-0.1] * 8),
        (3, [1e-7, -1e-7, 0.0, -0.0, 1e7, -1e7, 0.3333333, -0.3333333]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    assert _compare_bands(spark, df, bits=5, n_bands=3, dim=8) == 12


def test_arrow_seeded_bands_refuse_ragged_and_null(spark):
    from e02_spark.ops.similarity import seeded_sign_bands_arrow

    ragged = spark.createDataFrame(
        [(0, [0.1] * 8), (1, [0.2] * 5)],
        "vec_id bigint, embedding array<float>",
    )
    with pytest.raises(Exception, match="ragged|expression path"):
        seeded_sign_bands_arrow(ragged, bits=2, n_bands=1, dim=8).collect()
    withnull = spark.createDataFrame(
        [(0, [0.1] * 8), (1, None)], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(Exception, match="NULL|expression path"):
        seeded_sign_bands_arrow(withnull, bits=2, n_bands=1, dim=8).collect()


# --------------------------------------------------------------------------
# cosine_pairs_arrow — the per-candidate-pair cosine verify twin
# --------------------------------------------------------------------------
def test_arrow_cosine_pairs_match_expression(spark):
    from e02_spark.ops.similarity import (
        _dot_q,
        cosine_pairs_arrow,
        cosine_q,
        with_quantized,
    )
    from e02_spark.queries.llm_q import _t

    e = _t(spark, SF_SMALL, "embeddings")
    qd = with_quantized(e)
    qa = qd.select(
        F.col("vec_id").alias("va"),
        F.col("q").alias("qa"),
        F.col("n2").alias("na2"),
    )
    qb = qd.select(
        F.col("vec_id").alias("vb"),
        F.col("q").alias("qb"),
        F.col("n2").alias("nb2"),
    )
    # every adjacent-id pair: deterministic, covers the fixture
    pairs = qa.join(qb, F.col("vb") == F.col("va") + 1)
    expr = (
        pairs.select(
            "va", "vb", cosine_q(_dot_q("qa", "qb"), "na2", "nb2").alias("cosine")
        )
        .orderBy("va")
        .collect()
    )
    arrow = cosine_pairs_arrow(pairs).orderBy("va").collect()
    assert [r.asDict() for r in expr] == [r.asDict() for r in arrow]
    assert len(arrow) > 0


def test_arrow_cosine_pairs_zero_norm_errors_like_ansi(spark):
    # The session runs Spark 4 default ANSI mode: the expression path
    # RAISES DIVIDE_BY_ZERO on a zero-norm pair. The twin must refuse by
    # name too — silently emitting IEEE NaN would be WORSE than either
    # (Spark sorts NaN above every number, so NaN rows would pass >=
    # threshold filters the expression path never emits).
    from e02_spark.ops.similarity import (
        _dot_q,
        cosine_pairs_arrow,
        cosine_q,
        with_quantized,
    )

    df = spark.createDataFrame(
        [(0, [0.0] * 4), (1, [1.0, 2.0, 3.0, 4.0]), (2, [1.0, 0.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    qd = with_quantized(df)
    qa = qd.select(
        F.col("vec_id").alias("va"), F.col("q").alias("qa"), F.col("n2").alias("na2")
    )
    qb = qd.select(
        F.col("vec_id").alias("vb"), F.col("q").alias("qb"), F.col("n2").alias("nb2")
    )
    pairs = qa.join(qb, F.col("va") < F.col("vb"))
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        pairs.select(
            "va", "vb", cosine_q(_dot_q("qa", "qb"), "na2", "nb2").alias("cosine")
        ).collect()
    with pytest.raises(Exception, match="zero-norm|DIVIDE_BY_ZERO"):
        cosine_pairs_arrow(pairs).collect()
    # dropping the zero-norm side restores agreement row-for-row
    ok = pairs.where((F.col("na2") > 0) & (F.col("nb2") > 0))
    expr = (
        ok.select(
            "va", "vb", cosine_q(_dot_q("qa", "qb"), "na2", "nb2").alias("cosine")
        )
        .orderBy("va", "vb")
        .collect()
    )
    arrow = cosine_pairs_arrow(ok).orderBy("va", "vb").collect()
    assert [r.asDict() for r in expr] == [r.asDict() for r in arrow]
    assert len(arrow) == 1


def test_arrow_cosine_pairs_refuse_null_vectors(spark):
    from e02_spark.ops.similarity import cosine_pairs_arrow

    pairs = spark.createDataFrame(
        [(0, 1, None, [1, 2], 5, 5)],
        "va bigint, vb bigint, qa array<bigint>, qb array<bigint>, "
        "na2 bigint, nb2 bigint",
    )
    with pytest.raises(Exception, match="NULL|expression path"):
        cosine_pairs_arrow(pairs).collect()
