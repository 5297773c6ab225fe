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
