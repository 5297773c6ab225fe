"""Vector similarity operators over ARRAY<FLOAT> embedding columns.

Determinism design: every component is FLOOR-quantized to integer
micro-units (floor(x * 1e6) as BIGINT — floor is tie-free, unlike any
ROUND whose half-way rule differs between engines), dot products and
squared norms are exact BIGINT sums, and the final BIGINT→double cast is
exact (< 2^53). sqrt and division are IEEE-correctly-rounded everywhere,
so cosine scores are bit-equal across Spark and DuckDB without any
tolerance. See e02_spark/num.py for the general rules.

Spark side uses higher-order array functions (zip_with/aggregate) — JVM-side,
no UDF, no row explosion. The DuckDB oracle twins use a lateral
generate_series expansion (helpers below emit that SQL).

Scale path: brute-force top-k is a map-side score + global top-k (the
orderBy(k).limit collapses to TakeOrderedAndProject — no full sort). The
LSH/IVF variants bound candidate sets; see sign_lsh_bucket / ivf_topk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DIM = 64  # driver embeddings are 64-dim (TESTDATA.md / FIXTURES.md)


def _dot_dec(a: str, b: str) -> Column:
    """Exact quantized-integer dot product of two float-array columns
    (JVM-side).

    Components are FLOOR-quantized to integer micro-units (floor(x * 1e6))
    — floor is tie-free: both engines compute the identical IEEE double
    x*1e6 and floor it identically (a ROUND step would diverge on exact
    half-way values because the engines use different half rules). The dot
    product is then exact BIGINT arithmetic (|sum| <= dim * (2e6)^2 << 2^63)
    and the final BIGINT→double cast is exact (< 2^53)."""
    return F.expr(
        f"""aggregate(
              zip_with({a}, {b},
                (x, y) -> cast(floor(cast(x as double) * 1000000d) as bigint)
                        * cast(floor(cast(y as double) * 1000000d) as bigint)),
              cast(0 as bigint),
              (acc, v) -> acc + v)"""
    ).cast("double")


def cosine(a: str, b: str) -> Column:
    """Bit-deterministic cosine similarity between two array columns."""
    return _dot_dec(a, b) / (
        F.sqrt(_dot_dec(a, a)) * F.sqrt(_dot_dec(b, b))
    )


def quantize(vec: str) -> Column:
    """Floor-quantized integer view of a float array (see _dot_dec)."""
    return F.expr(
        f"transform({vec}, x -> cast(floor(cast(x as double) * 1000000d) as bigint))"
    )


def _dot_q(a: str, b: str) -> Column:
    """Dot product of two pre-quantized BIGINT arrays — exact, and ~3x
    cheaper per pair than _dot_dec because the cast/floor per element
    happened once per vector, not once per pair."""
    return F.expr(
        f"""aggregate(zip_with({a}, {b}, (x, y) -> x * y),
                      cast(0 as bigint), (acc, v) -> acc + v)"""
    ).cast("double")


def with_quantized(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach `q` (quantized vector) and `n2` (its squared norm) — computed
    ONCE per vector so pairwise ops only do one zip_with per pair. This is
    the map-side precompute that makes the pair joins scale: per-pair work
    drops from 3 dot products to 1."""
    return df.withColumn("q", quantize(vec_col)).withColumn(
        "n2", _dot_q("q", "q")
    )


def cosine_q(dot: Column, n2a: Column | str, n2b: Column | str) -> Column:
    n2a = F.col(n2a) if isinstance(n2a, str) else n2a
    n2b = F.col(n2b) if isinstance(n2b, str) else n2b
    return dot / (F.sqrt(n2a) * F.sqrt(n2b))


def duck_dot_sql(a: str, b: str, series_alias: str = "t") -> str:
    """DuckDB twin of _dot_dec: exact decimal dot product via a lateral
    generate_series — requires `{series_alias}(i)` joined as
    `CROSS JOIN generate_series(1, 64) AS {series_alias}(i)` and GROUP BY
    of the surrounding query."""
    i = f"{series_alias}.i"
    return (
        f"CAST(SUM(CAST(FLOOR(CAST({a}[{i}] AS DOUBLE) * 1000000) AS BIGINT)"
        f" * CAST(FLOOR(CAST({b}[{i}] AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)"
    )


def sign_lsh_bucket(vec: str, bits: int = 8) -> Column:
    """Random-hyperplane-style LSH bucket: the sign pattern of the first
    `bits` components (axis-aligned hyperplanes — deterministic, identical
    across engines). Vectors in the same bucket are near-dup candidates;
    at scale this turns an O(n^2) similarity join into per-bucket joins."""
    return sign_lsh_bucket_offset(vec, 0, bits)


def duck_sign_lsh_sql(vec: str, bits: int = 8) -> str:
    parts = [
        f"(CASE WHEN {vec}[{i + 1}] > 0.0 THEN {1 << i} ELSE 0 END)" for i in range(bits)
    ]
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def _rademacher_sign(seed: int, bit: int, comp: int) -> int:
    """Deterministic ±1 from the parity of md5's first hex nibble — the
    same value is computable in any engine, so seeded buckets stay
    oracle-twin-able."""
    import hashlib

    h = hashlib.md5(f"{seed}:{bit}:{comp}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 0 else -1


def sign_lsh_bucket_seeded(
    vec: str, bits: int = 8, seed: int = 0, dim: int = DIM
) -> Column:
    """RANDOM-hyperplane sign-LSH bucket: bit b is the sign of the dot
    product with a seeded Rademacher (±1) vector. This is the classic
    Charikar construction; unlike the axis-aligned variant
    (`sign_lsh_bucket`, kept for the oracle-pinned queries), it is robust
    to adversarially correlated embeddings — axis-aligned planes degenerate
    when mass concentrates on few coordinates, while a dense ±1 projection
    mixes every coordinate into every bit.

    Determinism: the hyperplanes are md5-parity functions of
    (seed, bit, component), precomputed driver-side into literal ±1
    vectors — both engines see identical planes, the projection is a
    fixed-order left-to-right sum of IEEE doubles (zip_with + aggregate
    evaluates in array order; DuckDB's twin must sum in the same index
    order), and the sign test is exact.
    """
    terms = []
    for b in range(bits):
        signs = F.array(
            *[
                F.lit(float(_rademacher_sign(seed, b, i)))
                for i in range(dim)
            ]
        )
        # components beyond `dim` (vector longer than the plane) and the
        # zip_with NULL padding (vector shorter) both contribute 0 — the
        # DuckDB twin applies the same COALESCE, so buckets stay bit-equal
        # whatever the actual array length
        proj = F.aggregate(
            F.zip_with(
                F.slice(F.col(vec), 1, dim),
                signs,
                lambda x, s: F.coalesce(x.cast("double"), F.lit(0.0))
                * F.coalesce(s, F.lit(0.0)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        terms.append(F.when(proj > 0.0, F.lit(1 << b)).otherwise(F.lit(0)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def duck_sign_lsh_seeded_sql(
    vec: str, bits: int = 8, seed: int = 0, dim: int = DIM
) -> str:
    """DuckDB twin of sign_lsh_bucket_seeded: the same ±1 literals, the
    same index-order summation (list_dot_product would not guarantee
    order; an explicit index-ordered SUM does)."""
    parts = []
    for b in range(bits):
        terms = " + ".join(
            f"(COALESCE(CAST({vec}[{i + 1}] AS DOUBLE), 0.0) * "
            f"{float(_rademacher_sign(seed, b, i))})"
            for i in range(dim)
        )
        parts.append(f"(CASE WHEN ({terms}) > 0.0 THEN {1 << b} ELSE 0 END)")
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def seeded_sign_bands_arrow(
    df: DataFrame,
    bits: int = 8,
    n_bands: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = DIM,
) -> DataFrame:
    """(id_col, band_idx, bucket) — the EXPLODED multi-band seeded
    sign-LSH table in one vectorized Arrow pass: the NumPy twin of
    `explode([struct(b, sign_lsh_bucket_seeded(vec, bits, seed=b)) for b
    in range(n_bands)])`.

    Why it exists: each seeded bucket is `bits` interpreted
    aggregate(zip_with(slice, <dim-element literal array>, ...)) lambdas —
    higher-order functions evaluate OUTSIDE whole-stage codegen, and the
    literal ±1 plane arrays bloat the expression tree (plan build time)
    on top of the per-row cost. Profiled at seconds per evaluation over
    2 000 x 64-dim vectors at sf0.1 while the same math in NumPy is
    milliseconds.

    Bit-determinism (same contract as the expression path): the
    projection accumulates coalesce(x_i, .)*s_i in component index order
    — the accumulation loop below adds one component's contribution at a
    time across all rows/planes, so each scalar projection is the same
    left-to-right float64 sum the aggregate() lambda produces; the sign
    test (proj > 0.0) and the power-of-two bucket sum are exact. Pinned
    bit-equal to sign_lsh_bucket_seeded by tests/test_similarity_arrow.py.

    Precondition (validated per batch, loud failure): every vector is
    non-null with exactly `dim` finite components. The expression path
    handles ragged/NULL vectors via slice+zip_with padding; this fast
    path refuses them BY NAME rather than silently diverging.
    """
    import numpy as np

    # Plane matrix S: (dim, n_bands*bits), column p = (band b, bit k)
    # with p = b*bits + k — the same md5-parity Rademacher signs the
    # expression path bakes into its literal arrays.
    S = np.empty((dim, n_bands * bits), dtype=np.float64)
    for b in range(n_bands):
        for k in range(bits):
            for i in range(dim):
                S[i, b * bits + k] = float(_rademacher_sign(b, k, i))
    weights = np.array([1 << k for k in range(bits)], dtype=np.int64)

    def _bands(batches):
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            vecs = batch.column(1)
            n = len(vecs)
            if n == 0:
                continue
            if vecs.null_count:
                raise ValueError(
                    "seeded_sign_bands_arrow: NULL embedding rows — use "
                    "the expression path (sign_lsh_bucket_seeded)"
                )
            flat = (
                vecs.combine_chunks()
                if isinstance(vecs, pa.ChunkedArray)
                else vecs
            )
            offsets = np.asarray(flat.offsets)
            if not ((offsets[1:] - offsets[:-1]) == dim).all():
                raise ValueError(
                    f"seeded_sign_bands_arrow: ragged vectors (expected "
                    f"fixed dim {dim}) — use the expression path"
                )
            comp = flat.values.to_numpy(zero_copy_only=False)
            comp = comp[offsets[0]: offsets[-1]]
            if flat.values.null_count:
                raise ValueError(
                    "seeded_sign_bands_arrow: NULL vector components — "
                    "use the expression path"
                )
            X = comp.astype(np.float64).reshape(n, dim)
            if not np.isfinite(X).all():
                raise ValueError(
                    "seeded_sign_bands_arrow: non-finite components — "
                    "use the expression path"
                )
            # Left-to-right accumulation in component order: after step i,
            # proj == x_0*s_0 + ... + x_i*s_i exactly as the expression
            # lambda folds it (one float64 add per component, same order).
            proj = np.zeros((n, n_bands * bits), dtype=np.float64)
            for i in range(dim):
                proj += X[:, i: i + 1] * S[i]
            bitson = (proj > 0.0).reshape(n, n_bands, bits)
            buckets = (bitson * weights).sum(axis=2)  # (n, n_bands) int64
            idv = ids.to_numpy(zero_copy_only=False)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(idv, n_bands), type=pa.int64()),
                    pa.array(
                        np.tile(
                            np.arange(n_bands, dtype=np.int32), n
                        ),
                        type=pa.int32(),
                    ),
                    pa.array(buckets.reshape(-1), type=pa.int64()),
                ],
                names=[id_col, "band_idx", "bucket"],
            )

    return df.select(id_col, vec_col).mapInArrow(
        _bands, schema=f"{id_col} bigint, band_idx int, bucket bigint"
    )


def cosine_pairs_arrow(
    pairs: DataFrame,
    a_col: str = "va",
    b_col: str = "vb",
) -> DataFrame:
    """(a_col, b_col, cosine) from a pair table carrying pre-quantized
    vectors — the vectorized Arrow twin of
    `select(a, b, cosine_q(_dot_q("qa", "qb"), "na2", "nb2"))`.

    Why it exists: `_dot_q` is an interpreted aggregate(zip_with(..))
    lambda evaluated once PER CANDIDATE PAIR — at sf0.1 the seeded
    embedding near-dup blocking admits ~250 k candidate pairs and the
    per-pair HOF dominates the query (~2-3 s). The same math in NumPy is
    an (n, dim) int64 elementwise-multiply + row sum.

    Bit-determinism: the dot product is EXACT int64 arithmetic (order
    cannot matter), cast to float64 exactly as the expression's
    cast("double"); cosine = dot / (sqrt(na2) * sqrt(nb2)) is the same
    three IEEE-754 operations (correctly-rounded sqrt, multiply, divide)
    the JVM performs. Zero-norm rows: the session runs Spark 4's
    default ANSI mode, where the expression path RAISES
    DIVIDE_BY_ZERO — the twin refuses a zero denominator by name
    (silently emitting IEEE NaN would be worse than either: Spark
    orders NaN GREATER than every number, so NaN rows would PASS >=
    threshold filters). Pinned by tests/test_similarity_arrow.py.

    Precondition (validated per batch, loud failure): non-null q arrays,
    equal fixed length per batch, non-null ids/norms. The expression
    path NULL-propagates ragged/NULL pairs; this fast path refuses them
    BY NAME rather than silently diverging.
    """
    import numpy as np

    def _cos(batches):
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            cols = {
                name: batch.column(i)
                for i, name in enumerate(batch.schema.names)
            }
            qa, qb = cols["qa"], cols["qb"]
            if qa.null_count or qb.null_count:
                raise ValueError(
                    "cosine_pairs_arrow: NULL quantized vectors — use "
                    "the expression path (_dot_q/cosine_q)"
                )
            mats = []
            dim = None
            for arr in (qa, qb):
                flat = (
                    arr.combine_chunks()
                    if isinstance(arr, pa.ChunkedArray)
                    else arr
                )
                offsets = np.asarray(flat.offsets)
                lens = offsets[1:] - offsets[:-1]
                if dim is None:
                    dim = int(lens[0]) if len(lens) else 0
                if not (lens == dim).all():
                    raise ValueError(
                        "cosine_pairs_arrow: ragged quantized vectors — "
                        "use the expression path"
                    )
                if flat.values.null_count:
                    raise ValueError(
                        "cosine_pairs_arrow: NULL vector components — "
                        "use the expression path"
                    )
                vals = flat.values.to_numpy(zero_copy_only=False)
                mats.append(
                    vals[offsets[0]: offsets[-1]]
                    .astype(np.int64)
                    .reshape(n, dim)
                )
            A, B = mats
            dot = (A * B).sum(axis=1).astype(np.float64)
            na2 = cols["na2"].to_numpy(zero_copy_only=False).astype(np.float64)
            nb2 = cols["nb2"].to_numpy(zero_copy_only=False).astype(np.float64)
            denom = np.sqrt(na2) * np.sqrt(nb2)
            if (denom == 0.0).any():
                # ANSI division (the session default) raises
                # DIVIDE_BY_ZERO in the expression path; refuse by name
                # rather than emit NaN (which Spark sorts ABOVE every
                # number, silently passing >= threshold filters).
                raise ArithmeticError(
                    "cosine_pairs_arrow: zero-norm vector — ANSI "
                    "division by zero; filter n2 > 0 or use the "
                    "expression path"
                )
            cos = dot / denom
            yield pa.RecordBatch.from_arrays(
                [
                    pa.Array.from_pandas(
                        cols[a_col].to_numpy(zero_copy_only=False)
                    ),
                    pa.Array.from_pandas(
                        cols[b_col].to_numpy(zero_copy_only=False)
                    ),
                    pa.array(cos, type=pa.float64()),
                ],
                names=[a_col, b_col, "cosine"],
            )

    return pairs.select(a_col, b_col, "qa", "qb", "na2", "nb2").mapInArrow(
        _cos, schema=f"{a_col} bigint, {b_col} bigint, cosine double"
    )


def sign_lsh_bucket_offset(vec: str, offset: int, bits: int) -> Column:
    """Sign bucket of components [offset, offset+bits) — one band of the
    multi-band sign-LSH (see ops.dedup.embedding_neardup_pairs)."""
    # F.get: 0-based, NULL past the end (no ANSI error on short vectors)
    terms = [
        F.when(
            F.get(F.col(vec), offset + i) > 0.0, F.lit(1 << i)
        ).otherwise(F.lit(0))
        for i in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def duck_sign_lsh_offset_sql(vec: str, offset: int, bits: int) -> str:
    """DuckDB twin of sign_lsh_bucket_offset."""
    parts = [
        f"(CASE WHEN {vec}[{offset + i + 1}] > 0.0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    ]
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def topk_bruteforce(
    embeddings: DataFrame, query_vec_id: int, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine against one stored vector. The broadcasted
    1-row query side keeps this a map-only scan + TakeOrdered."""
    qd = with_quantized(embeddings)
    q = qd.where(F.col("vec_id") == query_vec_id).select(
        F.col("q").alias("qq"), F.col("n2").alias("qn2")
    )
    scored = (
        # n2 > 0 drops zero-norm (all-zero) vectors whose NaN cosine would
        # otherwise sort ABOVE every real score under orderBy(desc)
        qd.where((F.col("vec_id") != query_vec_id) & (F.col("n2") > 0))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", cosine_q(_dot_q("q", "qq"), "n2", "qn2").alias("cosine")
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def knn_pairs_per_group(
    embeddings: DataFrame,
    group_col: str = "label",
    k: int = 3,
    block_bits: int = 0,
) -> DataFrame:
    """Top-k most-similar vector pairs within each group (k-NN join
    restricted to a partition key — the scalable 'blocked' form).

    With block_bits > 0, each group is further sub-blocked by a sign-LSH
    bucket over the first `block_bits` components, and pairs are generated
    only within (group, block): a skewed hot group of size m costs
    sum_b(m_b^2) ~ m^2 / 2^block_bits instead of m^2, so one hot label
    can't go quadratic at scale. Cross-block pairs are excluded by design;
    the oracle twin replicates the identical blocking."""
    qd = with_quantized(embeddings)
    join_keys = ["grp"]
    if block_bits > 0:
        qd = qd.withColumn("blk", sign_lsh_bucket("embedding", block_bits))
        join_keys.append("blk")
    a = qd.select(
        F.col(group_col).alias("grp"),
        *([F.col("blk")] if block_bits > 0 else []),
        F.col("vec_id").alias("va"),
        F.col("q").alias("qa"),
        F.col("n2").alias("na2"),
    )
    b = qd.select(
        F.col(group_col).alias("grp"),
        *([F.col("blk")] if block_bits > 0 else []),
        F.col("vec_id").alias("vb"),
        F.col("q").alias("qb"),
        F.col("n2").alias("nb2"),
    )
    pairs = a.join(b, join_keys).where(F.col("va") < F.col("vb"))
    scored = pairs.select(
        "grp", "va", "vb", cosine_q(_dot_q("qa", "qb"), "na2", "nb2").alias("cosine")
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("cosine").desc(), F.col("va").asc(), F.col("vb").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
        .select(F.col("grp").alias(group_col), "rk", "va", "vb", "cosine")
    )


def _assign_centroids(qd: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid argmax as max_by keyed on vec_id: partial-aggregates
    map-side (each task keeps one best-so-far row per vec_id) — no Window,
    no per-vector sort shuffle over the n_vectors x n_centroids product.
    Ties break to the lowest cid via the (c_cos, -cid) ordering struct,
    matching the oracle's ORDER BY cosine DESC, cid ASC exactly. Shared by
    ivf_topk and semantic_dedup so the subtle tie-break lives once."""
    return (
        qd.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            "q",
            "n2",
            "cid",
            cosine_q(_dot_q("q", "cq"), "n2", "cn2").alias("c_cos"),
        )
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct("cid", "q", "n2"),
                F.struct(F.col("c_cos").alias("c"), (-F.col("cid")).alias("nc")),
            ).alias("best")
        )
        .select(
            "vec_id",
            F.col("best.q").alias("q"),
            F.col("best.n2").alias("n2"),
            F.col("best.cid").alias("cid"),
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    n_centroids: int = 8,
    k: int = 5,
    train: str = "first_n",
) -> DataFrame:
    """IVF-style approximate top-k: deterministic 'trained' centroids
    (train='first_n': the first n_centroids stored vectors — the
    oracle-checked convention; train='kmeans': sampled spherical k-means,
    the production path — see train_centroids_kmeans), nearest-centroid
    assignment, probe only the query's cell. At scale: centroids
    broadcast, assignment is a map-side argmax, and the probe reads one
    partition of a centroid-partitioned table instead of the full
    corpus."""
    qd = with_quantized(embeddings)
    centroids = _centroids_for(qd, embeddings, n_centroids, train)
    assigned = _assign_centroids(qd, centroids)
    qrow = assigned.where(F.col("vec_id") == query_vec_id).select(
        F.col("cid").alias("qcid"), F.col("q").alias("qq"), F.col("n2").alias("qn2")
    )
    probe = (
        assigned.crossJoin(F.broadcast(qrow))
        .where(
            (F.col("cid") == F.col("qcid"))
            & (F.col("vec_id") != query_vec_id)
            & (F.col("n2") > 0)  # zero-norm guard, see topk_bruteforce
        )
        .select(
            "vec_id",
            F.col("cid").cast("bigint").alias("centroid_id"),
            cosine_q(_dot_q("q", "qq"), "n2", "qn2").alias("cosine"),
        )
    )
    return probe.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def train_centroids_kmeans(
    embeddings: DataFrame,
    n_centroids: int,
    sample_cap: int = 4096,
    iters: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic sampled spherical k-means centroid training — the
    production alternative to the first-n convention ivf_topk /
    semantic_dedup default to for the oracle path.

    RNG-free determinism: the training sample is the `sample_cap` lowest
    values of xxhash64(vec_id) (a fixed hash order, independent of
    partitioning and run count), initial centroids are the sample's
    n_centroids lowest vec_ids, and Lloyd runs a FIXED `iters`
    iterations of cosine-argmax assignment (ties to the lowest centroid,
    matching _assign_centroids) + mean update, with empty clusters
    keeping their previous centroid. Same inputs → same centroids, every
    run.

    The Lloyd loop runs driver-side in float64 over the SAMPLE ONLY —
    bounded at sample_cap × dim doubles (4096 × 64 ≈ 2 MB), never the
    corpus; this is the faiss/production shape (train on an in-memory
    sample, assign the full corpus distributed). The corpus-sized
    assignment stays the broadcast map-side argmax in the callers.

    Returns (cid, cq, cn2) — the centroid shape _assign_centroids
    consumes, quantized through the same floor path as stored vectors.
    """
    import numpy as np

    sample = (
        embeddings.select("vec_id", vec_col)
        .orderBy(F.xxhash64(F.col("vec_id").cast("bigint")), F.col("vec_id"))
        .limit(sample_cap)
        .collect()
    )
    X = np.array([r[vec_col] for r in sample], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in sample])
    C = X[np.argsort(ids, kind="stable")[:n_centroids]].copy()
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    Xn = X / np.maximum(norms, 1e-12)
    for _ in range(iters):
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        # np.argmax returns the FIRST max — lowest cid on ties, the same
        # tie rule as _assign_centroids' (c_cos, -cid) struct ordering
        assign = np.argmax(Xn @ Cn.T, axis=1)
        for j in range(C.shape[0]):
            members = Xn[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    spark = embeddings.sparkSession
    cdf = spark.createDataFrame(
        [(int(j), [float(v) for v in C[j]]) for j in range(C.shape[0])],
        "cid BIGINT, cvec ARRAY<DOUBLE>",
    )
    return (
        cdf.select("cid", quantize("cvec").alias("cq"))
        .withColumn("cn2", _dot_q("cq", "cq"))
    )


def _centroids_for(
    qd: DataFrame, embeddings: DataFrame, n_centroids: int, train: str
) -> DataFrame:
    """Centroid source switch shared by ivf_topk / semantic_dedup:
    'first_n' (deterministic oracle convention — the first n stored
    vectors) or 'kmeans' (sampled spherical k-means, see
    train_centroids_kmeans)."""
    if train == "kmeans":
        return train_centroids_kmeans(embeddings, n_centroids)
    if train == "first_n":
        return qd.where(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cid"),
            F.col("q").alias("cq"),
            F.col("n2").alias("cn2"),
        )
    raise ValueError(f"train must be 'first_n' or 'kmeans', got {train!r}")


def pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    sample_cap: int = 2048,
    iters: int = 8,
    vec_col: str = "embedding",
    dim: int = DIM,
) -> list[list[list[int]]]:
    """Train product-quantization codebooks: split the vector into `m`
    contiguous subspaces of dim/m components and run a small k-means with
    `n_codes` centroids in EACH subspace independently (Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search" — the IVF-PQ
    building block every 100 TB ANN deployment uses: PQ codes compress a
    64-dim float vector to m bytes, so the candidate scan reads codes, not
    vectors).

    Determinism mirrors train_centroids_kmeans: the sample is the
    `sample_cap` lowest xxhash64(vec_id) vectors, per-subspace init is the
    sample's n_codes lowest vec_ids, Lloyd runs a FIXED `iters`
    iterations (L2 assignment, first-min tie-break, empty clusters keep
    their centroid), all in float64 over the in-memory sample only.

    Returns codebooks[j][c] = the c-th centroid of subspace j, QUANTIZED
    to the engine's integer micro-unit grid (floor(x*1e6) as int) — the
    same grid stored vectors quantize through, so encode/ADC distances
    are exact BIGINT arithmetic and bit-deterministic at any parallelism.
    """
    import numpy as np

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    sample = (
        embeddings.select("vec_id", vec_col)
        .orderBy(F.xxhash64(F.col("vec_id").cast("bigint")), F.col("vec_id"))
        .limit(sample_cap)
        .collect()
    )
    X = np.array([r[vec_col] for r in sample], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in sample])
    order = np.argsort(ids, kind="stable")
    books: list[list[list[int]]] = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[order[:n_codes]].copy()
        for _ in range(iters):
            # squared L2 to each code; np.argmin takes the FIRST min —
            # the same tie rule pq_encode's array_position uses
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(n_codes):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append(
            [[int(np.floor(v * 1e6)) for v in C[c]] for c in range(n_codes)]
        )
    return books


def pq_codebooks_first_n(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    dim: int = DIM,
) -> list[list[list[int]]]:
    """Oracle-convention PQ codebooks: codebook[j][c] is the quantized
    j-th subvector of stored vector vec_id=c (the first n_codes vectors) —
    the PQ twin of ivf_topk's 'first_n' centroid convention. No training
    loop, so the codebook is a pure SQL-expressible function of the data:
    a DuckDB oracle can derive the identical codebook from the same
    parquet and mirror encode/ADC/rerank exactly (queries/llm_q.py q112).
    k-means-trained books (pq_codebooks) remain the production default;
    encode/ADC/rerank are codebook-agnostic."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    rows = (
        embeddings.where(F.col("vec_id") < n_codes)
        .select("vec_id", quantize(vec_col).alias("qv"))
        .orderBy("vec_id")
        .collect()
    )
    got_ids = [r["vec_id"] for r in rows]
    if got_ids != list(range(n_codes)):
        # exact-identity check, not just a count: duplicate vec_ids under
        # n_codes would pass a len() check while leaving orderBy's choice
        # among duplicates nondeterministic — breaking the bit-determinism
        # contract the DuckDB twin relies on
        raise ValueError(
            f"first_n codebooks need vec_ids exactly 0..{n_codes - 1}; "
            f"got {got_ids}"
        )
    return [
        [list(r["qv"][j * dsub : (j + 1) * dsub]) for r in rows]
        for j in range(m)
    ]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[int]]],
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Attach `out_col`: ARRAY<INT> of length m — per subspace, the index
    of the nearest codebook entry by exact integer squared-L2 distance.

    Stays entirely JVM-side (transform/aggregate/array_position over
    literal codebook arrays — no UDF): encoding 100 TB of vectors is a
    map-only pass. Distances are exact BIGINTs on the shared micro-unit
    grid (|q| <= 2e6 ⇒ per-component square <= 1.6e13, × dsub << 2^63),
    and array_position returns the FIRST minimum — the same tie-break as
    the trainer's np.argmin, so codes are bit-stable across engines,
    partitionings, and re-runs."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    code_cols = []
    for j in range(m):
        book = F.array(
            *[
                F.array(*[F.lit(v) for v in code]).cast("array<bigint>")
                for code in codebooks[j]
            ]
        )
        sub = F.expr(
            f"transform(slice({vec_col}, {j * dsub + 1}, {dsub}), "
            "x -> cast(floor(cast(x as double) * 1000000d) as bigint))"
        )
        dists = F.transform(
            book,
            lambda code: F.aggregate(
                F.zip_with(
                    sub,
                    code,
                    lambda x, c: (
                        (F.coalesce(x, F.lit(0)) - F.coalesce(c, F.lit(0)))
                        * (F.coalesce(x, F.lit(0)) - F.coalesce(c, F.lit(0)))
                    ),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ),
        )
        code_cols.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return df.withColumn(out_col, F.array(*code_cols))


def pq_encode_quantized_arrow(
    df: DataFrame,
    codebooks: list[list[list[int]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_col, pq_codes, q, n2) in ONE vectorized Arrow pass — the
    NumPy twin of `with_quantized(pq_encode(df, codebooks))` projected to
    the columns the ANN rankers actually consume.

    Why it exists: the expression form's per-row work is m x n_codes
    zip_with/aggregate lambdas, and Spark evaluates higher-order-function
    lambdas INTERPRETED (outside whole-stage codegen) — profiled at
    ~0.6 s per evaluation over just 2 000 x 64-dim vectors at sf0.1,
    the dominant cost of the whole PQ query family. Handing whole Arrow
    batches to NumPy does the same integer math vectorized (guide-style
    mapInArrow: only the two needed columns cross the boundary, the
    codebook matrices are built once per task, each batch is a handful
    of BLAS-shaped int64 ops).

    Bit-determinism (same contract as the expression path):
      - q = floor(float64(x) * 1e6) as int64 — float32→float64 widening
        and the IEEE multiply/floor are identical operations in the JVM
        and NumPy, so the quantized grid is bit-equal;
      - all distances/norms are EXACT int64 arithmetic (|q| <= 2e6 keeps
        every sum far below 2^63), where summation order cannot matter;
      - np.argmin takes the FIRST minimum — the same tie-break as
        pq_encode's array_position(array_min).

    Precondition (validated per batch, loud failure): every vector is
    non-null, exactly m*dsub components, no null components, all finite.
    The general expression path handles ragged/NULL inputs; this fast
    path refuses them BY NAME rather than silently diverging from it.
    """
    import numpy as np

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    dim = m * dsub
    C = np.asarray(codebooks, dtype=np.int64)  # (m, n_codes, dsub)
    csq = (C * C).sum(axis=2)  # (m, n_codes) — constant term per code

    def _encode(batches):
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            vecs = batch.column(1)
            n = len(vecs)
            if n == 0:
                continue
            if vecs.null_count:
                raise ValueError(
                    "pq_encode_quantized_arrow: NULL embedding rows — "
                    "use the expression path (pq_encode) for nullable input"
                )
            flat = vecs.combine_chunks() if isinstance(vecs, pa.ChunkedArray) else vecs
            offsets = np.asarray(flat.offsets)
            if not ((offsets[1:] - offsets[:-1]) == dim).all():
                raise ValueError(
                    f"pq_encode_quantized_arrow: ragged vectors (expected "
                    f"fixed dim {dim}) — use the expression path"
                )
            comp = flat.values.to_numpy(zero_copy_only=False)
            comp = comp[offsets[0]: offsets[-1]]
            if flat.values.null_count:
                raise ValueError(
                    "pq_encode_quantized_arrow: NULL vector components — "
                    "use the expression path"
                )
            X = comp.astype(np.float64).reshape(n, dim)
            if not np.isfinite(X).all():
                raise ValueError(
                    "pq_encode_quantized_arrow: non-finite components — "
                    "use the expression path"
                )
            Q = np.floor(X * 1000000.0).astype(np.int64)
            n2 = (Q * Q).sum(axis=1)
            codes = np.empty((n, m), dtype=np.int32)
            for j in range(m):
                sub = Q[:, j * dsub: (j + 1) * dsub]
                # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2, exact int64
                d2 = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2 * (sub @ C[j].T)
                    + csq[j][None, :]
                )
                codes[:, j] = np.argmin(d2, axis=1)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.Array.from_pandas(ids.to_numpy(zero_copy_only=False)),
                    pa.array(list(codes), type=pa.list_(pa.int32())),
                    pa.array(list(Q), type=pa.list_(pa.int64())),
                    pa.array(n2, type=pa.int64()),
                ],
                names=[id_col, "pq_codes", "q", "n2"],
            )

    return df.select(id_col, vec_col).mapInArrow(
        _encode,
        schema=(
            f"{id_col} bigint, pq_codes array<int>, "
            "q array<bigint>, n2 bigint"
        ),
    )


def pq_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    m: int = 8,
    n_codes: int = 16,
    k: int = 10,
    rerank: int = 100,
    codebooks: list[list[list[int]]] | None = None,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k by cosine via PQ asymmetric distance computation
    (ADC) + exact rerank — the memory-bound scan shape of a production
    ANN: the corpus is scanned as m-byte codes, per-candidate cost is m
    table lookups (the per-query LUT of query-subvector-to-code distances,
    built once driver-side), the `rerank` best ADC candidates are then
    re-scored with the exact quantized cosine, and the top `k` of those
    returned. Recall trades against rerank width, the standard PQ
    contract; exact duplicates of the query always ADC to ~0 so
    plant-copy recall is 1.0.

    Fully deterministic: codebooks are deterministic (pq_codebooks), ADC
    distances are exact BIGINT sums of LUT entries, and both the ADC
    cut and the final order tie-break on vec_id.

    Returns (vec_id, adc_dist, cosine) — k rows, best cosine first."""
    import numpy as np

    if codebooks is None:
        codebooks = pq_codebooks(embeddings, m=m, n_codes=n_codes)
    dsub = len(codebooks[0][0])
    if encoded is None:
        # `encoded` lets callers share ONE materialized encode pass
        # across queries (q112/q113 run the same corpus+codebooks); it
        # must be with_quantized(pq_encode(embeddings, codebooks))
        encoded = with_quantized(pq_encode(embeddings, codebooks))
    qrows = (
        encoded.where(F.col("vec_id") == query_vec_id)
        .select("q", "n2")
        .collect()
    )
    if not qrows:
        raise ValueError(f"query vec_id {query_vec_id} not found")
    qrow = qrows[0]
    qvec = np.array(qrow["q"], dtype=np.int64)
    # per-query LUT: lut[j][c] = exact squared-L2 between the query's
    # j-th quantized subvector and codebook entry c — m * n_codes bigints
    luts = []
    for j in range(m):
        sub = qvec[j * dsub : (j + 1) * dsub]
        lut = [
            int(((sub - np.array(code, dtype=np.int64)) ** 2).sum())
            for code in codebooks[j]
        ]
        luts.append(F.array(*[F.lit(v) for v in lut]).cast("array<bigint>"))
    adc = None
    for j in range(m):
        term = F.element_at(luts[j], F.col("pq_codes").getItem(j) + 1)
        adc = term if adc is None else adc + term
    cands = (
        encoded.where((F.col("vec_id") != query_vec_id) & (F.col("n2") > 0))
        .select("vec_id", "q", "n2", adc.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
        .limit(rerank)
    )
    qq = F.array(*[F.lit(int(v)) for v in qvec]).cast("array<bigint>")
    qn2 = F.lit(int(qrow["n2"])).cast("bigint")
    rescored = (
        cands.withColumn("qq_lit", qq)
        .select(
            "vec_id",
            "adc_dist",
            cosine_q(_dot_q("q", "qq_lit"), "n2", qn2).alias("cosine"),
        )
    )
    return rescored.orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    ).limit(k)


def ivf_pq_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    n_centroids: int = 8,
    m: int = 8,
    n_codes: int = 16,
    k: int = 10,
    rerank: int = 100,
    train: str = "first_n",
    codebooks: list[list[list[int]]] | None = None,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: the composition every production-scale ANN index runs
    (faiss IndexIVFPQ) — the coarse quantizer (IVF centroids) prunes the
    corpus to the query's cell, PQ asymmetric distances rank the cell's
    codes, and the best `rerank` candidates are re-scored with the exact
    quantized cosine. At 100 TB: centroids broadcast, the cell probe is
    a partition-pruned read of a centroid-partitioned code table (m bytes
    per vector scanned, not the raw vectors), per-candidate cost is m LUT
    lookups, and only `rerank` full vectors are ever touched per query.

    Both stages reuse their standalone parts (ivf_topk's assignment via
    _assign_centroids, pq_topk's codebooks/ADC), so the determinism
    contracts compose: same inputs → same cells, same codes, same order.

    Returns (vec_id, centroid_id, adc_dist, cosine) — k rows, best
    cosine first; recall trades against BOTH the single-probe cell and
    the rerank width (the standard IVF-PQ contract)."""
    import numpy as np

    if codebooks is None:
        codebooks = pq_codebooks(embeddings, m=m, n_codes=n_codes)
    dsub = len(codebooks[0][0])
    qd = (
        encoded  # shared materialized encode pass (see pq_topk)
        if encoded is not None
        else with_quantized(pq_encode(embeddings, codebooks))
    )
    centroids = _centroids_for(qd, embeddings, n_centroids, train)
    assigned = _assign_centroids(qd, centroids).select("vec_id", "cid")
    coded = qd.join(assigned, "vec_id")
    qrows = (
        coded.where(F.col("vec_id") == query_vec_id)
        .select("q", "n2", "cid")
        .collect()
    )
    if not qrows:
        raise ValueError(f"query vec_id {query_vec_id} not found")
    qrow = qrows[0]
    qvec = np.array(qrow["q"], dtype=np.int64)
    luts = []
    for j in range(m):
        sub = qvec[j * dsub : (j + 1) * dsub]
        lut = [
            int(((sub - np.array(code, dtype=np.int64)) ** 2).sum())
            for code in codebooks[j]
        ]
        luts.append(F.array(*[F.lit(v) for v in lut]).cast("array<bigint>"))
    adc = None
    for j in range(m):
        term = F.element_at(luts[j], F.col("pq_codes").getItem(j) + 1)
        adc = term if adc is None else adc + term
    cands = (
        coded.where(
            (F.col("cid") == qrow["cid"])
            & (F.col("vec_id") != query_vec_id)
            & (F.col("n2") > 0)
        )
        .select("vec_id", "cid", "q", "n2", adc.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
        .limit(rerank)
    )
    qq = F.array(*[F.lit(int(v)) for v in qvec]).cast("array<bigint>")
    qn2 = F.lit(int(qrow["n2"])).cast("bigint")
    return (
        cands.withColumn("qq_lit", qq)
        .select(
            "vec_id",
            F.col("cid").cast("bigint").alias("centroid_id"),
            "adc_dist",
            cosine_q(_dot_q("q", "qq_lit"), "n2", qn2).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def _sign_bucket_q(vec: str, offset: int, bits: int) -> Column:
    """Sign bucket of quantized components [offset, offset+bits) — one
    band of the multi-band sign-LSH, computed over the BIGINT quantized
    vector (sign of floor(x*1e6) — deterministic, engine-agnostic).

    Indexing uses F.get (0-based, NULL past the end — never an ANSI
    out-of-bounds error): a band that extends past the embedding
    dimension degrades to constant 0-bits instead of failing the job.
    Callers should still size bands*bits <= dim — fully-degenerate bands
    bucket everything together and lose their candidate-pruning power."""
    terms = [
        F.when(
            F.get(F.col(vec), offset + i) > 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
        for i in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def semantic_dedup(
    embeddings: DataFrame,
    n_centroids: int = 8,
    threshold: float = 0.8,
    lsh_cluster_threshold: int = 4096,
    lsh_bands: int = 4,
    lsh_band_bits: int = 8,
    train: str = "first_n",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    Data-efficient learning at web-scale through semantic deduplication"):
    cluster the embedding space, then mark near-duplicates WITHIN each
    cluster only — the clustering bounds the pairwise work, turning O(n²)
    global near-dup detection into sum-over-clusters O(|c|²).

    Deterministic variant for the oracle: 'trained' centroids are the first
    n_centroids stored vectors (the q42 IVF convention), assignment is the
    exact-cosine argmax with ties to the lowest centroid id, and the
    within-cluster keep rule is greedy-by-id — a vector is dropped iff ANY
    lower-id vector in its cluster is within `threshold` cosine; `dup_of`
    is the lowest such id (NULL for kept vectors). Greedy-by-id is the
    deterministic stand-in for the paper's keep-one-per-epsilon-ball (the
    kept set differs only in which member of a mutual-dup group survives).

    Returns (vec_id, cluster_id, dup_of, kept) — one row per input vector.

    Scale: centroids broadcast (assignment is map-side argmax, no shuffle
    beyond the groupBy); the pair join shuffles on cluster id and is
    bounded by the largest cluster. At 100 TB, size n_centroids ~ n/5000
    so clusters stay ~constant-size (the paper uses 50k clusters for
    LAION) — but real corpora skew, so clusters LARGER than
    `lsh_cluster_threshold` are handled by CHAINED sign-LSH banding
    instead of all-pairs: `lsh_bands` bands of `lsh_band_bits` sign bits
    each (bands over disjoint component ranges, OR-amplified), pairs
    generated only within (cluster, band, bucket) and then exact-verified
    against `threshold`. A hot cluster of size m costs
    ~bands * m²/2^band_bits candidate pairs instead of m²; exact
    duplicates always share every band (identical signs), so plant-copy
    recall is 1.0, while generic near-dup recall trades against the band
    shape — the standard LSH contract. Clusters at or below the threshold
    keep the exact all-pairs semantics (the oracle-checked path).

    train='kmeans' swaps the first-n centroids for sampled spherical
    k-means (train_centroids_kmeans) — better-balanced clusters on real
    corpora; the dedup verdicts stay exact either way (clustering only
    bounds which pairs are COMPARED; the keep rule is exact cosine)."""
    qd = with_quantized(embeddings)
    centroids = _centroids_for(qd, embeddings, n_centroids, train)
    assigned = _assign_centroids(qd, centroids)
    # cluster-size census: n_centroids rows — broadcast back onto vectors
    sizes = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("csize"))
    sized = assigned.join(F.broadcast(sizes), "cid")
    small = sized.where(F.col("csize") <= lsh_cluster_threshold)
    big = sized.where(F.col("csize") > lsh_cluster_threshold)

    def _sides(part: DataFrame, extra: list[str]):
        a = part.select(
            "cid", *extra, F.col("vec_id").alias("va"),
            F.col("q").alias("qa"), F.col("n2").alias("na2"),
        )
        b = part.select(
            "cid", *extra, F.col("vec_id").alias("vb"),
            F.col("q").alias("qb"), F.col("n2").alias("nb2"),
        )
        return a, b

    # exact all-pairs within at-threshold clusters (the oracle path)
    a, b = _sides(small, [])
    small_pairs = a.join(b, "cid").where(F.col("va") < F.col("vb"))

    # chained sign-LSH banding within oversized clusters: candidates only
    # within (cid, band, bucket); dupes across bands collapsed BEFORE the
    # exact cosine verify (qa/qb are functionally determined by va/vb, so
    # keep-any is value-deterministic)
    if lsh_bands > 0:
        banded = None
        for k in range(lsh_bands):
            bk = big.select(
                "cid",
                F.lit(k).alias("band"),
                _sign_bucket_q("q", k * lsh_band_bits, lsh_band_bits).alias("bkt"),
                "vec_id", "q", "n2",
            )
            banded = bk if banded is None else banded.unionByName(bk)
        a, b = _sides(banded, ["band", "bkt"])
        big_pairs = (
            a.join(b, ["cid", "band", "bkt"])
            .where(F.col("va") < F.col("vb"))
            .dropDuplicates(["va", "vb"])
        )
    else:
        # lsh_bands <= 0 = banding disabled: oversized clusters fall back
        # to exact all-pairs (the caller accepts the quadratic cost)
        a, b = _sides(big, [])
        big_pairs = a.join(b, "cid").where(F.col("va") < F.col("vb"))

    dups = (
        small_pairs.select("va", "vb", "qa", "qb", "na2", "nb2")
        .unionByName(big_pairs.select("va", "vb", "qa", "qb", "na2", "nb2"))
        # zero-norm guard: a degenerate all-zero embedding yields 0/0=NaN
        # cosine, and NaN >= threshold is TRUE in Spark — without the
        # guard every zero-norm pair would be marked duplicate
        .where(
            (F.col("na2") > 0)
            & (F.col("nb2") > 0)
            & (cosine_q(_dot_q("qa", "qb"), "na2", "nb2") >= threshold)
        )
        .groupBy(F.col("vb").alias("vec_id"))
        .agg(F.min("va").alias("dup_of"))
    )
    return assigned.join(dups, "vec_id", "left").select(
        "vec_id",
        F.col("cid").cast("bigint").alias("cluster_id"),
        F.col("dup_of").cast("bigint").alias("dup_of"),
        F.col("dup_of").isNull().alias("kept"),
    )
