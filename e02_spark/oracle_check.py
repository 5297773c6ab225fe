"""Local replica of the driver's t2 correctness gate.

Runs a declared Spark query and its DuckDB oracle twin on the same parquet
tables, normalizes both results (sort columns by name, sort rows), and
compares exactly. Used by tests/ and by `python -m e02_spark.oracle_check`
for a full sweep before handing anything to the driver.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from .io import TABLES, table_path


@dataclass
class CompareResult:
    name: str
    ok: bool
    rows_spark: int
    rows_oracle: int | None
    issues: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        extra = f" ({'; '.join(self.issues)})" if self.issues else ""
        return f"[{status}] {self.name}: spark={self.rows_spark} oracle={self.rows_oracle}{extra}"


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None and not isinstance(v, float) else v)
    if len(df):
        # Stringified sort key: deterministic, total order even with
        # None/NaN mixed into object columns; applied identically to both
        # frames so row alignment is consistent.
        df = df.sort_values(
            by=list(df.columns), key=lambda s: s.astype(str)
        ).reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    a_nan = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NA or a is pd.NaT
    b_nan = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NA or b is pd.NaT
    if a_nan or b_nan:
        return a_nan and b_nan
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


def compare_query(spark, name: str, sf_dir: str, query_fn, sql: str | None) -> CompareResult:
    sdf = query_fn(spark, sf_dir).toPandas()
    if sql is None:
        # mirror the driver's weaker rows-only check: zero rows is a FAIL
        ok = len(sdf) > 0
        return CompareResult(
            name, ok=ok, rows_spark=len(sdf), rows_oracle=None,
            issues=[] if ok else ["rows-only query returned 0 rows"],
        )
    con = duck_connection(sf_dir)
    try:
        odf = con.execute(sql).fetchdf()
    finally:
        con.close()

    issues: list[str] = []
    if len(sdf) != len(odf):
        issues.append(f"row count {len(sdf)} != {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        issues.append(f"columns {sorted(sdf.columns)} != {sorted(odf.columns)}")
    else:
        # Driver compares schemas too — require matching pandas dtypes so
        # Spark INT vs DuckDB BIGINT (etc.) surfaces here, not at the gate.
        for c in sorted(sdf.columns):
            if str(sdf[c].dtype) != str(odf[c].dtype):
                issues.append(f"dtype {c}: spark={sdf[c].dtype} oracle={odf[c].dtype}")
    if not issues:
        s = _normalize(sdf)
        o = _normalize(odf)
        n_bad = 0
        first_bad = None
        for c in s.columns:
            sv, ov = s[c].tolist(), o[c].tolist()
            for i, (x, y) in enumerate(zip(sv, ov)):
                if not _values_equal(x, y):
                    n_bad += 1
                    if first_bad is None:
                        first_bad = f"col {c} row {i}: spark={x!r} oracle={y!r}"
        if n_bad:
            issues.append(f"{n_bad} value mismatches; first: {first_bad}")
    return CompareResult(name, ok=not issues, rows_spark=len(sdf), rows_oracle=len(odf),
                         issues=issues)


def run_all(spark, sf_dir: str, only: list[str] | None = None) -> list[CompareResult]:
    from .queries import all_oracles, all_queries

    qs = all_queries()
    oracles = all_oracles()
    results = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            results.append(compare_query(spark, name, sf_dir, fn, oracles.get(name)))
        except Exception as exc:  # pragma: no cover - diagnostic path
            results.append(CompareResult(name, ok=False, rows_spark=-1, rows_oracle=None,
                                         issues=[f"exception: {type(exc).__name__}: {exc}"]))
    return results


def main() -> int:
    import os
    import sys

    from .session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    only = sys.argv[1:] or None
    spark = get_spark("oracle-check")
    results = run_all(spark, sf_dir, only)
    for r in results:
        print(r)
    n_fail = sum(1 for r in results if not r.ok)
    print(f"\n{len(results) - n_fail}/{len(results)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
