"""e02_spark — a PySpark-native analytics engine.

Re-expresses the query / data-processing capabilities of the reference repo
(rzv-data-engineering-series-s01/e02, a GitHub PR-review ETL pipeline over a
Kimball SQL mart) as idiomatic Spark DataFrame/SQL operators, plus the
LLM-data-pipeline operator set (dedup, similarity search, multimodal columns,
text analysis) designed for 100 TB scale.

Layout:
  session.py    SparkSession factory (AQE on, UTC, tuned shuffle partitions)
  io.py         driver-table loaders (/root/testdata/sf*/<table>.parquet)
  fixtures.py   reference-parity fixture data, single source of truth for
                both Spark DataFrames and DuckDB VALUES-clause oracles
  depgraph/     SQL dependency scanner / owner mapping / review gate
                (reference .github/scripts + pr-review-flow.yml semantics)
  kimball/      SQL-mart surface: SQL UDFs, views, versioned deploy
  ops/          scale-oriented operators: dedup, similarity, text, as-of,
                range join, multimodal
  queries/      declared queries (SURVEY.md §7.3) + DuckDB oracle twins
  streaming/    Structured Streaming surfaces over batch-tested logic
"""

__version__ = "0.1.0"
