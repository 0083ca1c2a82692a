"""tweetdb_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the query and
data-processing capabilities of the reference pipeline
(starkshift/tweetdb: streaming JSON ingestion normalized into
relational tables + SQL analytics over them), extended with the
LLM-data-pipeline operator set (dedup, similarity search, multimodal
columns, text analysis) and designed for 100 TB scale.

Note on reference citations: the reference checkout at
/root/reference/ is empty (zero files, verified 2026-08-13), so no
file:line citations into it are possible.  Operator provenance is
documented per-operator against SURVEY.md §2's declared contract
instead.

Layout:
  session.py    SparkSession factory (all load-bearing configs)
  schemas.py    explicit StructTypes for every fixture table
  catalog.py    table loading + temp-view registration + ts shim
  registry.py   @query decorator -> QUERIES / ORACLES dicts
  operators/    relational operators (scans, joins, aggs, windows, ...)
  functions/    scalar function surface + UDF/UDTF surface
  llm/          dedup / similarity / text-analysis / multimodal ops
  streaming/    Structured Streaming operators (file source -> sinks)
"""

from tweetdb_spark.registry import (
    QUERIES,
    ORACLES,
    load_all_operators,
    ordered_queries,
)

__all__ = ["QUERIES", "ORACLES", "load_all_operators", "ordered_queries"]
