"""experimentsplan_datapipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the data-processing capabilities of the
reference ML experiment pipeline (ankitbelbase17/ExperimentsPlan_DataPipeline)
as idiomatic Spark DataFrame / SQL / Structured Streaming operators, designed
for 100 TB scale: declarative logical plans (Catalyst optimizes), broadcast
joins for small dims, partition-pruned scans, Arrow-vectorized UDFs only where
built-ins cannot express the semantics.

Layout:
  session    — tuned SparkSession builder
  sources    — catalog scans, text/pairs/labels readers, JSON sinks
  functions  — scalar string/path/math/text/vector function library
  operators  — filters, joins, aggregates, windows, sampling, dedup, similarity
  plans      — end-to-end composed pipelines (dataset build / evaluation)
  streaming  — Structured Streaming: step windows, watermarks, stateful EMA
  media      — binary (image/audio) column plumbing, Arrow-batched UDFs
"""

from experimentsplan_datapipeline_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
