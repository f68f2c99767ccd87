"""go_html_transform_spark — a PySpark-native token-sequence feature-engineering engine.

A from-scratch re-expression of darccio/go-html-transform's selector→transform
pipeline (reference: /root/reference, surveyed in SURVEY.md) as:

* vectorized per-document token-array transforms over rows of shape
  ``(doc_id:string, tokens:array<int32>, n_tok:int32, source:string, event_time:timestamp)``
* a selector-analogue rule language compiled to Catalyst Column expressions
  (reference: ``css/selector/parse.go``, ``css/selector/data.go``)
* a point-in-time feature layer: sort-merge as-of join, lag/lead, rolling
  aggregates, gap sessionization, forward-fill (north rule, BASELINE.json)
* scale hygiene: salting, AQE skew handling, per-partition lineage checkpoints

Everything is DataFrame-first: built-in ``pyspark.sql.functions`` in the hot
path, Arrow-backed pandas UDFs (``applyInPandas``/``mapInPandas``) only where
Spark lacks the operator (as-of merge, multimodal decode). No per-row Python.
"""

__version__ = "0.1.0"

from go_html_transform_spark.session import get_spark  # noqa: F401
