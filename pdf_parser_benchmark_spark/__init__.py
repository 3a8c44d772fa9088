"""pdf_parser_benchmark_spark — a from-scratch, PySpark-native main-content
extraction engine with the query/data-processing capabilities of the reference
``solution-tree/pdf-parser-benchmark`` (studied read-only at /root/reference).

Architecture is Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
with the two heavy extractors (HTML boilerplate/main-content, PDF layout parse)
implemented as Arrow-vectorized pandas UDFs. Nothing here is a port of the
reference's Python loop pipeline; the reference defines WHAT to compute
(operators, semantics, output schema), cited per-module as file:line into
/root/reference/.
"""

__version__ = "0.1.0"
