"""Column-level function library. Everything here returns Spark Column
expressions built from pyspark.sql.functions (JVM-side, whole-stage
codegen) — pandas UDFs appear only where the semantics genuinely cannot be
expressed with built-ins (NFKD normalization, difflib ratio, feature-hash
embeddings).
"""
