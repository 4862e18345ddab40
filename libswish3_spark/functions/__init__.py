"""Column-level functions for large-scale training-data pipelines.

Everything here stays JVM-side (pyspark.sql.functions compositions —
whole-stage codegen) unless explicitly noted; Python appears only in
Arrow-batched mapInPandas for the opaque-binary media path.
"""
