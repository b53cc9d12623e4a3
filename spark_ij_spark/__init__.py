"""spark_ij_spark — a PySpark-native rebuild of the capabilities of
kmader/spark-ij (reference at /root/reference), extended with
large-scale data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis).

Design stance (see SURVEY.md §7):
- DataFrame/SQL only at the API surface; Catalyst does the relational work.
- Images are plain StructType columns (binary payload + dtype + shape +
  calibration meta + lineage log) — the wire format of the reference's
  UDTs (reference: PipUDT.scala:28-35) without private UDT APIs.
- All pixel kernels are Arrow pandas UDFs over numpy.
- Everything is designed for multi-executor scale: no driver-side
  collects in operators, broadcast hints for small dims, AQE on.
"""

from spark_ij_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]

__version__ = "0.1.0"
