"""Numpy kernels behind the named-op registry. Importing the submodules
registers every op (see spark_ij_spark.registry)."""
