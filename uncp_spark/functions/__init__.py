"""Scalar/vector function library (SURVEY.md §2.7) — JVM-expression
helpers plus the numpy kernels behind the pandas UDF operators."""
