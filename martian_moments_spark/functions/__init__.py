"""Scalar-function layer (SURVEY.md §2.9): numeric-determinism helpers,
text/regex helpers, date/time helpers. All built on pyspark.sql.functions
(JVM-side, codegen) — no Python UDFs in this layer.
"""
