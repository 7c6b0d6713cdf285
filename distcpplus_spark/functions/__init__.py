"""Reusable column-expression library (JVM-side, codegen-friendly).

All functions here return Column expressions built from
pyspark.sql.functions — no Python UDFs — so they stay inside
whole-stage codegen and vectorized execution.
"""
