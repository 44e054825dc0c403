"""Scalar function pack (string/date/math/array/map/JSON) — SURVEY §2.2.

Populated incrementally; every function stays inside whole-stage
codegen (built-in pyspark.sql.functions, no Python UDFs).
"""

from __future__ import annotations
