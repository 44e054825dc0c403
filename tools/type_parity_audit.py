"""Output-TYPE parity audit over every registered query/oracle pair.

Motivation (round 9 lesson): `similarity_lsh_index_update` matched the
local value checker — whose `norm_cell` stringifies every cell — yet
failed the driver's value hash, because DuckDB's `list_sum` over
BIGINT widens to HUGEINT while the Spark side emitted int32. Values
stringified identically; their TYPES did not. The fix was a BIGINT
cast on both engines, but the class of bug is general: any oracle
whose output column is HUGEINT (sum/list_sum over BIGINT), DECIMAL
(sum over DECIMAL, bare numeric literals), or a raw TIMESTAMP (naive
vs UTC) can hash-diverge from a value-identical Spark result.

This audit closes the class: for each pair it compares the Spark
DataFrame schema (plan-only, nothing executed) against the DuckDB
relation types (`con.sql(...).types` — the concrete logical types,
unlike the DB-API description) under a shared lattice:

  int     TINYINT..BIGINT           <-> tinyint..bigint
  float   FLOAT/DOUBLE              <-> float/double
  str     VARCHAR                   <-> string
  bool    BOOLEAN                   <-> boolean
  date    DATE                      <-> date

and flags, hard, anything outside it: HUGEINT anywhere, DECIMAL
anywhere (the determinism contract says decimals are accumulator
internals, never outputs), raw TIMESTAMP outputs (the contract says
certified timestamps are formatted to strings), nested outputs, and
column-set mismatches. Run after adding or editing any oracle:

    python tools/type_parity_audit.py            # all queries
    python tools/type_parity_audit.py name ...   # subset

Exits non-zero on any flag. Round-10 baseline: 0 flags over 125
queries (2026-08-14).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from coursera_etl_pipeline_spark.catalog import TABLES, table_path
from coursera_etl_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

_DUCK_OK = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
}
_SPARK_OK = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool", "date": "date",
}


def duck_class(t: str) -> str:
    """Lattice class, or a loud marker for hash-risky types."""
    t = str(t).upper()
    if t in _DUCK_OK:
        return _DUCK_OK[t]
    if t == "HUGEINT":
        return "HUGEINT(hash-risk: cast to BIGINT)"
    if t.startswith("DECIMAL"):
        return "DECIMAL(hash-risk: cast to DOUBLE/BIGINT)"
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP(contract: format to string)"
    return f"UNMAPPED({t})"


def spark_class(t: str) -> str:
    t = t.lower()
    if t in _SPARK_OK:
        return _SPARK_OK[t]
    if t.startswith("decimal"):
        return "DECIMAL(hash-risk: cast to DOUBLE/BIGINT)"
    if t.startswith("timestamp"):
        return "TIMESTAMP(contract: format to string)"
    return f"UNMAPPED({t})"


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("type_parity_audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(SF_DIR, t)
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    flags = 0
    checked = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        checked += 1
        try:
            stypes = dict(fn(spark, SF_DIR).dtypes)
            rel = con.sql(oracles[name])
            dtypes = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as ex:  # noqa: BLE001 — audit reports, never hides
            print(f"ERR   {name}: {type(ex).__name__}: {ex}")
            flags += 1
            continue
        if set(stypes) != set(dtypes):
            print(f"COLS  {name}: spark-only={sorted(set(stypes) - set(dtypes))}"
                  f" duck-only={sorted(set(dtypes) - set(stypes))}")
            flags += 1
            continue
        for c in stypes:
            sc, dc = spark_class(stypes[c]), duck_class(dtypes[c])
            if sc != dc or "(" in sc or "(" in dc:
                print(f"TYPE  {name}.{c}: spark {stypes[c]} -> {sc}"
                      f" vs duck {dtypes[c]} -> {dc}")
                flags += 1

    print(f"{flags} flag(s) over {checked} queries")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
