"""Class-killer for the DuckDB decimal/HUGEINT oracle bug family.

Three driver red cells across rounds 1-3 (`inline_merge_runs`,
`sessionize`, `bpe_merge_pairs`) shared one root cause: a DuckDB
aggregate (``sum`` over BIGINT/INTEGER) returns DECIMAL(38,0) /
HUGEINT, which the driver's typed Arrow value-hash distinguishes from
Spark's int64 even though the stringified values match. The local
checker (tools/oracle_check.py) stringifies and therefore cannot see
it.

This test closes the class: every ``oracle_sql()`` entry is executed
through DuckDB's Arrow surface at sf0.001 and its result schema must
contain no decimal128/decimal256 column. Any future uncast
``sum(...)`` fails here before it can reach a driver round.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pytest

import __spark_entry__ as e

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _decimal_fields(schema: pa.Schema) -> list[str]:
    bad = []
    for f in schema:
        t = f.type
        if pa.types.is_decimal(t):
            bad.append(f"{f.name}:{t}")
    return bad


@pytest.fixture(scope="module")
def oracle_schemas(con):
    """name -> arrow schema for every oracle (each executed once)."""
    out: dict[str, pa.Schema] = {}
    errors: dict[str, str] = {}
    for name, sql in e.oracle_sql().items():
        try:
            out[name] = con.execute(sql).arrow().schema
        except Exception as ex:  # noqa: BLE001
            errors[name] = repr(ex)[:200]
    assert not errors, f"oracle SQL failed to execute: {errors}"
    return out


def test_no_oracle_emits_decimal_types(oracle_schemas):
    assert oracle_schemas, "oracle_sql() returned nothing"
    offenders = {
        name: bad
        for name, schema in oracle_schemas.items()
        if (bad := _decimal_fields(schema))
    }
    assert not offenders, (
        "DuckDB oracles returning DECIMAL columns (will hash-mismatch "
        f"Spark's int64/double in the driver gate): {offenders} — add an "
        "explicit ::bigint / ::double cast to the aggregate."
    )


def test_every_query_has_matching_column_names(oracle_schemas):
    """The driver sorts columns by NAME before hashing — a name drift
    between the Spark query and its oracle is silent row-value garbage
    (identical values land under different sort positions). Compare
    the Spark plan's column names (analysis only, no action) against
    each oracle's Arrow schema names."""
    from docling_plus_spark.plans import build_session

    oracles = e.oracle_sql()
    qs = e.queries()
    missing = sorted(set(oracles) - set(qs))
    assert not missing, f"oracle_sql entries without queries(): {missing}"

    spark = build_session("local[2]", shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    drifts: dict[str, tuple] = {}
    for name, schema in oracle_schemas.items():
        spark_cols = sorted(qs[name](spark, SF_DIR).columns)
        oracle_cols = sorted(schema.names)
        if spark_cols != oracle_cols:
            drifts[name] = (spark_cols, oracle_cols)
    assert not drifts, f"Spark/oracle column-name drift: {drifts}"
