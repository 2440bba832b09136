"""Local replica of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() on DuckDB at sf0.01 (50 queries, every one
with an oracle), compare row count, column names, and order-insensitive
values. Usage: python tools/check_oracle.py [names...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if hasattr(v, "item"):
        return norm(v.item())
    if isinstance(v, bytes):
        return v.hex()
    return v


def rows_to_set(cols, rows):
    cols = list(cols)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), sorted(
        tuple(norm(r[i]) for i in order) for r in rows
    )


def _norm_spark_type(dt) -> str:
    """Spark DataType -> comparable normal form (mirrors _norm_arrow_type)."""
    from pyspark.sql import types as T

    simple = {
        T.LongType: "int64",
        T.IntegerType: "int32",
        T.ShortType: "int16",
        T.ByteType: "int8",
        T.DoubleType: "float64",
        T.FloatType: "float32",
        T.StringType: "string",
        T.BinaryType: "binary",
        T.BooleanType: "bool",
        T.DateType: "date",
        T.TimestampType: "timestamp",
    }
    for cls, name in simple.items():
        if isinstance(dt, cls):
            return name
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"list<{_norm_spark_type(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{_norm_spark_type(f.dataType)}" for f in dt.fields)
        return f"struct<{inner}>"
    return str(dt)


def _norm_arrow_type(t) -> str:
    """pyarrow DataType -> comparable normal form (mirrors _norm_spark_type)."""
    import pyarrow as pa

    if pa.types.is_int64(t):
        return "int64"
    if pa.types.is_int32(t):
        return "int32"
    if pa.types.is_int16(t):
        return "int16"
    if pa.types.is_int8(t):
        return "int8"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_norm_arrow_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{_norm_arrow_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


def type_mismatches(sdf_schema, arrow_schema) -> list[str]:
    """Column-by-column Spark-vs-DuckDB(Arrow) type diff, by column NAME.

    The driver's value hash proved type-sensitive in round 1:
    `fi_weighted_sources` matched values locally but hash-failed because
    DuckDB `sum(BIGINT)` yields HUGEINT (arrow decimal128) where Spark emits
    BIGINT. Value rounding can't see that class of mismatch — the Arrow
    schemas can."""
    stypes = {f.name: _norm_spark_type(f.dataType) for f in sdf_schema.fields}
    dtypes = {f.name: _norm_arrow_type(f.type) for f in arrow_schema}
    out = []
    for name in sorted(set(stypes) & set(dtypes)):
        if stypes[name] != dtypes[name]:
            out.append(f"{name}: spark={stypes[name]} duckdb={dtypes[name]}")
    return out


def main():
    import __spark_entry__ as entrymod
    from datasketches_postgresql_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, passed, rows_only = [], 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            rows_only += 1
            print(f"rows-only  {name}: {len(srows)} rows")
            continue
        try:
            atbl = con.execute(oracles[name]).arrow()
            dcols = atbl.column_names
            dpy = atbl.to_pydict()
            drows = list(zip(*(dpy[c] for c in dcols))) if dcols else []
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            continue
        tmis = type_mismatches(sdf.schema, atbl.schema)
        if tmis:
            failures.append((name, f"TYPE mismatch: {tmis}"))
            print(f"FAIL  {name}: arrow-level type mismatch (driver hash is type-sensitive)")
            for m in tmis:
                print(f"   {m}")
            continue
        sc, sv = rows_to_set(scols, [[r[c] for c in scols] for r in srows])
        dc, dv = rows_to_set(dcols, drows)
        if sc != dc:
            failures.append((name, f"cols {sc} vs {dc}"))
            print(f"FAIL  {name}: columns {sc} vs {dc}")
        elif len(sv) != len(dv):
            failures.append((name, f"rows {len(sv)} vs {len(dv)}"))
            print(f"FAIL  {name}: rowcount {len(sv)} vs {len(dv)}")
            print("   spark-only:", [r for r in sv if r not in set(dv)][:3])
            print("   duck-only :", [r for r in dv if r not in set(sv)][:3])
        elif sv != dv:
            diff_s = [r for r in sv if r not in set(dv)][:3]
            diff_d = [r for r in dv if r not in set(sv)][:3]
            failures.append((name, f"values differ: {diff_s} vs {diff_d}"))
            print(f"FAIL  {name}: values differ\n   spark: {diff_s}\n   duck : {diff_d}")
        else:
            passed += 1
            print(f"ok    {name}: {len(sv)} rows")
    print(f"\n{passed} matched, {rows_only} rows-only, {len(failures)} failed")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
