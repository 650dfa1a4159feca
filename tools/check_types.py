"""Type-parity audit: for every oracle-backed query, compare the Spark
result schema against the DuckDB oracle's result types at sf0.001.

The driver's value-hash is representation-sensitive (round 2: DuckDB
HUGEINT from integer SUM hashed differently than Spark's bigint despite
equal values), so any type skew here is a latent correctness failure.
Mapping checked: Spark bigint<->DuckDB BIGINT, double<->DOUBLE, etc.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
from local_data_pipeline_spark.queries import QUERIES
from local_data_pipeline_spark.session import TABLES, get_spark

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

# spark simpleString -> acceptable duckdb type names.
# Integer WIDTH skews (int32 vs int64) are allowed: the driver's
# canonicalizer hash-passes them (dow_seasonality_events int-vs-BIGINT
# green in CORRECTNESS_r05; chi2_terms_by_source in r04). HUGEINT and
# DECIMAL against bigint/double are NOT allowed — that's the round-2
# value-hash failure class (int128/decimal take a different pandas
# dtype path); round 12 recast the last 7 such oracles.
OK = {
    "bigint": {"BIGINT", "INTEGER"},
    "int": {"INTEGER", "BIGINT"},
    "smallint": {"SMALLINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP WITH TIME ZONE", "TIMESTAMP"},
    "timestamp_ntz": {"TIMESTAMP"},
    "binary": {"BLOB"},
}

def main():
    spark = get_spark(app_name="check_types")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    n_bad = 0
    for name, spec in QUERIES.items():
        if not spec.oracle:
            continue
        try:
            sfields = {f.name: f.dataType.simpleString() for f in spec.fn(spark, SF).schema.fields}
            res = con.sql(spec.oracle)
            dtypes = dict(zip(res.columns, (str(t) for t in res.types)))
        except Exception as e:
            print(f"ERR   {name}: {str(e)[:160]}")
            n_bad += 1
            continue
        for col, st in sfields.items():
            dt = dtypes.get(col)
            if dt is None:
                print(f"MISS  {name}.{col}: not in oracle")
                n_bad += 1
                continue
            allowed = OK.get(st)
            if st.startswith("array") or st.startswith("struct") or st.startswith("map"):
                continue  # container types: values compared element-wise
            if allowed is None:
                print(f"????  {name}.{col}: spark={st} duck={dt}")
                continue
            if dt not in allowed:
                print(f"SKEW  {name}.{col}: spark={st} duck={dt}")
                n_bad += 1
    print(f"\n{n_bad} type skews")
    return 1 if n_bad else 0

if __name__ == "__main__":
    raise SystemExit(main())
