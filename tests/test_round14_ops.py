"""Round-14 milestone tests: IVM hardening from the round-8 advice —
NULL-safe support maintenance in maintain_distinct and per-branch op
guards across all three envelope maintainers (operators/cdc.py).
"""

import pytest
from pyspark.sql import functions as F


DCHG_SCHEMA = (
    "key bigint, op string, before_group string, before_value bigint, "
    "after_group string, after_value bigint"
)


def _support(spark, rows):
    base = spark.createDataFrame(rows, "key bigint, grp string, value bigint")
    return base.groupBy("grp", "value").agg(
        F.count("*").cast("bigint").alias("n_support")
    )


def test_maintain_distinct_null_value_retraction(spark):
    """(group, NULL) synopsis rows are legitimate (NULL-valued base
    rows); retracting one must decrement the existing support row, not
    fire the negative-support assert through a null-unsafe join miss."""
    from local_data_pipeline_spark.operators.cdc import (
        distinct_counts,
        maintain_distinct,
    )

    rows = [(1, "a", None), (2, "a", None), (3, "a", 7)]
    s0 = _support(spark, rows)
    b1 = spark.createDataFrame([(1, "D", "a", None, None, None)], DCHG_SCHEMA)
    s1 = maintain_distinct(s0, b1, "grp", "value")
    syn = {(r.grp, r.value): r.n_support for r in s1.collect()}
    assert syn == {("a", None): 1, ("a", 7): 1}
    got = {
        r.grp: (r.n_distinct, r.n_rows)
        for r in distinct_counts(s1, "grp", value_col="value").collect()
    }
    # COUNT(DISTINCT value) ignores NULL; n_rows counts it
    assert got == {"a": (1, 2)}

    # retract the last NULL row: the pair drops out entirely
    b2 = spark.createDataFrame([(2, "D", "a", None, None, None)], DCHG_SCHEMA)
    s2 = maintain_distinct(s1, b2, "grp", "value")
    assert {(r.grp, r.value): r.n_support for r in s2.collect()} == {
        ("a", 7): 1
    }


def test_maintain_distinct_null_value_insert_increments_not_duplicates(spark):
    """Inserting a NULL-valued row for a group that already has a
    (group, NULL) synopsis row must increment it — a null-unsafe merge
    would append a duplicate row and corrupt n_rows forever after."""
    from local_data_pipeline_spark.operators.cdc import maintain_distinct

    s0 = _support(spark, [(1, "a", None)])
    b = spark.createDataFrame([(2, "U", None, None, "a", None)], DCHG_SCHEMA)
    s1 = maintain_distinct(s0, b, "grp", "value")
    rows = s1.collect()
    assert len(rows) == 1
    assert rows[0].grp == "a" and rows[0].value is None
    assert rows[0].n_support == 2


@pytest.mark.parametrize(
    "chg_row",
    [
        # invalid op with a before image only: must fail in the minus
        # branch, not act as a silent delete
        (1, "X", "a", 7, None, None),
        # invalid op with an after image only: must fail in the plus
        # branch, not be silently dropped
        (1, "X", None, None, "a", 7),
        # NULL op with an after image: same — the envelope contract
        # requires op in OPS on every row
        (1, None, None, None, "a", 7),
    ],
)
def test_maintainers_reject_invalid_op_in_every_branch(spark, chg_row):
    from local_data_pipeline_spark.operators.cdc import (
        maintain_agg,
        maintain_distinct,
        maintain_minmax,
    )
    from local_data_pipeline_spark.functions.numeric import dsum_dec

    base = spark.createDataFrame(
        [(1, "a", 7), (2, "a", 8)], "key bigint, grp string, value bigint"
    )
    chg = spark.createDataFrame([chg_row], DCHG_SCHEMA)

    s0 = _support(spark, [(1, "a", 7), (2, "a", 8)])
    with pytest.raises(Exception, match="invalid changelog op"):
        maintain_distinct(s0, chg, "grp", "value").collect()

    old_agg = base.groupBy("grp").agg(
        F.count("*").alias("n_rows"), dsum_dec(F.col("value")).alias("total")
    )
    with pytest.raises(Exception, match="invalid changelog op"):
        maintain_agg(old_agg, chg, "grp").collect()

    old_mm = base.groupBy("grp").agg(
        F.min("value").alias("min_value"), F.max("value").alias("max_value")
    )
    with pytest.raises(Exception, match="invalid changelog op"):
        maintain_minmax(
            old_mm, base.select("grp", "value"), chg, "grp", "value"
        ).collect()


@pytest.mark.parametrize("op", ["X", None])
def test_maintainers_reject_invalid_op_on_imageless_rows(spark, op):
    """A changelog row with NEITHER image bypasses both the minus and
    plus branches, so without the dedicated guard an invalid/NULL op on
    it would silently vanish — upstream envelope corruption undetected."""
    from local_data_pipeline_spark.operators.cdc import (
        maintain_agg,
        maintain_distinct,
        maintain_minmax,
    )
    from local_data_pipeline_spark.functions.numeric import dsum_dec

    base = spark.createDataFrame(
        [(1, "a", 7), (2, "a", 8)], "key bigint, grp string, value bigint"
    )
    chg = spark.createDataFrame([(1, op, None, None, None, None)], DCHG_SCHEMA)

    s0 = _support(spark, [(1, "a", 7), (2, "a", 8)])
    with pytest.raises(Exception, match="invalid changelog op"):
        maintain_distinct(s0, chg, "grp", "value").collect()

    old_agg = base.groupBy("grp").agg(
        F.count("*").alias("n_rows"), dsum_dec(F.col("value")).alias("total")
    )
    with pytest.raises(Exception, match="invalid changelog op"):
        maintain_agg(old_agg, chg, "grp").collect()

    old_mm = base.groupBy("grp").agg(
        F.min("value").alias("min_value"), F.max("value").alias("max_value")
    )
    with pytest.raises(Exception, match="invalid changelog op"):
        maintain_minmax(
            old_mm, base.select("grp", "value"), chg, "grp", "value"
        ).collect()


@pytest.mark.parametrize("op", ["U", "D"])
def test_maintainers_tolerate_valid_op_imageless_rows(spark, op):
    """Imageless rows with a VALID op are legitimate no-ops —
    compact_envelope nets an insert-then-delete of one key to
    (before NULL, op D, after NULL) — and must contribute NOTHING
    (no junk NULL-group output rows, no assert)."""
    from local_data_pipeline_spark.operators.cdc import (
        maintain_agg,
        maintain_distinct,
        maintain_minmax,
    )
    from local_data_pipeline_spark.functions.numeric import dsum_dec

    base = spark.createDataFrame(
        [(1, "a", 7), (2, "a", 8)], "key bigint, grp string, value bigint"
    )
    chg = spark.createDataFrame([(1, op, None, None, None, None)], DCHG_SCHEMA)

    s0 = _support(spark, [(1, "a", 7), (2, "a", 8)])
    assert sorted(
        (r.grp, r.value, r.n_support)
        for r in maintain_distinct(s0, chg, "grp", "value").collect()
    ) == [("a", 7, 1), ("a", 8, 1)]

    old_agg = base.groupBy("grp").agg(
        F.count("*").alias("n_rows"), dsum_dec(F.col("value")).alias("total")
    )
    out = maintain_agg(old_agg, chg, "grp").collect()
    assert [(r.grp, r.n_rows) for r in out] == [("a", 2)]

    old_mm = base.groupBy("grp").agg(
        F.min("value").alias("min_value"), F.max("value").alias("max_value")
    )
    mm = maintain_minmax(
        old_mm, base.select("grp", "value"), chg, "grp", "value"
    ).collect()
    assert [(r.grp, r.min_value, r.max_value) for r in mm] == [("a", 7, 8)]


def test_cramer_solve_bit_identical_to_duckdb_leibniz():
    """The whole point of ml.cramer_solve: on the SAME matrix it must
    reproduce DuckDB's evaluation of the _det4_sql Leibniz expansion
    BIT-FOR-BIT (not just within tolerance) — that is what removes the
    LAPACK-version dependence from the ridge value hashes."""
    import duckdb
    import numpy as np
    from local_data_pipeline_spark.operators.ml import cramer_solve
    from local_data_pipeline_spark.queries import _det4_sql

    rng = np.random.default_rng(7)
    for trial in range(5):
        m = rng.uniform(-3, 3, size=(4, 4))
        xtx = m @ m.T + 4.0 * np.eye(4)  # SPD, well-conditioned
        xty = rng.uniform(-10, 10, size=4)
        a = [[float(xtx[i, j]) for j in range(4)] for i in range(4)]
        b = [float(v) for v in xty]

        def lit(x):
            # string literal, not numeric: a bare decimal literal would
            # pass through DuckDB's DECIMAL type and could truncate;
            # varchar->double parse is correctly rounded
            return f"cast('{x!r}' as double)"

        det_sql = _det4_sql(lambda i, j: lit(a[i][j]))
        sel = [f"({det_sql}) AS det"]
        for j in range(4):
            sel.append(
                "("
                + _det4_sql(
                    lambda i, c, jj=j: lit(b[i]) if c == jj else lit(a[i][c])
                )
                + f") AS det{j}"
            )
        row = duckdb.sql(
            "WITH d AS (SELECT " + ", ".join(sel) + ") "
            "SELECT det0/det, det1/det, det2/det, det3/det FROM d"
        ).fetchone()
        got = cramer_solve(np.array(a), np.array(b))
        for duck_v, ours in zip(row, got):
            assert duck_v == ours and (
                np.float64(duck_v).tobytes() == np.float64(ours).tobytes()
            ), f"trial {trial}: {duck_v!r} != {ours!r}"
        # and it stays a faithful solver: LU agrees to ~κ·ε
        ref = np.linalg.solve(np.array(a), np.array(b))
        assert np.allclose(got, ref, rtol=1e-9, atol=1e-9)


def test_cramer_solve_guards_factorial_blowup():
    import numpy as np
    from local_data_pipeline_spark.operators.ml import cramer_solve

    with pytest.raises(ValueError, match="factorial"):
        cramer_solve(np.eye(8), np.ones(8))
