"""Changelog application (CDC apply / MERGE): turn a snapshot plus a
batch of row changes into the next snapshot, entirely as DataFrame ops.

The reference's pipeline rebuilds tables wholesale; production pipelines
ingest Debezium/CDC-style changelogs. The scalable shape is: compact the
changelog to the LATEST change per key (one shuffle, `max_by`), then one
full-outer join against the snapshot applying upsert/delete semantics —
no driver-side row handling at any size. At 100 TB, bucket or
co-partition both sides on the key and the join is exchange-free on the
snapshot side; the changelog is usually orders of magnitude smaller and
AQE broadcast-joins it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Changelog op codes: ``U`` = upsert (update an existing key or insert a
#: new one), ``D`` = delete. The Debezium c/u ops both map to U; r
#: (snapshot read) rows should be filtered before apply.
OPS = ("U", "D")


def _op_checked(wrapped, op, allow_null: bool = False, what: str = "changelog"):
    """The assert-rides-a-projection op guard, shared by every
    changelog consumer: return ``wrapped`` gated on ``op`` being a
    member of :data:`OPS` (optionally NULL — the full-outer non-match
    case). ``assert_true`` returns NULL when the condition holds, so
    the ``when(...isNull(), wrapped)`` wrapper keeps the value while
    forcing the check to evaluate on every row that reaches the
    expression — a bare unused column would be pruned by Catalyst, and
    assert_true is not pushdown-able, so a filter built on the result
    cannot bypass it either."""
    cond = op.isin(*OPS)
    if allow_null:
        cond = op.isNull() | cond
    return F.when(
        F.assert_true(
            cond,
            F.concat(
                F.lit(f"invalid {what} op (expected one of {OPS}): "),
                # concat(NULL) would NULL the whole message and the
                # raised error would carry no diagnostic at all
                F.coalesce(op.cast("string"), F.lit("NULL")),
            ),
        ).isNull(),
        wrapped,
    )


def _imageless_guard(
    changes: DataFrame,
    before_group: str,
    after_group: str,
    op_col: str,
    out_cols: "list[tuple[str, object]]",
) -> DataFrame:
    """Zero-contribution union branch that op-validates every changelog
    row carrying NEITHER image. The minus branch only sees rows with a
    before image and the plus branch rows with an after image, so a row
    with neither would otherwise bypass the op check entirely and an
    invalid/NULL-op row would silently vanish. Imageless rows with a
    VALID op are legitimate, though: :func:`compact_envelope` nets an
    insert-then-delete of the same key to (before NULL, op D, after
    NULL) — a correct no-op. So this branch rides :func:`_op_checked`
    on its first projection (raising on ops outside :data:`OPS`) and
    then filters itself empty on the guarded NULL group — a filter on
    the checked column cannot bypass the assert (assert_true is not
    pushdown-able), so validation still runs per row."""
    imaged = F.col(before_group).isNotNull() | F.col(after_group).isNotNull()
    guarded_first = _op_checked(out_cols[0][1], F.col(op_col)).alias(
        out_cols[0][0]
    )
    rest = [c.alias(n) for n, c in out_cols[1:]]
    return (
        changes.filter(~imaged)
        .select(guarded_first, *rest)
        .filter(F.col(out_cols[0][0]).isNotNull())
    )


def compact_changelog(
    changes: DataFrame, key: str, seq_col: str, op_col: str = "op"
) -> DataFrame:
    """Latest change per key: ``max_by(col, seq)`` for every payload
    column in one map-side-combinable aggregate. ``seq_col`` must be
    unique per key (a change LSN / offset); ties would make the result
    nondeterministic, so upstream must guarantee uniqueness.

    The output is the right input for :func:`apply_changes` (which only
    needs each key's final state) but is **NOT a valid input for**
    :func:`maintain_agg`: taking every column from the LATEST change
    keeps the latest BEFORE image too, whereas IVM must retract the
    batch's FIRST before image (the one consistent with the maintained
    aggregate). Compact envelope changelogs with
    :func:`compact_envelope` instead."""
    if op_col not in changes.columns:
        raise ValueError(
            f"changelog is missing op column {op_col!r} — apply_changes "
            "needs it to survive compaction"
        )
    payload = [c for c in changes.columns if c != key]
    return changes.groupBy(key).agg(
        *[F.max_by(c, F.col(seq_col)).alias(c) for c in payload]
    )


def compact_envelope(
    changes: DataFrame,
    key: str,
    seq_col: str,
    op_col: str = "op",
    before_cols: "list[str] | None" = None,
    after_cols: "list[str] | None" = None,
) -> DataFrame:
    """First-before / last-after compaction of a BEFORE/AFTER-envelope
    changelog — the compaction whose output is a valid
    :func:`maintain_agg` input when a key changes more than once in a
    batch.

    Per key, the net effect of a change chain ``c1..cn`` is "retract
    c1's BEFORE image, assert cn's AFTER image": intermediate states
    cancel telescopically. So ``before_*`` columns take ``min_by(seq)``
    (the FIRST change's before image) while ``after_*`` columns and the
    op take ``max_by(seq)`` (the LAST change's outcome). Compacting with
    :func:`compact_changelog` instead (max_by on everything) would pair
    the last change's before image with the first change's retraction
    slot and silently corrupt the maintained aggregate.

    ``before_cols`` / ``after_cols`` default to every column whose name
    starts with ``before_`` / ``after_``. Any remaining payload column
    follows the after side (last wins). One map-side-combinable
    aggregate, same single shuffle as :func:`compact_changelog`."""
    if op_col not in changes.columns:
        raise ValueError(
            f"changelog is missing op column {op_col!r} — maintain_agg "
            "needs it to survive compaction"
        )
    if before_cols is None:
        before_cols = [c for c in changes.columns if c.startswith("before_")]
    if after_cols is None:
        after_cols = [c for c in changes.columns if c.startswith("after_")]
    if not before_cols or not after_cols:
        raise ValueError(
            "envelope changelog needs before_*/after_* columns (or "
            "explicit before_cols/after_cols)"
        )
    rest = [
        c
        for c in changes.columns
        if c != key and c not in before_cols and c not in after_cols
    ]
    seq = F.col(seq_col)
    return changes.groupBy(key).agg(
        *[F.min_by(c, seq).alias(c) for c in before_cols],
        *[F.max_by(c, seq).alias(c) for c in after_cols],
        *[F.max_by(c, seq).alias(c) for c in rest],
    )


def apply_changes(
    target: DataFrame, changes: DataFrame, key: str, op_col: str = "op"
) -> DataFrame:
    """Apply a compacted changelog (at most one row per key — run
    :func:`compact_changelog` first) to a snapshot:

    - op ``U`` and the key exists  -> row replaced by the change payload
    - op ``U`` and the key is new  -> row inserted
    - op ``D``                     -> row removed
    - key untouched by the batch   -> row kept as-is

    ``changes`` must carry the target's payload columns (same names)
    plus ``op_col``. One full-outer shuffle join on the key; the output
    schema is exactly the target's. Op values outside :data:`OPS` (e.g.
    an unfiltered Debezium ``r`` snapshot row) raise at execution via an
    in-plan ``assert_true`` — silently treating them as non-deletes
    would insert all-NULL payload rows for new keys."""
    payload = [c for c in target.columns if c != key]
    missing = [c for c in payload if c not in changes.columns]
    if missing:
        raise ValueError(f"changes missing target columns: {missing}")
    t, c = target.alias("__t"), changes.alias("__c")
    op_raw = F.col(f"__c.{op_col}")
    # op is NULL for target rows untouched by the batch — the full-outer
    # non-match, not an invalid op
    op = _op_checked(op_raw, op_raw, allow_null=True)
    joined = t.join(
        c, F.col(f"__t.{key}") == F.col(f"__c.{key}"), "full_outer"
    )
    out = [F.coalesce(F.col(f"__t.{key}"), F.col(f"__c.{key}")).alias(key)]
    for col in payload:
        out.append(
            F.when(op == "U", F.col(f"__c.{col}"))
            .otherwise(F.col(f"__t.{col}"))
            .alias(col)
        )
    return joined.filter(op.isNull() | (op != "D")).select(*out)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: "list[str]",
) -> DataFrame:
    """Row-level diff between two snapshots of the same keyed table —
    the primitive under table-version audits and CDC backfill
    validation: one full-outer shuffle join on the key, then per-row
    classification into ``A`` (added: key only in ``new``), ``D``
    (deleted: key only in ``old``) or ``C`` (changed: present in both
    with at least one ``compare_cols`` value differing null-safely).
    Unchanged rows are dropped IN-PLAN, so the output is delta-sized,
    not table-sized — at 100 TB the diff of two daily snapshots is the
    day's churn, and the join shuffles each side once on the key (AQE
    handles skewed hot keys).

    Output: ``key``, ``change_type``, ``changed_cols`` (comma-joined
    lexicographic subset of ``compare_cols``; empty for A/D rows), and
    ``old_<c>`` / ``new_<c>`` for every compared column."""
    cols = list(compare_cols)
    o = old.select(
        key,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in cols],
    )
    n = new.select(
        key,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in cols],
    )
    j = o.join(n, key, "full_outer")
    both = F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull()
    diffs = [
        F.when(
            ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")), F.lit(c)
        )
        for c in sorted(cols)
    ]
    change_type = (
        F.when(F.col("__in_old").isNull(), "A")
        .when(F.col("__in_new").isNull(), "D")
        .when(F.concat_ws(",", *diffs) != "", "C")
    )
    return (
        j.withColumn("change_type", change_type)
        .withColumn(
            "changed_cols",
            F.when(both, F.concat_ws(",", *diffs)).otherwise(F.lit("")),
        )
        .filter(F.col("change_type").isNotNull())
        .select(
            key,
            "change_type",
            "changed_cols",
            *[c for pair in ((f"old_{c}", f"new_{c}") for c in cols) for c in pair],
        )
    )


def maintain_join(
    old_view: DataFrame,
    fact: DataFrame,
    dim_changes: DataFrame,
    key: str,
    op_col: str = "op",
) -> DataFrame:
    """Incremental maintenance of a materialized ``fact ⋈ dim`` view
    under a DIMENSION changelog — the join-side sibling of
    :func:`maintain_agg` (the classic warehouse case: a customer/part
    attribute changes and the wide denormalized view must refresh
    WITHOUT recomputing the join):

    - every changed key's old view rows are retracted (anti-join
      against the changelog's key set),
    - op ``U`` keys re-derive their view rows by joining the fact to
      the change's NEW dim payload (a brand-new dim key picks up any
      pre-existing fact rows — inner-join view semantics),
    - op ``D`` keys simply stay retracted.

    ``dim_changes`` must be compacted to one row per key (latest
    payload — :func:`compact_changelog` IS the right compaction here,
    unlike for maintain_agg: a join view needs only the final dim
    image, not a before/after envelope) and carry every dim column the
    view projects; per-key uniqueness is ENFORCED in-plan (an
    uncompacted batch fails the job — it would otherwise silently
    duplicate every re-derived row). Output columns = ``old_view``'s
    exactly.

    Scale: both joins put the CHANGELOG on the broadcast side — the
    retraction is a map-side anti-join of the view against |Δ| keys,
    and the re-derivation is a map-side hash join of the fact against
    |Δ| dim rows; neither shuffles the big side. The fact pass is one
    scan (vs the full recompute's shuffle join); bucket the fact by
    ``key`` and partition pruning confines even that scan to the
    affected buckets."""
    if op_col not in dim_changes.columns:
        raise ValueError(
            f"dim changelog is missing op column {op_col!r}"
        )
    bad = [c for c in dim_changes.columns if c not in
           set(old_view.columns) | {op_col}]
    if bad:
        raise ValueError(
            f"dim changelog carries columns absent from the view: {bad} "
            "— the re-derived rows could not match the view schema"
        )
    # Validate ops IN-PLAN on the key projection (which sees EVERY
    # changelog row): an op outside OPS would otherwise act as a silent
    # delete — its key is retracted by the anti-join but only op U rows
    # re-derive.
    checked_key = _op_checked(F.col(key), F.col(op_col), what="dim changelog")
    # Enforce the compacted-changelog precondition IN-PLAN too: a
    # changelog with duplicate keys would silently DUPLICATE re-derived
    # view rows (each duplicate dim image joins every matching fact
    # row), unlike the loud op check above. The guard aggregates the
    # (tiny, broadcast-bound) key projection and asserts per-key
    # cardinality 1 before the anti-join consumes it — an uncompacted
    # batch fails the job instead of corrupting the view.
    checked_unique = F.when(
        F.assert_true(
            F.col("__chg_n") == 1,
            F.concat(
                F.lit(
                    "dim changelog is not compacted (run compact_changelog "
                    "first): duplicate rows for key "
                ),
                F.col(key).cast("string"),
            ),
        ).isNull(),
        F.col(key),
    )
    keys = (
        dim_changes.select(checked_key.alias(key))
        .groupBy(key)
        .agg(F.count("*").alias("__chg_n"))
        .select(checked_unique.alias(key))
    )
    kept = old_view.join(F.broadcast(keys), key, "left_anti")
    upserts = dim_changes.filter(F.col(op_col) == "U").drop(op_col)
    rederived = fact.join(F.broadcast(upserts), key).select(
        *old_view.columns
    )
    return kept.unionByName(rederived)


def maintain_agg(
    old_agg: DataFrame,
    changes: DataFrame,
    group_col: str,
    n_col: str = "n_rows",
    sum_col: str = "total",
    op_col: str = "op",
    before_group: str = "before_group",
    before_value: str = "before_value",
    after_group: str = "after_group",
    after_value: str = "after_value",
) -> DataFrame:
    """Incremental view maintenance (IVM) of a keyed COUNT + SUM
    aggregate from a changelog carrying BEFORE/AFTER images (Debezium's
    ``before``/``after`` envelope) — the 100 TB pattern for keeping a
    materialized rollup fresh without ever rescanning the base table:

    - every before image contributes ``(-1, -value)`` to its OLD group,
    - every upsert's after image contributes ``(+1, +value)`` to its
      NEW group (which may differ — group-moving updates split into a
      retraction and an insertion, the standard delta rule),
    - the group-level delta (changelog-sized, map-side combinable)
      full-outer merges with the old aggregate; groups whose count
      reaches zero drop out, brand-new groups appear.

    ``old_agg`` must carry ``group_col``, ``n_col`` (bigint) and
    ``sum_col`` as an EXACT DECIMAL (build it with
    ``functions.numeric.dsum_dec``): decimal addition is exact and
    associative, so old + delta equals a full recompute bit-for-bit —
    a double-typed running sum would drift by an ulp per batch and
    eventually fail reconciliation. Preconditions: ``changes`` is
    compacted to one row per key with the FIRST before image and the
    LAST after image — that is :func:`compact_envelope`, NOT
    :func:`compact_changelog` (whose all-max_by compaction keeps the
    latest before image and silently corrupts the retraction when a
    key changes twice in one batch) — and before images are faithful
    (NULL ``before_group`` = the key did not exist; NULL
    ``after_group`` / op D = the key ceases to exist).

    Scale: the delta aggregate touches only the changelog; the merge
    join is |groups|-sized on both sides (broadcast the delta when the
    group domain is large but the batch is small). The base table is
    never read."""
    from ..functions.numeric import DEFAULT_PRECISION, DEFAULT_SCALE

    dec = f"decimal({DEFAULT_PRECISION},{DEFAULT_SCALE})"
    # same per-branch op guard as maintain_distinct/maintain_minmax: an
    # op outside OPS would otherwise retract without re-asserting (a
    # silent delete) — fail it in-plan on whichever branch it reaches
    minus = changes.filter(F.col(before_group).isNotNull()).select(
        _op_checked(F.col(before_group), F.col(op_col)).alias(group_col),
        F.lit(-1).cast("bigint").alias("__dn"),
        (-F.col(before_value)).cast(dec).alias("__ds"),
    )
    plus = changes.filter(
        F.col(after_group).isNotNull()
        & ~F.col(op_col).eqNullSafe(F.lit("D"))
    ).select(
        _op_checked(F.col(after_group), F.col(op_col)).alias(group_col),
        F.lit(1).cast("bigint").alias("__dn"),
        F.col(after_value).cast(dec).alias("__ds"),
    )
    imageless = _imageless_guard(
        changes,
        before_group,
        after_group,
        op_col,
        [
            (group_col, F.col(after_group)),
            ("__dn", F.lit(0).cast("bigint")),
            ("__ds", F.lit(0).cast(dec)),
        ],
    )
    delta = (
        minus.unionByName(plus)
        .unionByName(imageless)
        .groupBy(group_col)
        .agg(F.sum("__dn").alias("__dn"), F.sum("__ds").alias("__ds"))
    )
    merged = old_agg.join(delta, group_col, "full_outer")
    # widen before adding: old_agg's sum is already a widened decimal
    # (Spark grows SUM's precision by 10); narrowing back to the value
    # scale could overflow, while decimal(38,6) + decimal(38,6) stays
    # exact for any realistic aggregate magnitude
    wide = f"decimal(38,{DEFAULT_SCALE})"
    zero = F.lit(0).cast(wide)
    return (
        merged.select(
            group_col,
            (
                F.coalesce(F.col(n_col), F.lit(0))
                + F.coalesce(F.col("__dn"), F.lit(0))
            ).alias(n_col),
            (
                F.coalesce(F.col(sum_col).cast(wide), zero)
                + F.coalesce(F.col("__ds").cast(wide), zero)
            ).alias(sum_col),
        )
        .filter(F.col(n_col) > 0)
    )


def maintain_minmax(
    old_agg: DataFrame,
    new_base: DataFrame,
    changes: DataFrame,
    group_col: str,
    value_col: str,
    min_col: str = "min_value",
    max_col: str = "max_value",
    op_col: str = "op",
    before_group: str = "before_group",
    before_value: str = "before_value",
    after_group: str = "after_group",
    after_value: str = "after_value",
) -> DataFrame:
    """Incremental view maintenance of a keyed MIN/MAX aggregate from a
    BEFORE/AFTER-envelope changelog — the non-self-maintainable sibling
    of :func:`maintain_agg` (COUNT/SUM deltas compose algebraically;
    MIN/MAX under retraction does not: deleting the current extreme
    requires looking at the surviving rows). The classic dirty-group
    recompute rule keeps the base-table work delta-bounded:

    - **inserts are monotone**: an after image can only LOWER a group's
      min or RAISE its max, so insert-only groups merge in-plan with
      ``least``/``greatest`` — no base access;
    - **a retraction endangers an extreme only if its before image
      EQUALS the group's current min or max** (a middle value can never
      be the extreme); exactly those groups are marked dirty and
      recomputed from ``new_base`` restricted to the dirty keys — a
      broadcast semi-join, so the scan confines to the affected groups
      (with the base bucketed/partitioned by ``group_col``, to the
      affected buckets). Duplicated extremes recompute conservatively
      to the same answer. A group whose rows are ALL deleted is
      necessarily dirty (its min-holder was deleted), so group
      disappearance falls out of the recompute returning no row —
      no count column needed;
    - untouched groups pass through.

    ``new_base`` is the base table AFTER the batch applied (the output
    of :func:`apply_changes`, or the equivalent relation), projected to
    ``(group_col, value_col)``. ``changes`` must satisfy the same
    :func:`compact_envelope` precondition as :func:`maintain_agg`
    (first before image / last after image, one row per key); ops
    outside :data:`OPS` fail in-plan via the assert-rides-a-projection
    pattern. ``old_agg`` carries ``group_col``, ``min_col``, ``max_col``.

    Scale: the dirty-key set and insert delta are changelog-sized and
    broadcast; the only base-table access is the dirty-group recompute
    (one aggregate over a semi-joined scan); the clean merge is
    |groups|-sized. Reference scope: the reference rebuilds tables
    wholesale every run (dbt full refresh, SURVEY §2.D); this is the
    §2.E-era warehouse pattern that replaces it at 100 TB.
    """
    # in-plan op validation: an op outside OPS would otherwise behave
    # as a silent delete (retracted by the dirty path, never re-asserted
    # by the insert path)
    if op_col not in changes.columns:
        raise ValueError(f"changelog is missing op column {op_col!r}")

    # Op validation rides each branch's OWN projection (the grouping /
    # dirty key), not a column only the other branch filters on — see
    # maintain_distinct for the rationale. The insert filter admits any
    # non-D op null-safely so invalid/NULL ops with an after image hit
    # the guard rather than vanishing.
    ins_src = changes.filter(
        F.col(after_group).isNotNull()
        & ~F.col(op_col).eqNullSafe(F.lit("D"))
    ).select(
        _op_checked(F.col(after_group), F.col(op_col)).alias(group_col),
        F.col(after_value).alias("__av"),
    )
    imageless = _imageless_guard(
        changes,
        before_group,
        after_group,
        op_col,
        [(group_col, F.col(after_group)), ("__av", F.col(after_value))],
    )
    inserts = (
        ins_src.unionByName(imageless)
        .groupBy(group_col)
        .agg(
            F.min("__av").alias("__imn"),
            F.max("__av").alias("__imx"),
        )
    )
    dirty = (
        changes.filter(F.col(before_group).isNotNull())
        .select(
            _op_checked(F.col(before_group), F.col(op_col)).alias(
                group_col
            ),
            F.col(before_value).alias("__bv"),
        )
        .join(old_agg.select(group_col, min_col, max_col), group_col)
        .filter(
            (F.col("__bv") == F.col(min_col))
            | (F.col("__bv") == F.col(max_col))
        )
        .select(group_col)
        .distinct()
    )
    clean_old = old_agg.join(F.broadcast(dirty), group_col, "left_anti")
    clean_ins = inserts.join(F.broadcast(dirty), group_col, "left_anti")
    merged = clean_old.join(clean_ins, group_col, "full_outer").select(
        group_col,
        F.least(
            F.coalesce(F.col(min_col), F.col("__imn")),
            F.coalesce(F.col("__imn"), F.col(min_col)),
        ).alias(min_col),
        F.greatest(
            F.coalesce(F.col(max_col), F.col("__imx")),
            F.coalesce(F.col("__imx"), F.col(max_col)),
        ).alias(max_col),
    )
    recomputed = (
        new_base.join(F.broadcast(dirty), group_col)
        .groupBy(group_col)
        .agg(
            F.min(value_col).alias(min_col),
            F.max(value_col).alias(max_col),
        )
    )
    return merged.unionByName(recomputed)


def maintain_distinct(
    old_support: DataFrame,
    changes: DataFrame,
    group_col: str,
    value_col: str,
    n_col: str = "n_support",
    op_col: str = "op",
    before_group: str = "before_group",
    before_value: str = "before_value",
    after_group: str = "after_group",
    after_value: str = "after_value",
) -> DataFrame:
    """Incremental maintenance of an EXACT per-group COUNT(DISTINCT
    value) under a BEFORE/AFTER-envelope changelog — the third member
    of the IVM family (COUNT/SUM: :func:`maintain_agg`; MIN/MAX:
    :func:`maintain_minmax`). Distinct counts are not self-maintainable
    from the counts alone: deleting one of a user's three events must
    NOT drop the user, deleting their last one must. The classic fix is
    a SUPPORT MULTISET synopsis — one row per live (group, value) pair
    with its base-row multiplicity — maintained by the delta rule:

    - every before image contributes −1 to its (group, value) support,
    - every upsert's after image contributes +1 to its new pair
      (a group- or value-moving update splits into both, and an update
      that touches neither nets to zero),
    - pairs whose support reaches 0 drop out of the synopsis; a pair
      driven NEGATIVE means the changelog retracted something the base
      never held, and fails loudly in-plan (assert_true) rather than
      silently corrupting every later batch.

    ``COUNT(DISTINCT value)`` per group is then a row count over the
    synopsis, and the plain row count is ``sum(n_support)`` — both fall
    out of one aggregate (:func:`distinct_counts`).

    Returns the NEW support relation (same schema as ``old_support``:
    group, value, n_col) — the state to persist for the next batch.

    Preconditions: same :func:`compact_envelope` contract as the other
    maintainers (one row per changed base-row key, first-before /
    last-after); ``old_support`` faithful (build the first one with
    ``base.groupBy(group, value).count()``).

    Scale: the delta aggregate is changelog-sized and map-side
    combinable; the merge is one join of the synopsis against the
    (usually tiny, broadcastable) delta. The synopsis itself is
    |live (group, value) pairs| — the unavoidable price of EXACT
    distinct-under-retraction (sketches that support deletion keep a
    comparable synopsis; plain HLL cannot retract at all). At 100 TB,
    bucket the synopsis by group so the merge is exchange-free on the
    big side; the base table is never rescanned.

    Reference scope: the reference recomputes every rollup wholesale
    per run (dbt, SURVEY §2.D); this is the §2.E-era replacement.
    """
    if op_col not in changes.columns:
        raise ValueError(f"changelog is missing op column {op_col!r}")
    # Each branch rides the op guard on a column it actually PROJECTS
    # (the branch's own group key) — relying on a filter in one branch
    # to validate rows consumed by the other leaves the check at the
    # mercy of Catalyst's conjunct ordering. The plus filter admits any
    # non-D op (null-safely), so an invalid or NULL op with an after
    # image reaches the guarded projection and fails loudly instead of
    # being silently dropped.
    minus = changes.filter(F.col(before_group).isNotNull()).select(
        _op_checked(F.col(before_group), F.col(op_col)).alias(group_col),
        F.col(before_value).alias(value_col),
        F.lit(-1).cast("bigint").alias("__dn"),
    )
    plus = changes.filter(
        F.col(after_group).isNotNull()
        & ~F.col(op_col).eqNullSafe(F.lit("D"))
    ).select(
        _op_checked(F.col(after_group), F.col(op_col)).alias(group_col),
        F.col(after_value).alias(value_col),
        F.lit(1).cast("bigint").alias("__dn"),
    )
    imageless = _imageless_guard(
        changes,
        before_group,
        after_group,
        op_col,
        [
            (group_col, F.col(after_group)),
            (value_col, F.col(after_value)),
            ("__dn", F.lit(0).cast("bigint")),
        ],
    )
    delta = (
        minus.unionByName(plus)
        .unionByName(imageless)
        .groupBy(group_col, value_col)
        .agg(F.sum("__dn").alias("__dn"))
        .select(
            F.col(group_col).alias("__dg"),
            F.col(value_col).alias("__dv"),
            F.col("__dn"),
        )
    )
    # NULL-safe merge: (group, NULL) synopsis rows are legitimate
    # (distinct_counts documents them), and a USING join would never
    # match them — a NULL retraction would then fire the negative-
    # support assert on a perfectly consistent changelog, and a NULL
    # insert would duplicate the pair instead of incrementing it.
    merged = old_support.join(
        delta,
        F.col(group_col).eqNullSafe(F.col("__dg"))
        & F.col(value_col).eqNullSafe(F.col("__dv")),
        "full_outer",
    ).select(
        F.coalesce(F.col(group_col), F.col("__dg")).alias(group_col),
        F.coalesce(F.col(value_col), F.col("__dv")).alias(value_col),
        F.col(n_col),
        F.col("__dn"),
    )
    n_new = F.coalesce(F.col(n_col), F.lit(0)) + F.coalesce(
        F.col("__dn"), F.lit(0)
    )
    checked_n = F.when(
        F.assert_true(
            n_new >= 0,
            F.concat(
                F.lit(
                    "inconsistent changelog: support driven negative for "
                    "(group, value) = ("
                ),
                # coalesce: a legitimate NULL key would otherwise NULL
                # the whole concat and the raised error would carry no
                # diagnostic (the _op_checked lesson)
                F.coalesce(F.col(group_col).cast("string"), F.lit("NULL")),
                F.lit(", "),
                F.coalesce(F.col(value_col).cast("string"), F.lit("NULL")),
                F.lit(")"),
            ),
        ).isNull(),
        n_new,
    )
    return (
        merged.select(group_col, value_col, checked_n.alias(n_col))
        .filter(F.col(n_col) > 0)
    )


def distinct_counts(
    support: DataFrame,
    group_col: str,
    n_col: str = "n_support",
    value_col: "str | None" = None,
) -> DataFrame:
    """Roll a support synopsis up to (group, n_distinct, n_rows):
    distinct = synopsis row count, rows = sum of multiplicities. One
    map-side-combinable aggregate over the synopsis — the base table
    is never touched.

    Pass ``value_col`` to get SQL COUNT(DISTINCT value) semantics
    exactly: a (group, NULL) synopsis row (NULL-valued base rows are
    legitimate) then counts toward ``n_rows`` but NOT ``n_distinct``,
    matching COUNT(DISTINCT)'s NULL-ignoring contract. Without it the
    synopsis row count treats NULL as one more distinct value."""
    n_distinct = (
        F.count(F.when(F.col(value_col).isNotNull(), 1))
        if value_col is not None
        else F.count("*")
    )
    return support.groupBy(group_col).agg(
        n_distinct.cast("bigint").alias("n_distinct"),
        F.sum(n_col).cast("bigint").alias("n_rows"),
    )


def maintain_minhash_index(
    index: DataFrame,
    changes: DataFrame,
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_k: int = 3,
    hash_family: str = "rk_pow5",
    id_col: str = "doc_id",
    max_broadcast_changes: int = 5_000_000,
    _touched: "tuple[DataFrame, int] | None" = None,
) -> DataFrame:
    """Incrementally maintain a persisted MinHash-LSH INDEX
    (the (doc, band, band_hash) relation from dedup.banded_signatures)
    under a document changelog — the IVM × dedup composition: at 100 TB
    the near-dup index lives as a cell/bucket-partitioned table and is
    NEVER rebuilt from the corpus; each batch signs only the changed
    documents.

    ``changes`` schema: (key, op, after_text) with the changelog OPS
    convention shared by every cdc consumer — ``U`` upserts (insert or
    text replacement: after_text is the new content, and it must be
    NON-NULL — a NULL-text upsert would silently retract the key's
    rows and emit nothing, turning an upsert into a delete, so it
    fails loudly instead), ``D`` deletes (after_text ignored). Delta
    cost: one anti-join of the index against the touched-key set plus
    shingle→signature→band work proportional to the CHANGED text
    volume only — the base corpus is never rescanned. The touched-key
    side is checkpointed (delta-sized) and broadcast only while its
    EXACT row count stays ≤ ``max_broadcast_changes`` (the ml.py
    ``max_broadcast_vocab`` gate pattern): a changelog batch is
    normally the small side of the anti-join, but nothing bounds it —
    a backfill-sized batch at the 100 TB framing must not be forced
    through the broadcast limit; above the gate AQE picks the join
    strategy. The default ``rk_pow5`` family keeps the whole
    maintained state engine-replayable, so the declared query's oracle
    can rebuild the post-state index from scratch and value-hash it —
    a lost retraction or stale signature anywhere fails the hash."""
    from .dedup import banded_signatures, minhash_signature

    op = F.col("op")
    if _touched is not None:
        # caller (maintain_dup_clusters) already checkpointed the
        # changelog and counted it — don't pay the delta pass twice
        touched_keys, n_changes = _touched
        touched = touched_keys.select(
            F.col(touched_keys.columns[0]).alias("__touched_key")
        )
    else:
        # ONE eager materialization of the delta-sized batch: the
        # touched projection, the gate count, and the fresh-doc signing
        # below all read this checkpoint — a changelog DERIVED from a
        # corpus scan (the fixture shape) would otherwise re-scan its
        # source once per consumer (the r11 bench caught exactly that:
        # an eager TOUCHED checkpoint + a separate fresh_docs lineage
        # doubled the query's wall)
        changes = changes.localCheckpoint(eager=False)
        # the gate count IS the materializing action (the unigram
        # vocab-gate pattern): one job pays the changelog derivation +
        # checkpoint write, every consumer below reads the blocks
        n_changes = changes.count()
        touched = changes.select(
            _op_checked(F.col("key"), op, what="document changelog").alias(
                "__touched_key"
            )
        )
    touched_side = (
        F.broadcast(touched)
        if n_changes <= max_broadcast_changes
        else touched
    )
    kept = index.join(
        touched_side,
        index[id_col] == F.col("__touched_key"),
        "left_anti",
    )
    fresh_docs = changes.filter(op == "U").select(
        F.col("key").alias(id_col),
        # assert rides the projection (the _op_checked pattern): every
        # 'U' row reaching the signature path must carry text
        F.when(
            F.assert_true(
                F.col("after_text").isNotNull(),
                F.concat(
                    F.lit(
                        "NULL after_text for op='U' in document "
                        "changelog at key: "
                    ),
                    F.coalesce(F.col("key").cast("string"), F.lit("NULL")),
                ),
            ).isNull(),
            F.col("after_text"),
        ).alias("text"),
    )
    fresh = banded_signatures(
        minhash_signature(
            fresh_docs, "text", id_col, n_hashes, shingle_k, hash_family
        ),
        id_col,
        n_bands,
        hash_family,
    )
    return kept.unionByName(fresh)


def maintain_dup_clusters(
    index_pre: DataFrame,
    clusters_pre: DataFrame,
    changes: DataFrame,
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_k: int = 3,
    hash_family: str = "rk_pow5",
    id_col: str = "doc_id",
    max_bucket_size: "int | None" = 50,
    max_iterations: int = 20,
    max_broadcast_changes: int = 5_000_000,
) -> DataFrame:
    """Incrementally maintain the near-dup CLUSTER labeling (the
    ``dedup_clusters`` connected components over guarded LSH candidate
    pairs) under a document changelog — the IVM × dedup × closure
    composition on top of :func:`maintain_minhash_index`: at 100 TB
    both the (doc, band, bucket) index AND the (doc, cluster) labeling
    live as persisted tables, and a changelog batch must not trigger a
    corpus-wide pair join + closure.

    Inputs: ``index_pre`` — the persisted banded index
    (doc, band, band_hash); ``clusters_pre`` — the persisted
    (doc_id, cluster_id) labeling that ``dedup_clusters`` produced over
    the SAME index parameters (family, bands, bucket cap);
    ``changes`` — (key, op, after_text) with the shared changelog
    convention.

    Delta algorithm (provably ≡ full recompute on the post corpus,
    including bucket-guard dynamics — see the test and the declared
    query's full-rebuild oracle):

    1. maintain the index (delta-sized signing, key retraction);
    2. AFFECTED BUCKETS = buckets holding any touched key in the PRE
       index (keys leaving: deletes, re-signs) ∪ buckets holding any
       touched key in the POST index (keys arriving) — these are the
       only buckets whose membership, and therefore whose emitted
       pair set (a bucket crossing ``max_bucket_size`` in either
       direction changes pairs between UNTOUCHED docs too), can
       differ from the pre state;
    3. AFFECTED DOCS = post members of affected buckets, + touched
       keys; AFFECTED CLUSTERS = their pre-state labels; REBUILD SET
       M = all members of affected clusters ∪ affected docs. M is
       closed under post-state candidate edges: an allowed bucket
       linking m∈M to x∉M is either untouched (so the m–x pair
       existed pre ⇒ same pre cluster ⇒ x∈M) or affected (⇒ x∈M);
    4. pairs WITHIN M from allowed buckets — bucket sizes measured on
       the FULL post index (a bucket's cap verdict must not depend on
       the restriction) — then min-label propagation on that subgraph
       only;
    5. output = untouched clusters passed through verbatim ∪ the
       rebuilt labels. Docs left pair-less drop out, matching
       ``dedup_clusters``' members-only contract.

    Cost: everything after the index delta is proportional to the
    affected buckets/clusters, not the corpus — the labeling, like the
    index, is never rebuilt from scratch."""
    from .dedup import banded_candidate_pairs, dedup_clusters

    # one eager materialization of the delta-sized changelog; touched is
    # a lazy checkpoint on top (materialized by its first consumer, then
    # reused by every semi join / broadcast)
    changes = changes.localCheckpoint(eager=False)
    n_changes = changes.count()  # materializes the checkpoint (1 job)
    touched = (
        changes.select(
            _op_checked(F.col("key"), F.col("op"), what="document changelog")
            .alias(id_col)
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    index_post = maintain_minhash_index(
        index_pre,
        changes,
        n_hashes,
        n_bands,
        shingle_k,
        hash_family,
        id_col,
        max_broadcast_changes,
        _touched=(touched, n_changes),
    ).localCheckpoint(eager=False)
    touched_b = (
        F.broadcast(touched) if n_changes <= max_broadcast_changes else touched
    )
    aff_buckets = (
        index_pre.join(touched_b, id_col, "left_semi")
        .select("band", "band_hash")
        .unionByName(
            index_post.join(touched_b, id_col, "left_semi").select(
                "band", "band_hash"
            )
        )
        .distinct()
    )
    aff_docs = (
        index_post.join(aff_buckets, ["band", "band_hash"], "left_semi")
        .select(id_col)
        .unionByName(touched.select(F.col(id_col)))
        .distinct()
    )
    aff_clusters = (
        clusters_pre.join(aff_docs, id_col, "left_semi")
        .select("cluster_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    members = (
        clusters_pre.join(aff_clusters, "cluster_id", "left_semi")
        .select(id_col)
        .unionByName(aff_docs)
        .distinct()
    )
    # Delta-sized cap evaluation: first restrict the index to the
    # buckets M's rows occupy (bucket-key semi-join — the semi join
    # keeps every FULL-index member of those buckets, so cap verdicts
    # below are still taken on full-index bucket membership), then
    # count only those buckets. Counting the whole post index instead
    # would make every batch pay a corpus-wide aggregate, contradicting
    # the delta-cost contract above (round-11 self-review finding).
    m_bucket_keys = index_post.join(members, id_col, "left_semi").select(
        "band", "band_hash"
    )  # no distinct: a semi join's build side dedups for free
    cand = index_post.join(
        m_bucket_keys, ["band", "band_hash"], "left_semi"
    ).localCheckpoint(eager=False)
    allowed = cand.groupBy("band", "band_hash").agg(
        F.count("*").alias("__n")
    )
    if max_bucket_size is not None:
        allowed = allowed.filter(F.col("__n") <= max_bucket_size)
    sub_banded = (
        cand.join(allowed.select("band", "band_hash"), ["band", "band_hash"])
        .join(members, id_col, "left_semi")
    )
    # cap=None: the verdict was already taken on the FULL index above —
    # re-counting on the restriction would wrongly re-admit buckets
    # whose out-of-M members were filtered away
    sub_pairs = banded_candidate_pairs(sub_banded, None, id_col)
    rebuilt = dedup_clusters(sub_pairs, max_iterations).select(
        F.col("doc_id").alias(id_col), F.col("cluster_id")
    )
    kept = clusters_pre.join(aff_clusters, "cluster_id", "left_anti").select(
        id_col, "cluster_id"
    )
    return kept.unionByName(rebuilt)
