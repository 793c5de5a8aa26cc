"""CDC change-log application: insert/update/delete op-log -> current
state.

The engine's namesake capability. The reference's keyed assignment
streams (nn_thresh.py:192-194 cluster-pair sink/scan) are append-only;
a real CDC consumer's first workload is a mutation log — every row is
an op ``(key, seq, op, payload)`` where ``op`` is INSERT / UPDATE /
DELETE (tombstone), ``seq`` is the log sequence number (LSN), and ops
may arrive in ANY order. Materializing current state is
last-writer-wins per key by ``seq``:

- the key's current row is the payload of its MAX-seq op;
- if that op is a delete, the key is absent;
- a late-arriving op with a LOWER seq than the applied one is a no-op
  (in particular: a late update must NOT resurrect a deleted key).

Spark-first physical: one keyed aggregation (``max_by`` over the op
struct — map-side partial argmax combines before the shuffle, so
shuffle volume is one row per key per map task, never the log volume).
No windows, no sort. Order-free by construction: ``max_by`` on a
unique seq is deterministic under any partitioning and any arrival
order, which is what makes the streaming twin
(streaming/materialize.py: MaterializedChangelog) exactly equal to the
batch apply on every prefix of the log.

Scale: at 100 TB of log the plan is scan -> partial argmax -> one
shuffle by key -> final argmax. Skewed hot keys partial-aggregate
map-side (argmax is a commutative monoid), so a key with 30% of the
log contributes one row per map task to the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELETE_OP = "D"


def latest_ops(
    oplog: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """One row per key: its max-seq op, TOMBSTONES INCLUDED. This is
    the state a streaming applier must retain — dropping a tombstone
    would let a late lower-seq update resurrect the key. ``seq_col``
    must be unique per key (an LSN is); ties would be broken
    arbitrarily by ``max_by``. Output schema: key_cols + seq_col +
    op_col + payload_cols; idempotent (latest_ops o latest_ops =
    latest_ops), which is what makes per-batch partials mergeable.
    """
    last = oplog.groupBy(*key_cols).agg(
        F.max(seq_col).alias(seq_col),
        F.max_by(
            F.struct(F.col(op_col), *[F.col(c) for c in payload_cols]),
            F.col(seq_col),
        ).alias("_last"),
    )
    return last.select(
        *key_cols,
        seq_col,
        F.col(f"_last.{op_col}").alias(op_col),
        *[F.col(f"_last.{c}").alias(c) for c in payload_cols],
    )


def apply_changelog(
    oplog: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str,
    payload_cols: list[str],
    delete_op: str = DELETE_OP,
) -> DataFrame:
    """Materialize the current state of a change log: last-writer-wins
    by ``seq_col`` per key, keys whose latest op is ``delete_op``
    absent. SQL-equivalent (the oracle form)::

        SELECT key, MAX(seq) AS seq, arg_max(op, seq) AS op,
               arg_max(payload, seq) AS payload
        FROM oplog GROUP BY key
        HAVING arg_max(op, seq) != 'D'
    """
    return latest_ops(oplog, key_cols, seq_col, op_col, payload_cols).filter(
        F.col(op_col) != delete_op
    )


def apply_changelog_evolving(
    oplog: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str,
    version_col: str,
    payload_col: str,
    columns: dict[str, str],
    delete_op: str = DELETE_OP,
) -> DataFrame:
    """Change-log apply under SCHEMA EVOLUTION: real op-logs drift —
    columns appear, types widen — so each op carries
    ``(schema_version, payload)`` where ``payload`` is a
    ``map<string,string>`` of the fields that version knows about
    (the schema-registry wire shape). The output is the UNION schema
    ``columns`` (name -> cast type): fields absent from the winning
    op's payload back-fill as NULL, and every present field
    ``try_cast``s into the union (widest) type — a v1 op's narrow
    integer string lands in a v2-widened BIGINT column without
    rewriting history. Last-writer-wins by ``seq`` is UNCHANGED and
    version-blind: a v1 key updated by a v2 op takes the v2 payload
    and vice versa.

    Physical: identical to apply_changelog — ONE keyed argmax
    (map-side-combining ``max_by`` over the (op, version, payload)
    struct), then a pure projection. Schema evolution costs nothing
    at 100 TB: no second shuffle, no per-version passes; the union
    projection is whole-stage-codegen column expressions. ANSI-safe:
    ``try_element_at`` / ``try_cast`` so a malformed or pre-widening
    payload value yields NULL instead of failing the job (Spark 4
    ANSI mode throws on plain ``element_at``/``cast``)."""
    last = oplog.groupBy(*key_cols).agg(
        F.max(seq_col).alias(seq_col),
        F.max_by(
            F.struct(F.col(op_col), F.col(version_col), F.col(payload_col)),
            F.col(seq_col),
        ).alias("_last"),
    )
    return last.filter(F.col(f"_last.{op_col}") != delete_op).select(
        *key_cols,
        seq_col,
        F.col(f"_last.{version_col}").alias(version_col),
        *[
            F.try_element_at(F.col(f"_last.{payload_col}"), F.lit(name))
            .try_cast(typ)
            .alias(name)
            for name, typ in columns.items()
        ],
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    delete_op: str = DELETE_OP,
) -> DataFrame:
    """CDC CAPTURE: diff two keyed snapshots into an I/U/D op-log —
    the inverse of apply_changelog, and what log-less capture (JDBC
    snapshot diffing, backfill reconciliation) actually runs. Keys
    only in ``new`` emit INSERT, only in ``old`` emit DELETE (payload
    NULL), present in both with any null-safe difference in
    ``compare_cols`` emit UPDATE; unchanged keys emit nothing.

    One full-outer keyed join — shuffle on the key, linear, no
    windows; at 100 TB both snapshot scans prune to key+compare
    columns. Presence is tracked with explicit marker columns, not
    key NULL-ness, so NULL-able payloads can't fake an insert.
    Output: key_cols + op + compare_cols (from ``new``; NULL on
    deletes)."""
    o = old.select(
        *key_cols,
        *[F.col(c).alias(f"_old_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(*key_cols, *compare_cols, F.lit(1).alias("_in_new"))
    j = o.join(n, key_cols, "full_outer")
    changed = None
    for c in compare_cols:
        d = ~F.col(c).eqNullSafe(F.col(f"_old_{c}"))
        changed = d if changed is None else (changed | d)
    op = (
        F.when(F.col("_in_old").isNull(), F.lit("I"))
        .when(F.col("_in_new").isNull(), F.lit(delete_op))
        .when(changed, F.lit("U"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(*key_cols, "op", *compare_cols)
    )


def changelog_deltas(
    oplog: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str,
    value_col: str,
    delete_op: str = DELETE_OP,
    band_width: int | None = None,
    target_bands: int | None = None,
) -> DataFrame:
    """Incremental-view-maintenance DELTAS from an I/U/D op-log: each
    op's contribution to any downstream SUM/COUNT view, so the view is
    maintained by ADDING deltas (one order-free aggregation per batch)
    instead of recomputing state.

    Per key in seq order, the post-op state is ``value`` (NULL after a
    delete); the op's deltas are
        delta_value = state - previous_state      (DECIMAL, exact)
        delta_live  = [state IS NOT NULL] - [previous IS NOT NULL]
    which TELESCOPE per key: their sums equal the key's live last
    value / liveness bit exactly (decimal cancellation is exact), so
    SUM(deltas) over any group == the recomputed view over current
    state — the IVM correctness property the query oracle checks with
    an independent recompute formulation. The pre-image comes from a
    keyed lag window here (a real CDC feed ships it as the Debezium
    before-image; substitute that column and the window disappears).
    Deletes of keys never seen and leading updates coalesce against 0
    — a tombstone for a nonexistent key contributes nothing.

    Liveness is an OP-based flag (op != delete), independent of the
    payload: an I/U carrying a NULL value is a LIVE key whose SUM
    contribution is 0 (matching SQL SUM's NULL-skipping) but whose
    COUNT contribution is 1 — deriving liveness from value
    non-nullness would silently diverge from a COUNT-over-state
    recompute on such rows (ADVICE r5).

    HOT-KEY SAFETY (r6, found by tools/stress.py: a 30%-hot key made
    the plain per-key lag window 10x superlinear — one task sorts the
    whole hot key): the lag is BANDED. Rows window within
    (key, seq div band_width) — partitions bounded by the band, not
    the key — and each band's first row takes its pre-image from a
    band-LAST table (one row per non-empty (key, band), max_by over
    seq) whose per-key lag window holds n/band_width rows, hot or
    not. lag over that table's band order yields the previous
    NON-EMPTY band, so sparse bands are handled; results are
    identical to the single-window form (test-pinned across band
    boundaries, and band-width-INVARIANT, which is what makes the
    adaptive default safe).

    ``band_width`` defaults to ADAPTIVE: three planning scalars
    (min/max seq, row count — the bounded-collect class of the
    strategy="auto" count) size bands so band count stays ~constant
    until rows genuinely need splitting (target <=250k rows per band).
    A fixed width makes the band-last table grow superlinearly in the
    small-data transition regime (global seqs + many keys ⇒ bands per
    key grows with scale before capping at rows — caught by
    tools/measure_shuffle.py alpha=1.22); the adaptive width keeps
    the side-table ∝ keys at small scale and <= rows always. Logs
    that fit the per-band target entirely take the PLAIN single
    per-key window (band_width=0 forces it): no partition can exceed
    the bound anyway, and the band machinery costs ~2x there.
    ``target_bands`` FORCES the banded path with a width sized from
    the operator's own planning scalars so the seq range splits into
    ~that many bands at any scale — the driver-scale 'force the 100 TB
    physical' dial (ivm_hotkey_sums) without the transition-regime
    superlinearity a FIXED forced width has (bands-per-key must stay
    constant across scales, not grow with the seq range)."""
    from pyspark.sql import Window as W

    _BAND_TARGET = 250_000
    if band_width is None or target_bands is not None:
        lo, hi, n = oplog.agg(
            F.min(seq_col), F.max(seq_col), F.count(F.lit(1))
        ).first()
        if n == 0 or lo is None:
            band_width = 1
        elif target_bands is not None:
            band_width = max(1, (int(hi) - int(lo)) // max(1, target_bands) + 1)
        elif int(n) <= _BAND_TARGET:
            # banding bounds window partitions at ~_BAND_TARGET rows;
            # when the WHOLE log fits that bound no partition can
            # exceed it — take the plain single-window path (the band
            # side table + join cost ~2x at small scale for nothing)
            band_width = 0
        else:
            n_bands = max(32, -(-int(n) // _BAND_TARGET))
            band_width = max(1, (int(hi) - int(lo)) // n_bands + 1)
    state = F.when(
        F.col(op_col) != delete_op, F.col(value_col).cast("decimal(18,2)")
    )
    live = F.when(F.col(op_col) != delete_op, 1).otherwise(0)
    if band_width == 0:
        w = W.partitionBy(*key_cols).orderBy(seq_col)
        prev = F.lag(state).over(w)
        prev_l = F.lag(live).over(w)
        return oplog.select(
            *key_cols,
            F.col(seq_col),
            (F.coalesce(state, F.lit(0).cast("decimal(18,2)"))
             - F.coalesce(prev, F.lit(0).cast("decimal(18,2)"))).alias("delta_value"),
            (live - F.coalesce(prev_l, F.lit(0))).cast("long").alias("delta_live"),
        )
    band = F.expr(f"`{seq_col}` div {band_width}")
    rows = oplog.select(
        *key_cols,
        F.col(seq_col),
        band.alias("_band"),
        state.alias("_state"),
        live.alias("_live"),
    )
    w_band = W.partitionBy(*key_cols, "_band").orderBy(seq_col)
    rows = rows.withColumn("_prev_state", F.lag("_state").over(w_band)).withColumn(
        "_prev_live", F.lag("_live").over(w_band)
    ).withColumn("_first_in_band", F.row_number().over(w_band) == 1)
    band_last = rows.groupBy(*key_cols, "_band").agg(
        F.max_by(F.col("_state"), F.col(seq_col)).alias("_bl_state"),
        F.max_by(F.col("_live"), F.col(seq_col)).alias("_bl_live"),
    )
    w_key = W.partitionBy(*key_cols).orderBy("_band")
    prev_band = band_last.select(
        *key_cols,
        "_band",
        F.lag("_bl_state").over(w_key).alias("_pb_state"),
        F.lag("_bl_live").over(w_key).alias("_pb_live"),
    )
    joined = rows.join(prev_band, [*key_cols, "_band"])
    prev_state = F.when(
        F.col("_first_in_band"), F.col("_pb_state")
    ).otherwise(F.col("_prev_state"))
    prev_live = F.when(
        F.col("_first_in_band"), F.col("_pb_live")
    ).otherwise(F.col("_prev_live"))
    return joined.select(
        *key_cols,
        F.col(seq_col),
        (F.coalesce(F.col("_state"), F.lit(0).cast("decimal(18,2)"))
         - F.coalesce(prev_state, F.lit(0).cast("decimal(18,2)"))).alias("delta_value"),
        (F.col("_live") - F.coalesce(prev_live, F.lit(0)))
        .cast("long").alias("delta_live"),
    )


def ivm_join_fold(
    flog: DataFrame,
    dims_all: DataFrame,
    lo: int,
    hi: int,
    n_batches: int = 4,
) -> DataFrame:
    """JOIN-VIEW IVM batch fold over a SIGNED fact changelog — the
    two-term delta rule V' = V + dA JOIN B + A' JOIN delta(B),
    extracted from the ivm_join_retract query so stress.py can drive
    it on synthetic hot-key logs at 1M-4M ops.

    flog: (user_id, seq, dn, dc) signed fact deltas (a retraction is
    a negative element of the per-user commutative group — no
    per-row compensation machinery). dims_all: (user_id, seq,
    new_seg) dimension upserts; an upsert between a fact's insert
    and its void reclassifies the un-voided partial to the new
    segment via keyed partials — NEVER a history rescan (the
    100 TB contract: per-batch work is O(batch + touched keys)).
    Batches are seq-range slices of [lo, hi]. Returns the final view
    (segment, n_facts, cents_sum) INCLUDING zero-support rows —
    callers filter. The fold is sequential (each batch's view delta
    depends on the previous A/B state) so per-batch localCheckpoints
    are inherent — but they are LAZY (optimization r9): nothing inside
    the loop needs a driver value, so plan truncation happens at call
    time while materialization rides the caller's single final action
    (12 eager driver jobs for a 4-batch fold become one job; each
    state RDD is cached at first compute inside that job, so the
    multi-reference reuse is unchanged)."""
    step = (hi - lo + 1 + n_batches - 1) // n_batches
    a_state = None
    b_state = None
    v_state = None
    for i in range(n_batches):
        s_lo, s_hi = lo + i * step, lo + (i + 1) * step
        pa = (
            flog.filter((F.col("seq") >= s_lo) & (F.col("seq") < s_hi))
            .groupBy("user_id")
            .agg(
                F.sum("dn").cast("long").alias("a_n"),
                F.sum("dc").cast("long").alias("a_cents"),
            )
        )
        db = (
            dims_all.filter((F.col("seq") >= s_lo) & (F.col("seq") < s_hi))
            .groupBy("user_id")
            .agg(F.max_by("new_seg", "seq").alias("new_seg"))
        )
        if b_state is not None:
            t1 = pa.join(b_state, "user_id").select(
                "segment",
                F.col("a_n").alias("dn"),
                F.col("a_cents").alias("dc"),
            )
        else:
            t1 = None
        if a_state is None:
            a_state = pa.localCheckpoint(eager=False)
        else:
            a_state = (
                a_state.unionByName(pa)
                .groupBy("user_id")
                .agg(
                    F.sum("a_n").cast("long").alias("a_n"),
                    F.sum("a_cents").cast("long").alias("a_cents"),
                )
                .localCheckpoint(eager=False)
            )
        if b_state is not None:
            moved = db.join(b_state, "user_id", "left")
        else:
            moved = db.withColumn("segment", F.lit(None).cast("string"))
        moved = moved.join(a_state, "user_id")
        retract = moved.filter(F.col("segment").isNotNull()).select(
            "segment",
            (-F.col("a_n")).alias("dn"),
            (-F.col("a_cents")).alias("dc"),
        )
        insert = moved.select(
            F.col("new_seg").alias("segment"),
            F.col("a_n").alias("dn"),
            F.col("a_cents").alias("dc"),
        )
        dv = retract.unionByName(insert)
        if t1 is not None:
            dv = dv.unionByName(t1)
        dv = dv.groupBy("segment").agg(
            F.sum("dn").cast("long").alias("n_facts"),
            F.sum("dc").cast("long").alias("cents_sum"),
        )
        if v_state is None:
            v_state = dv.localCheckpoint(eager=False)
        else:
            v_state = (
                v_state.unionByName(dv)
                .groupBy("segment")
                .agg(
                    F.sum("n_facts").cast("long").alias("n_facts"),
                    F.sum("cents_sum").cast("long").alias("cents_sum"),
                )
                .localCheckpoint(eager=False)
            )
        if b_state is None:
            b_state = db.select(
                "user_id", F.col("new_seg").alias("segment")
            ).localCheckpoint(eager=False)
        else:
            b_state = (
                b_state.join(db, "user_id", "full")
                .select(
                    "user_id",
                    F.coalesce("new_seg", "segment").alias("segment"),
                )
                .localCheckpoint(eager=False)
            )
    return v_state
