"""Event-time streaming extensions (SURVEY §7 step 7: the reference's
streams are positional with no late data; watermarked event-time
windows are the engine extension a real deployment needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time windows with a late-data watermark:
    (window_start, window_end, key, n_events, sum_value). Append-mode
    compatible — windows finalize once the watermark passes."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup within the watermark horizon:
    dropDuplicates keyed state with TTL — the streaming form of
    operators.dedup.exact_dedup_groups."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def streaming_sessions(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming gap-based sessionization via ``F.session_window`` —
    the streaming twin of operators.temporal.sessionize: a session
    closes when no event arrives for ``gap``, and its row finalizes
    once the watermark passes the session end (append-mode safe).
    State is per (key, open session), bounded by the watermark.

    Output: (session_start, session_end, key, n_events, sum_value)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    lookback: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: pair each left event with the
    right-stream events of the same key in the preceding ``lookback``
    window. Both sides carry watermarks and the join condition bounds
    event time on both, so Spark can expire join state — unbounded
    state is the failure mode of naive stream-stream joins.

    Output: (key, left ts/type/value as l_*, right ts/type/value as
    r_*, lag_seconds)."""
    l = (
        left.withWatermark(ts_col, watermark)
        .select(
            F.col(key_col).alias("l_key"),
            F.col(ts_col).alias("l_ts"),
            F.col("event_type").alias("l_type"),
            F.col("value").alias("l_value"),
        )
    )
    r = (
        right.withWatermark(ts_col, watermark)
        .select(
            F.col(key_col).alias("r_key"),
            F.col(ts_col).alias("r_ts"),
            F.col("event_type").alias("r_type"),
            F.col("value").alias("r_value"),
        )
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    joined = l.join(r, cond, "inner")
    return joined.select(
        F.col("l_key").alias(key_col),
        "l_ts",
        "l_type",
        "l_value",
        "r_ts",
        "r_type",
        "r_value",
        (F.col("l_ts").cast("long") - F.col("r_ts").cast("long")).alias("lag_seconds"),
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: the dim side is a bounded
    DataFrame (entity vocab, source metadata), broadcast to every
    micro-batch — stateless, so it composes freely before or after
    stateful operators."""
    return stream.join(F.broadcast(dim), on, how)


def multi_stream_join(
    anchor: DataFrame,
    others: list[tuple[str, DataFrame]],
    key_col: str = "user_id",
    ts_col: str = "ts",
    lookback: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Multi-table streaming join: chain an interval join per extra
    stream, pairing each anchor event with same-key events from EVERY
    other stream within the preceding ``lookback``.

    Each side carries its own watermark and every join predicate
    bounds both event times, so the state for each of the N-1 joins
    expires independently — the per-join state is what Spark tracks,
    and chaining stateful joins is supported since multiple-stateful-
    operator support landed in Spark 3.5 (SPARK-42376).

    Output: (key, ts, event_type, value, then per stream
    <name>_ts/<name>_type/<name>_value, <name>_lag_seconds).
    """
    out = anchor.withWatermark(ts_col, watermark).select(
        F.col(key_col).alias("_key"),
        F.col(ts_col).alias("_ts"),
        F.col("event_type").alias("event_type"),
        F.col("value").alias("value"),
    )
    for name, s in others:
        side = s.withWatermark(ts_col, watermark).select(
            F.col(key_col).alias(f"{name}_key"),
            F.col(ts_col).alias(f"{name}_ts"),
            F.col("event_type").alias(f"{name}_type"),
            F.col("value").alias(f"{name}_value"),
        )
        cond = (
            (F.col("_key") == F.col(f"{name}_key"))
            & (F.col(f"{name}_ts") <= F.col("_ts"))
            & (F.col(f"{name}_ts") >= F.col("_ts") - F.expr(f"INTERVAL {lookback}"))
        )
        out = (
            out.join(side, cond, "inner")
            .drop(f"{name}_key")
            # strip the event-time metadata off the joined side's ts
            # (cast round-trip): the NEXT chained stateful join needs
            # exactly one event-time column — the anchor's
            .withColumn(
                f"{name}_ts", F.col(f"{name}_ts").cast("long").cast("timestamp")
            )
            .withColumn(
                f"{name}_lag_seconds",
                F.col("_ts").cast("long") - F.col(f"{name}_ts").cast("long"),
            )
        )
    return out.withColumnRenamed("_key", key_col).withColumnRenamed("_ts", ts_col)


def streaming_minhash_dedup(
    stream: DataFrame,
    num_hashes: int = 4,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """In-stream NEAR-dup suppression: the batch MinHash pipeline
    recast for a stream. The per-document signature is a pure
    projection (word-3-gram shingles as an array expression -> min
    salted md5 per hash function — no shuffle, no aggregation state),
    so the only stateful operator is dropDuplicatesWithinWatermark on
    the signature columns: a later document whose shingle set
    minhash-collides with an earlier one inside the watermark horizon
    is dropped. State is one row per distinct signature with a TTL —
    bounded, key-partitioned, unbounded-stream safe."""
    from streaming_cdc_spark.functions.hashing import md5_long
    from streaming_cdc_spark.operators.dedup import tokens, word_shingles

    sig_src = F.array_distinct(word_shingles(tokens(text_col)))
    out = stream.withColumn("_sh", sig_src)

    def hasher(salt):
        # MUST be a single-argument lambda: F.transform hands a
        # 2-arg callable (element, index) — a defaulted second
        # parameter would silently receive the array index
        return lambda g: md5_long(g, salt=salt)

    sig_cols = []
    for i in range(num_hashes):
        out = out.withColumn(
            f"mh{i}", F.array_min(F.transform(F.col("_sh"), hasher(f"{i}|")))
        )
        sig_cols.append(f"mh{i}")
    return (
        out.drop("_sh")
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(sig_cols)
    )


def streaming_token_counts(
    stream: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Windowed corpus statistics on a document stream: explode
    tokens inside each event-time window and count per (window,
    token) — the streaming twin of token_histogram's aggregation
    (the top-N rank is a batch post-step: rank windows aren't
    append-mode safe). Watermarked, so per-window state finalizes
    and expires. Output: (window_start, window_end, token, n)."""
    toks = stream.select(
        F.col(ts_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    return (
        toks.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col("token"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "token",
            "n",
        )
    )


def streaming_bloom_dedup(
    stream: DataFrame,
    key_col: str = "text",
    id_col: str = "event_id",
    n_bits: int = 1 << 14,
    n_hashes: int = 3,
    n_shards: int = 8,
) -> DataFrame:
    """EXACT-key streaming dedup with BOUNDED probabilistic state: a
    sharded Bloom bitmap instead of one state row per key.

    dropDuplicates' keyed state grows with the number of DISTINCT keys
    ever seen — unbounded on an unbounded stream unless a watermark
    TTL is acceptable. This operator caps state at
    ``n_shards * n_bits / 8`` bytes FOREVER: each key hashes to one
    shard (md5, uniform) and ``n_hashes`` bit positions; the
    per-shard ValueState is the bitmap words. The trade is semantic —
    a fresh key is falsely dropped at the Bloom FP rate (size n_bits
    at ~10 bits per expected distinct key for ~1%), which is the
    right contract for crawl dedup at 100 TB where duplicates are
    legion and an occasional false drop is noise. No key is ever
    emitted twice (no false negatives), including within a batch.

    Hash positions are computed as JVM column expressions BEFORE the
    stateful operator — the Python processor only tests/sets bits.
    Per shard, rows process in ``id_col`` order, so output status is
    deterministic given the micro-batch sequence. Output (append):
    (id_col, shard, status) with status 'fresh' | 'dup'.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from streaming_cdc_spark.functions.hashing import md5_long
    from streaming_cdc_spark.session import ensure_package_on_executors

    ensure_package_on_executors(stream.sparkSession)

    n_words = (n_bits + 63) // 64
    pos_cols = [
        (md5_long(key_col, salt=f"bloom{i}") % n_bits).alias(f"_p{i}")
        for i in range(n_hashes)
    ]
    keyed = stream.select(
        F.col(id_col).cast("long").alias("_id"),
        (md5_long(key_col, salt="shard") % n_shards).cast("long").alias("shard"),
        *pos_cols,
    )

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("shard", LongType()),
            StructField("status", StringType()),
        ]
    )
    state_schema = StructType([StructField("words", ArrayType(LongType()))])
    pnames = [f"_p{i}" for i in range(n_hashes)]

    def process(key, pdfs, state: GroupState):
        # stored signed (LongType); python int bitwise ops treat the
        # negative values as two's complement, so tests/sets just work
        words = list(state.get[0]) if state.exists else [0] * n_words
        ids, statuses = [], []
        # drain the WHOLE group before sorting: Arrow hands the group
        # as ~10k-row chunks in arbitrary order, and a per-chunk sort
        # would let a later id process first when a shard spans chunks
        # — breaking the global id-order the oracle replays
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values("_id")
            rid_arr = pdf["_id"].to_numpy()
            pos_mat = pdf[pnames].to_numpy()
            for rid, positions in zip(rid_arr, pos_mat):
                hit = all(
                    words[int(p) >> 6] & (1 << (int(p) & 63)) for p in positions
                )
                if not hit:
                    for p in positions:
                        words[int(p) >> 6] |= 1 << (int(p) & 63)
                ids.append(int(rid))
                statuses.append("dup" if hit else "fresh")
        state.update(([w if w < (1 << 63) else w - (1 << 64) for w in words],))
        yield pd.DataFrame(
            {
                id_col: ids,
                "shard": [int(key[0])] * len(ids),
                "status": statuses,
            }
        )

    return keyed.groupBy("shard").applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_misra_gries(
    stream: DataFrame,
    key_col: str = "key",
    id_col: str = "event_id",
    k: int = 16,
    n_shards: int = 8,
) -> DataFrame:
    """STREAMING heavy-hitter sketch with BOUNDED state: the
    Misra-Gries summary (operators/profile.py: mg_insert) kept as
    sharded ``applyInPandasWithState`` ValueState — each key hashes to
    one shard (md5, uniform), each shard holds at most ``k`` weighted
    counters FOREVER (state is n_shards * k rows, not O(distinct
    keys)), and counters carry across micro-batches, so the sketch
    summarizes the WHOLE stream prefix, not just the current batch.

    Error theorem under sharding: a key lives in exactly one shard,
    and its shard's decrements total at most n_shard/(k+1) <=
    N/(k+1) — the same bound the batch operator satisfies, so the
    streaming and batch forms are interchangeable evidence-wise (the
    cdc_streaming_apply pattern: one oracle, two physicals). Estimates
    remain arrival-order-dependent (any mergeable sketch is); queries
    must surface exact counts + theorem bits only.

    Emits (append mode), after every micro-batch, each updated
    shard's CURRENT counters tagged with a per-shard batch index:
    (shard, batch_idx, key, est). The final summary is the max
    batch_idx row-set per shard."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from streaming_cdc_spark.functions.hashing import md5_long
    from streaming_cdc_spark.operators.profile import mg_insert
    from streaming_cdc_spark.session import ensure_package_on_executors

    ensure_package_on_executors(stream.sparkSession)
    # NULL keys excluded, matching the batch summary (str(None) would
    # otherwise invent a 'None' key that never joins back)
    keyed = stream.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(key_col).cast("string").alias("_k"),
        (md5_long(key_col, salt="hhshard") % n_shards).cast("long").alias("shard"),
    ).filter(F.col("_k").isNotNull())
    out_schema = StructType(
        [
            StructField("shard", LongType()),
            StructField("batch_idx", LongType()),
            StructField("key", StringType()),
            StructField("est", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("keys", ArrayType(StringType())),
            StructField("counts", ArrayType(LongType())),
            StructField("batches", LongType()),
        ]
    )

    def process(key, pdfs, state: GroupState):
        if state.exists:
            keys, counts, b = state.get
            d = dict(zip(list(keys), [int(c) for c in counts]))
        else:
            d, b = {}, 0
        # drain the whole group before sorting (the Arrow-chunk-order
        # lesson): process rows in global id order within the batch
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values("_id")
            for kk in pdf["_k"].to_numpy():
                d = mg_insert(d, str(kk), 1, k)
        b += 1
        state.update((list(d.keys()), [int(v) for v in d.values()], b))
        yield pd.DataFrame(
            {
                "shard": [int(key[0])] * len(d),
                "batch_idx": [b] * len(d),
                "key": list(d.keys()),
                "est": [int(v) for v in d.values()],
            }
        )

    return keyed.groupBy("shard").applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_sessionizer_custom(
    stream: DataFrame,
    gap_us: int = 1_800_000_000,
    watermark: str = "7 days",
    ts_col: str = "ts",
    key_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """CUSTOM-STATE sessionization with EVENT-TIME TIMEOUT — the same
    gap-merge + append-emission semantics as the native
    ``session_window`` aggregation, rebuilt on
    ``applyInPandasWithState`` so the remaining state-API surface
    (GroupStateTimeout.EventTimeTimeout + getCurrentWatermarkMs) has
    a first-class, oracle-checked exercise. Registered under the
    SAME oracle as streaming_sessions_finalized: the driver hash
    match pins custom state machine == native operator (the
    weighted_median_banded twin-evidence pattern).

    Mechanics (mirroring the empirically pinned native rules):
    - state per key = the OPEN sessions as (start_us, end_us, count)
      triples; new events gap-merge at microsecond precision (new
      session iff gap >= gap_us — matching session_window's merge
      over [start, last+gap)).
    - a session emits iff end_us + gap_us <= watermark_us, evaluated
      from GroupState.getCurrentWatermarkMs()*1000 — the same
      ms-truncated watermark the native operator compares window
      ends against (data batches see the PREVIOUS batch's watermark;
      availableNow's closing no-data batch delivers the final one).
    - unexpired sessions set an event-time timeout at their earliest
      expiry MINUS 1 ms (Spark fires timeouts strictly AFTER the
      timestamp while the emission rule is boundary-inclusive;
      setTimeoutTimestamp must still exceed the current watermark,
      so the re-arm clamps to wm+1), so the closing batch re-invokes
      exactly the groups still holding state, with empty input and
      hasTimedOut — where expired sessions flush. Residual 1-ms
      quantization blind spot (inherent to ms-granular timeouts +
      strictly-after firing): see the comment at the re-arm site.

    Arrow hands a group as chunks in arbitrary order: drain ALL
    chunks, concat, sort once by (ts, id) — the r4 per-chunk-sort
    trap."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField(key_col, LongType()),
            StructField("session_start_us", LongType()),
            StructField("n_events", LongType()),
            StructField("session_us", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("starts", ArrayType(LongType())),
            StructField("ends", ArrayType(LongType())),
            StructField("counts", ArrayType(LongType())),
        ]
    )

    def process(key, pdfs, state: GroupState):
        wm_us = state.getCurrentWatermarkMs() * 1000
        sessions = []
        if state.exists:
            starts, ends, counts = state.get
            sessions = [
                [int(s), int(e), int(c)] for s, e, c in zip(starts, ends, counts)
            ]
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["_tus", "_id"])
            for tus in pdf["_tus"].to_numpy():
                t = int(tus)
                sessions.append([t, t, 1])
        # gap-merge the (start-sorted) interval list: stored open
        # sessions precede this batch's events only if earlier — sort
        # to make the fold order-correct in the general case
        sessions.sort()
        merged = []
        for s, e, c in sessions:
            if merged and s - merged[-1][1] < gap_us:
                merged[-1][1] = max(merged[-1][1], e)
                merged[-1][2] += c
            else:
                merged.append([s, e, c])
        expired = [x for x in merged if x[1] + gap_us <= wm_us]
        live = [x for x in merged if x[1] + gap_us > wm_us]
        if live:
            state.update(
                (
                    [x[0] for x in live],
                    [x[1] for x in live],
                    [x[2] for x in live],
                )
            )
            # Timeout at floor(expiry_ms) - 1, NOT + 1: Spark fires
            # event-time timeouts strictly AFTER the timestamp, and
            # the emission rule is boundary-INCLUSIVE (end + gap <=
            # wm, the empirically pinned native semantics the shared
            # oracle replays) — with +1 a session expiring within
            # ~2ms at/below the final watermark would never get its
            # group re-invoked and silently stay in state (review
            # r7s3). -1 guarantees: emittable (E <= wm_ms*1000 =>
            # floor(E/1000) <= wm_ms => wm_ms > timeout) implies
            # invoked; an early firing just re-arms under the
            # emission guard. Clamped above the current watermark as
            # setTimeoutTimestamp requires.
            #
            # RESIDUAL 1-ms QUANTIZATION BLIND SPOT (inherent to
            # setTimeoutTimestamp > watermark + strictly-after
            # firing, NOT fixable by changing the -1): if a group is
            # invoked at wm == floor(expiry_ms) while still live,
            # the clamp re-arms at wm+1; should the FINAL watermark
            # then advance exactly 1 ms to ceil(expiry/1000), the
            # session is emittable under the boundary-inclusive rule
            # but wm never strictly passes the timeout, so it stays
            # in state. Reachable only with sub-ms event times —
            # whole-second fixtures cannot hit it. Pinned by
            # test_submillisecond_expiry_blind_spot so a fixture
            # regen with sub-ms timestamps fails loudly there.
            timeout_ms = min(x[1] + gap_us for x in live) // 1000 - 1
            state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))
        else:
            state.remove()
        yield pd.DataFrame(
            {
                key_col: pd.array([int(key[0])] * len(expired), dtype="int64"),
                "session_start_us": pd.array(
                    [x[0] for x in expired], dtype="int64"
                ),
                "n_events": pd.array([x[2] for x in expired], dtype="int64"),
                "session_us": pd.array(
                    [x[1] - x[0] for x in expired], dtype="int64"
                ),
            }
        )

    keyed = (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.col(key_col),
            F.col(ts_col),
            F.unix_micros(ts_col).alias("_tus"),
            F.col(id_col).alias("_id"),
        )
    )
    return keyed.groupBy(key_col).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
