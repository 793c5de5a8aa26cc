"""As-of join and time-bucket rollup operators."""

from streaming_cdc_spark.operators.temporal import asof_join, time_bucket_rollup


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", "2024-01-01 10:00:00"),
            (2, "k1", "2024-01-01 12:00:00"),
            (3, "k1", "2024-01-01 09:00:00"),  # before any state -> unmatched
            (4, "k2", "2024-01-01 12:00:00"),  # key with no state -> unmatched
        ],
        "id long, k string, ts string",
    ).selectExpr("id", "k", "cast(ts as timestamp) as ts")
    right = spark.createDataFrame(
        [
            ("k1", "2024-01-01 09:30:00", 100.0),
            ("k1", "2024-01-01 11:00:00", 200.0),
            ("k1", "2024-01-01 10:00:00", 150.0),  # exact tie with probe id=1
        ],
        "k string, rts string, price double",
    ).selectExpr("k", "cast(rts as timestamp) as rts", "price")
    out = asof_join(left, right, key="k", left_ts="ts", right_ts="rts", payload_cols=["price"])
    got = {r["id"]: r["price"] for r in out.collect()}
    assert got == {1: 150.0, 2: 200.0}  # exact-time state is visible; 3,4 dropped

    outer = asof_join(
        left, right, key="k", left_ts="ts", right_ts="rts", payload_cols=["price"], inner=False
    )
    got2 = {r["id"]: r["price"] for r in outer.collect()}
    assert got2 == {1: 150.0, 2: 200.0, 3: None, 4: None}


def test_time_bucket_rollup_consistency(spark):
    rows = [
        ("2024-01-01 00:10:00", "a", 1.0),
        ("2024-01-01 00:50:00", "a", 2.0),
        ("2024-01-01 05:10:00", "a", 4.0),
        ("2024-01-02 00:10:00", "a", 8.0),
        ("2024-01-01 00:20:00", "b", 16.0),
    ]
    df = spark.createDataFrame(rows, "ts string, event_type string, value double").selectExpr(
        "cast(ts as timestamp) as ts", "event_type", "value"
    )
    hourly, daily = time_bucket_rollup(df, "ts", "event_type", "value")
    h = {(str(r["bucket"]), r["event_type"]): (r["n"], r["sum_value"]) for r in hourly.collect()}
    d = {(str(r["bucket"]), r["event_type"]): (r["n"], r["sum_value"]) for r in daily.collect()}
    assert h[("2024-01-01 00:00:00", "a")] == (2, 3.0)
    assert d[("2024-01-01 00:00:00", "a")] == (3, 7.0)
    assert d[("2024-01-02 00:00:00", "a")] == (1, 8.0)
    # invariant: daily totals == sum of hourly totals
    assert sum(v[1] for v in d.values()) == sum(v[1] for v in h.values())


def test_sessionize(spark):
    from streaming_cdc_spark.operators.temporal import sessionize
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, t0),
        (2, 1, t0 + dt.timedelta(minutes=10)),   # same session
        (3, 1, t0 + dt.timedelta(minutes=50)),   # gap > 30min -> new
        (4, 2, t0),                               # other user
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(df, "user_id", "ts", 1800, ["ts", "event_id"]).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_resample_locf_gaps_ties_and_leading_nulls(spark):
    from pyspark.sql import functions as F

    from streaming_cdc_spark.operators.temporal import resample_locf

    F_US = 100  # tiny slots for hand-checkable math
    rows = [
        # user 1: obs at t=105 (v=1.0), t=310 (v=2.0) -> slots 1..3
        (0, 1, 105, 1.0),
        (1, 1, 310, 2.0),
        # tie at the same instant: larger event_id wins
        (2, 2, 100, 5.0),
        (3, 2, 100, 7.0),
        (4, 2, 305, 9.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, us long, value double")
    ev = df.select(
        "event_id", "user_id", F.timestamp_micros(F.col("us")).alias("ts"), "value"
    )
    got = {
        (r["user_id"], r["slot"]): r["value_ffill"]
        for r in resample_locf(ev, freq_us=F_US).collect()
    }
    assert got == {
        # user 1: slot 1 boundary t=100 precedes first obs -> NULL;
        # slot 2 (t=200) carries v=1.0; slot 3 (t=300) still 1.0
        # (obs at 310 is after the boundary)
        (1, 1): None,
        (1, 2): 1.0,
        (1, 3): 1.0,
        # user 2: boundary obs AT t=100 included; tie -> event 3 wins
        (2, 1): 7.0,
        (2, 2): 7.0,
        (2, 3): 7.0,
    }


def test_resample_locf_carries_null_observations(spark):
    """True as-of semantics: a NULL-valued observation is a real
    match — later slots carry the NULL, not the older non-null value
    (matches the DuckDB ASOF oracle; review-found divergence)."""
    from pyspark.sql import functions as F

    from streaming_cdc_spark.operators.temporal import resample_locf

    rows = [(0, 1, 105, 1.0), (1, 1, 150, None), (2, 1, 320, 3.0)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, us long, value double")
    ev = df.select(
        "event_id", "user_id", F.timestamp_micros(F.col("us")).alias("ts"), "value"
    )
    got = {
        r["slot"]: r["value_ffill"]
        for r in resample_locf(ev, freq_us=100).collect()
    }
    assert got == {1: None, 2: None, 3: None}  # NULL at 150 masks 1.0


def test_ddww_semantics_probe(spark, tmp_path):
    """Pins the three dropDuplicatesWithinWatermark mechanics the
    streaming_dedup_watermark oracle replays (probed on Spark 4.1):
    (1) watermark lags one batch, (2) dedup-check precedes eviction
    within a batch, (3) dropped duplicates do NOT refresh state. A
    key arriving in six consecutive 100s-era batches with a 60s delay
    must re-emit at batch 4 — not 3 (check-before-evict), and not
    never (no refresh). If a Spark upgrade changes any rule this
    fails HERE with a named cause instead of an opaque oracle hash
    mismatch."""
    import os

    from pyspark.sql import functions as F

    T0 = 1_700_000_000
    base = tmp_path / "src"
    for b in range(6):
        rows = [("kall", T0 + b * 100), (f"kwm{b}", T0 + b * 100)]
        p = str(base / f"b{b}")
        spark.createDataFrame(rows, "k string, sec long").coalesce(1).write.parquet(p)
        for root, _d, files in os.walk(p):
            for f_ in files:
                os.utime(os.path.join(root, f_), (1_000_000 + b, 1_000_000 + b))
    stream = (
        spark.readStream.schema("k string, sec long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/b*/*.parquet")
    )
    ded = (
        stream.withColumn("ts", F.timestamp_seconds("sec"))
        .withWatermark("ts", "60 seconds")
        .dropDuplicatesWithinWatermark(["k"])
    )
    emitted = []

    def sink(df, bid):
        emitted.extend((r["k"], r["sec"] - T0) for r in df.collect())

    q = (
        ded.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    kall = sorted(t for k, t in emitted if k == "kall")
    assert kall == [0, 400], f"dedup-state mechanics changed: {kall}"
    assert sorted(t for k, t in emitted if k.startswith("kwm")) == [
        0, 100, 200, 300, 400, 500]


def test_interval_overlap_pairs_edges(spark):
    """Bucket-join overlap vs brute force on adversarial geometry:
    endpoint touching (inclusive ends), nesting, identical intervals,
    bucket-boundary straddling, and cross-key isolation."""
    from streaming_cdc_spark.operators.temporal import interval_overlap_pairs

    rows = [
        # key, id, s, e
        ("a", 1, 0, 10),
        ("a", 2, 10, 20),    # touches 1 at day 10 -> overlap_len 1
        ("a", 3, 21, 30),    # gap of 1 from 2 -> no overlap
        ("a", 4, 5, 6),      # nested in 1
        ("a", 5, 0, 10),     # identical to 1
        ("a", 6, 13, 16),    # straddles bucket boundary (width 7: 13//7=1, 16//7=2)
        ("b", 7, 0, 100),    # other key: overlaps nobody in 'a'
    ]
    df = spark.createDataFrame(rows, "k string, iid long, s long, e long")
    got = {
        (r["k"], r["id_a"], r["id_b"]): r["overlap_len"]
        for r in interval_overlap_pairs(df, "k", "iid", "s", "e", 7).collect()
    }
    want = {}
    for i, (ka, ia, sa, ea) in enumerate(rows):
        for kb, ib, sb, eb in rows[i + 1:]:
            if ka == kb and sa <= eb and sb <= ea:
                lo, hi = sorted((ia, ib))
                want[(ka, lo, hi)] = min(ea, eb) - max(sa, sb) + 1
    assert got == want
    assert got[("a", 1, 2)] == 1          # endpoint touch
    assert got[("a", 1, 4)] == 2          # nested
    assert got[("a", 1, 5)] == 11         # identical
    assert ("a", 2, 3) not in got         # gap


def test_interval_overlap_reversed_interval_emits_nothing(spark):
    """r7 review finding: a degenerate (end < start) interval contains
    no point and must pair with nobody — without the guard, Spark
    sequence() counts DOWN through its buckets and the verify
    predicate passes it with NEGATIVE overlap_len."""
    from streaming_cdc_spark.operators.temporal import interval_overlap_pairs

    rows = [("a", 1, 10, 5), ("a", 2, 0, 20), ("a", 3, 6, 8)]
    df = spark.createDataFrame(rows, "k string, iid long, s long, e long")
    got = {
        (r["id_a"], r["id_b"]): r["overlap_len"]
        for r in interval_overlap_pairs(df, "k", "iid", "s", "e", 7).collect()
    }
    assert got == {(2, 3): 3}  # only the two real intervals pair


def test_stream_left_outer_null_emission_probe(spark, tmp_path):
    """Pins the three left-outer stream-stream join mechanics the
    streaming_outer_join oracle replays (probed on Spark 4.1):
    (1) an unmatched left row emits its NULL row iff the FINAL
    watermark passes its eviction point STRICTLY (cts + R < wm; a
    row whose eviction point equals the final watermark emits
    NOTHING), (2) matched rows never also emit a NULL row, (3) rows
    still in state at the end of the availableNow drain are silently
    discarded. If a Spark upgrade changes any rule this fails HERE
    with a named cause instead of an opaque oracle hash mismatch."""
    from pyspark.sql import functions as F

    from streaming_cdc_spark.session import write_mtime_pinned_splits

    R = 100

    def df(rows):
        return spark.createDataFrame(rows, "k long, sec long")

    # batch0 clicks: k1 evicts strictly before the final wm (4999 <
    # 5000), k2 exactly AT it (5000), k3 past it (5001), k4 matched;
    # batch1 advances both sides' max event time to 5000
    clk = [df([(1, 4899), (2, 4900), (3, 4901), (4, 4899)]), df([(99, 5000)])]
    buy = [df([(4, 4950)]), df([(98, 5000)])]
    base = str(tmp_path / "src")
    write_mtime_pinned_splits(clk, base + "/clk")
    write_mtime_pinned_splits(buy, base + "/buy")

    def rd(side):
        return (
            spark.readStream.schema("k long, sec long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/{side}/split_*/*.parquet")
            .withColumn("ts", F.timestamp_seconds("sec"))
            .withWatermark("ts", "0 seconds")
        )

    c = rd("clk").select(
        F.col("k").alias("ck"), F.col("ts").alias("cts"), F.col("sec").alias("csec")
    )
    b = rd("buy").select(
        F.col("k").alias("bk"), F.col("ts").alias("bts"), F.col("sec").alias("bsec")
    )
    j = c.join(
        b,
        (F.col("ck") == F.col("bk"))
        & (F.col("bts") >= F.col("cts"))
        & (F.col("bts") <= F.col("cts") + F.expr(f"INTERVAL {R} SECONDS")),
        "leftOuter",
    )
    emitted = []

    def sink(df_, bid):
        emitted.extend((r["ck"], r["csec"], r["bsec"]) for r in df_.collect())

    q = (
        j.select("ck", "csec", "bsec")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(emitted) == [
        (1, 4899, None),  # evict point 4999 < wm 5000: NULL row
        (4, 4899, 4950),  # matched: the pair, and no extra NULL row
        # k2 (evict point == wm) and k3 (past wm) and the batch-1
        # rows (k99 in state, k98 right-side) emit nothing
    ], f"left-outer emission mechanics changed: {sorted(emitted)}"


def test_stream_join_late_filter_lags_one_extra_batch(spark, tmp_path):
    """Pins the two-watermark mechanics (SPARK-24634) that make
    near-boundary late rows dangerous for stream-join oracles: the
    late-INPUT filter uses the PREVIOUS batch's watermark while state
    eviction uses the current one and runs AFTER the join — so a
    right row arriving below the current watermark (the buy at 1050
    arrives at batch 2 when the eviction watermark is already 3000)
    still joins a left row whose eviction point (1100) that same
    watermark has long passed. Holds for BOTH inner and leftOuter.
    This is why streaming_outer_join ships its late slice beyond
    every join window instead of 2000s back."""
    from pyspark.sql import functions as F

    from streaming_cdc_spark.session import write_mtime_pinned_splits

    R = 100

    def df(rows):
        return spark.createDataFrame(rows, "k long, sec long")

    clk = [df([(1, 1000)]), df([(9, 3000)]), df([])]
    buy = [df([]), df([(9, 3000)]), df([(1, 1050)])]
    for mode in ("inner", "leftOuter"):
        base = str(tmp_path / f"src_{mode}")
        write_mtime_pinned_splits(clk, base + "/clk")
        write_mtime_pinned_splits(buy, base + "/buy")

        def rd(side):
            return (
                spark.readStream.schema("k long, sec long")
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{base}/{side}/split_*/*.parquet")
                .withColumn("ts", F.timestamp_seconds("sec"))
                .withWatermark("ts", "0 seconds")
            )

        c = rd("clk").select(
            F.col("k").alias("ck"), F.col("ts").alias("cts"),
            F.col("sec").alias("csec"),
        )
        b = rd("buy").select(
            F.col("k").alias("bk"), F.col("ts").alias("bts"),
            F.col("sec").alias("bsec"),
        )
        j = c.join(
            b,
            (F.col("ck") == F.col("bk"))
            & (F.col("bts") >= F.col("cts"))
            & (F.col("bts") <= F.col("cts") + F.expr(f"INTERVAL {R} SECONDS")),
            mode,
        )
        emitted = []

        def sink(df_, bid):
            emitted.extend(
                (r["ck"], r["csec"], r["bsec"]) for r in df_.collect()
            )

        q = (
            j.select("ck", "csec", "bsec")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / f"ck_{mode}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert sorted(emitted) == [
            (1, 1000, 1050),  # the late buy matched the in-state click
            (9, 3000, 3000),
        ], f"{mode}: two-watermark late-filter mechanics changed: {sorted(emitted)}"


def test_evolving_dim_seen_by_later_batches(spark):
    # stream_static_enrich_evolving's whole point: dim rows appended
    # AFTER batch 0 must enrich batches 1-2. Held-out users
    # (user_id % 5 == 3) therefore appear BOTH under '(late-dim)'
    # (their batch-0 events) and under their real segment (their
    # later events) — the second part is impossible unless the
    # per-batch fresh dim read saw the appended rows.
    from pyspark.sql import functions as F

    from streaming_cdc_spark.queries.temporal import stream_static_enrich_evolving
    from streaming_cdc_spark.tables import load

    sf = "/root/testdata/sf0.001"
    res = stream_static_enrich_evolving(spark, sf).localCheckpoint()
    late = res.filter(F.col("segment") == "(late-dim)")
    assert late.count() > 0, "no batch-0 held-out events hit the sentinel"

    ev = load(spark, sf, "events").filter(F.col("value").isNotNull())
    lo, hi = ev.agg(F.min("event_id"), F.max("event_id")).first()
    step = (hi - lo + 3) // 3
    cust = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    # exact expected count of real-segment rows from held-out users'
    # batch-1/2 events, per (segment, type) — cross-check one total:
    # THE property: '(late-dim)' rows are EXACTLY the held-out users'
    # batch-0 events (a dim snapshot captured once pre-stream would
    # also bucket their batch-1/2 events there), and the real-segment
    # rows for held-out users are exactly their later events.
    held_b0 = ev.filter(
        (F.col("user_id") % 5 == 3) & (F.col("event_id") < lo + step)
    ).count()
    held_later = ev.filter(
        (F.col("user_id") % 5 == 3) & (F.col("event_id") >= lo + step)
    ).count()
    assert held_b0 > 0 and held_later > 0, "fixture geometry degenerate"
    assert late.agg(F.sum("n_events")).first()[0] == held_b0
    held_segs = {r.c_mktsegment for r in cust.filter(F.col("user_id") % 5 == 3)
                 .select("c_mktsegment").distinct().collect()}
    real_held = (
        res.filter(F.col("segment") != "(late-dim)")
        .join(
            ev.filter(F.col("user_id") % 5 == 3)
            .join(cust, "user_id")
            .filter(F.col("event_id") >= lo + step)
            .groupBy(F.col("c_mktsegment").alias("segment"), "event_type")
            .agg(F.count(F.lit(1)).alias("want")),
            ["segment", "event_type"],
        )
    )
    assert held_segs  # held-out users exist in the dim
    # every (segment, type) cell the held-out users' later events land
    # in must have at least that many real-segment rows in the result
    bad = real_held.filter(F.col("n_events") < F.col("want")).count()
    assert bad == 0
    # total event count must be conserved across the sentinel split
    assert (
        res.agg(F.sum("n_events")).first()[0] == ev.count()
    )


def test_sse_fixture_every_event_user_has_customer(spark):
    # BOTH stream-static enrichment queries lean on this invariant:
    # stream_static_enrich's inner join drops nothing, and the
    # evolving twin's '(late-dim)' sentinel means "dim row not yet
    # visible", never "user missing from the dim". Pin it so a
    # testdata regen that breaks referential integrity fails HERE
    # with a named cause (the rank_tie non-negativity convention).
    from pyspark.sql import functions as F

    from streaming_cdc_spark.tables import load

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = load(spark, sf, "events").select("user_id").distinct()
        cust = load(spark, sf, "customer").select(
            F.col("c_custkey").alias("user_id")
        )
        orphans = ev.join(cust, "user_id", "left_anti").count()
        assert orphans == 0, f"{sf}: {orphans} event users missing from customer"


def test_stream_full_outer_null_emission_probe(spark, tmp_path):
    """Pins the full-outer stream-stream mechanics the
    streaming_full_outer_join oracle replays (probed on Spark 4.1):
    left NULL rows follow the left-outer rule (cts + R < wm
    STRICTLY), right NULL rows emit iff the final watermark passes
    the buy's OWN event time strictly (bsec < wm; equality stays in
    state and emits nothing — the buy-side eviction point under the
    bts >= cts constraint is bts itself), matched rows never re-emit,
    end-of-drain state is discarded."""
    from pyspark.sql import functions as F

    from streaming_cdc_spark.session import write_mtime_pinned_splits

    R = 100

    def df(rows):
        return spark.createDataFrame(rows, "k long, sec long")

    clk = [df([(1, 4899), (4, 4899)]), df([(99, 5000)])]
    buy = [df([(4, 4950), (2, 4899), (5, 4999), (6, 5000), (7, 5001)]),
           df([(98, 5000)])]
    base = str(tmp_path / "src")
    write_mtime_pinned_splits(clk, base + "/clk")
    write_mtime_pinned_splits(buy, base + "/buy")

    def rd(side):
        return (
            spark.readStream.schema("k long, sec long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/{side}/split_*/*.parquet")
            .withColumn("ts", F.timestamp_seconds("sec"))
            .withWatermark("ts", "0 seconds")
        )

    c = rd("clk").select(
        F.col("k").alias("ck"), F.col("ts").alias("cts"), F.col("sec").alias("csec")
    )
    b = rd("buy").select(
        F.col("k").alias("bk"), F.col("ts").alias("bts"), F.col("sec").alias("bsec")
    )
    j = c.join(
        b,
        (F.col("ck") == F.col("bk"))
        & (F.col("bts") >= F.col("cts"))
        & (F.col("bts") <= F.col("cts") + F.expr(f"INTERVAL {R} SECONDS")),
        "fullOuter",
    )
    emitted = []

    def sink(df_, bid):
        emitted.extend(
            (r["ck"], r["csec"], r["bk"], r["bsec"]) for r in df_.collect()
        )

    q = (
        j.select("ck", "csec", "bk", "bsec")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(emitted, key=str) == [
        (1, 4899, None, None),   # left NULL: evict 4999 < wm 5000
        (4, 4899, 4, 4950),      # matched, no extra NULL rows
        (None, None, 2, 4899),   # right NULL: 4899 < 5000
        (None, None, 5, 4999),   # right NULL: 4999 < 5000
        # k6 (bsec == wm 5000), k7 (past), k99/k98 (state) emit nothing
    ], f"full-outer emission mechanics changed: {sorted(emitted, key=str)}"


def test_dynamic_gap_session_window_semantics(spark):
    """Pins the probed session_window rules dynamic_gap_sessions'
    oracle replays (the streaming_dedup_watermark precedent): the
    gap is a PER-EVENT expression, a boundary-EQUAL arrival MERGES
    (next ts == running max end), the window end is the running MAX
    of each event's own ts+gap, and a sub-gap arrival after a
    short-gap event still merges when a longer-gap EARLIER event's
    span covers it. A Spark upgrade flipping any rule fails here by
    name instead of as an opaque oracle hash mismatch."""
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def run(rows):
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
        gap = (
            F.when(F.col("event_type") == "click", F.lit("600 seconds"))
            .when(F.col("event_type") == "purchase", F.lit("3600 seconds"))
            .otherwise(F.lit("1200 seconds"))
        )
        out = (
            df.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "user_id",
                F.unix_micros("sw.start").alias("s"),
                F.unix_micros("sw.end").alias("e"),
                "n",
            )
            .collect()
        )
        return sorted((r["s"], r["e"], r["n"]) for r in out)

    us = lambda d: int(d.timestamp() * 1_000_000)  # noqa: E731

    # (1) boundary-equal MERGES: click at t0 (gap 600s), next event at
    # exactly t0+600s -> ONE session ending at the second event's span.
    got = run(
        [(1, t0, "click"), (1, t0 + dt.timedelta(seconds=600), "click")]
    )
    assert got == [
        (us(t0), us(t0 + dt.timedelta(seconds=1200)), 2)
    ], got

    # (2) one tick past the boundary SPLITS.
    got = run(
        [(1, t0, "click"), (1, t0 + dt.timedelta(seconds=600, microseconds=1), "click")]
    )
    assert len(got) == 2 and got[0][2] == 1 and got[1][2] == 1, got

    # (3) the gap is PER-EVENT: a purchase at t0 (gap 3600s) absorbs a
    # click 2000s later that a click-gap session would have split from;
    # the end is the running MAX of per-event spans (purchase's span
    # t0+3600 covers beyond the click's own t0+2600).
    got = run(
        [(1, t0, "purchase"), (1, t0 + dt.timedelta(seconds=2000), "click")]
    )
    assert got == [
        (us(t0), us(t0 + dt.timedelta(seconds=3600)), 2)
    ], got
