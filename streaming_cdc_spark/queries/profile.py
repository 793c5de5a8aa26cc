"""Data-quality queries: table profiling + declarative constraint
validation over the TPC-H-ish tables (the Deequ slice)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_cdc_spark.operators import profile as P
from streaming_cdc_spark.queries.registry import query
from streaming_cdc_spark.tables import load

_PROFILE_COLS = [
    "l_discount",
    "l_orderkey",
    "l_partkey",
    "l_quantity",
    "l_returnflag",
    "l_suppkey",
]

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
        CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM lineitem"""
    for c in _PROFILE_COLS
)


@query("column_profile", oracle=_PROFILE_ORACLE)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column health profile of lineitem — row count, null count,
    exact distinct count for six columns — in ONE aggregate pass
    (multi-distinct plans through a single Expand stage; the result
    is one row unpivoted to one row per column, so nothing
    data-sized ever leaves the executors)."""
    li = load(spark, sf_dir, "lineitem")
    return P.column_profile(li, _PROFILE_COLS)


@query(
    "constraint_checks",
    oracle="""
    SELECT check_name, n_violations, n_violations = 0 AS passed FROM (
    SELECT 'l_quantity_positive' AS check_name,
           CAST(SUM(CASE WHEN NOT coalesce(l_quantity > 0, FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity_max_30',
           CAST(SUM(CASE WHEN NOT coalesce(l_quantity <= 30, FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount_range',
           CAST(SUM(CASE WHEN NOT coalesce(l_discount BETWEEN 0 AND 1, FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag_domain',
           CAST(SUM(CASE WHEN NOT coalesce(l_returnflag IN ('A','N','R'), FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_pk_unique',
           CAST(COUNT(CASE WHEN l_orderkey IS NOT NULL
                            AND l_linenumber IS NOT NULL THEN 1 END)
                - COUNT(DISTINCT CASE WHEN l_orderkey IS NOT NULL
                                       AND l_linenumber IS NOT NULL
                        THEN struct_pack(k1 := l_orderkey,
                                         k2 := l_linenumber) END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_orderkey_unique',
           CAST(COUNT(l_orderkey) - COUNT(DISTINCT l_orderkey) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_orderkey_fk', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey)
    )
    """,
)
def constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative table constraints over lineitem: row predicates
    (positivity, a deliberately-failing quantity cap so both passed
    branches appear, range, domain membership), key uniqueness (the
    real PK passes, bare l_orderkey fails — multi-line orders), and
    referential integrity against orders (one anti-join). Row
    predicates and uniqueness share ONE aggregate pass; the oracle
    recomputes every check independently. Output sorted upstream by
    the driver's canonicalization; passed = n_violations == 0."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    return P.constraint_checks(
        li,
        checks=[
            ("l_quantity_positive", F.col("l_quantity") > 0),
            ("l_quantity_max_30", F.col("l_quantity") <= 30),
            ("l_discount_range", (F.col("l_discount") >= 0) & (F.col("l_discount") <= 1)),
            ("l_returnflag_domain", F.col("l_returnflag").isin("A", "N", "R")),
        ],
        unique=[
            ("l_pk_unique", ["l_orderkey", "l_linenumber"]),
            ("l_orderkey_unique", ["l_orderkey"]),
        ],
        fk=[("l_orderkey_fk", orders, "l_orderkey", "o_orderkey")],
    )


_BENFORD_P = [
    (1, 0.301030), (2, 0.176091), (3, 0.124939), (4, 0.096910),
    (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153),
    (9, 0.045757),
]

_BENFORD_ORACLE = f"""
    WITH c AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders WHERE o_totalprice > 0
    ),
    d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM c),
    o AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM d),
    exp AS (
      SELECT * FROM (VALUES {", ".join(f"({d}, {p})" for d, p in _BENFORD_P)})
        AS v(digit, p_benford)
    )
    SELECT CAST(e.digit AS BIGINT) AS digit,
           COALESCE(o.n_obs, CAST(0 AS BIGINT)) AS n_obs,
           ROUND(CAST(COALESCE(o.n_obs, 0) AS DOUBLE) / CAST(t.total AS DOUBLE),
                 6) AS p_obs_r,
           CAST(e.p_benford AS DOUBLE) AS p_benford,
           ROUND(CAST(COALESCE(o.n_obs, 0) AS DOUBLE) / CAST(t.total AS DOUBLE)
                 - CAST(e.p_benford AS DOUBLE), 6) AS dev_r
    FROM exp e LEFT JOIN o ON e.digit = o.digit CROSS JOIN t
"""


@query("benford_digit_profile", oracle=_BENFORD_ORACLE)
def benford_digit_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit profile of order totals — the
    classic anomaly/fabrication screen for financial columns (Deequ-
    style data-quality family next to column_profile). The digit is
    taken from EXACT CENTS (DECIMAL(18,2) * 100 -> BIGINT, so no
    float-to-string formatting divergence can pick a different
    leading digit), counted per 1-9, left-joined onto the 9-row
    expected table so digits with zero observations still emit, and
    compared against the Benford proportions as FIXED 6dp LITERALS
    on both engines (log10(1+1/d) is never computed at query time —
    ln/log are not bit-identical across engines; the no-ln rule).
    p_obs and the deviation are single fixed-order double
    expressions over exact integers, rounded 6dp. One scan + one
    9-row aggregate; the grand total rides a one-row broadcast
    (BNLJ-whitelisted like value_histogram_bins). The synthetic
    uniform-ish prices deviate from Benford — the deviation column
    IS the signal, not a failure."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = orders.select(
        F.substring(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .cast("string"),
            1,
            1,
        )
        .cast("long")
        .alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    tot = d.agg(F.count(F.lit(1)).cast("long").alias("total"))
    exp = spark.createDataFrame(_BENFORD_P, "digit long, p_benford double")
    nobs = F.coalesce(F.col("n_obs"), F.lit(0).cast("long"))
    p_obs = nobs.cast("double") / F.col("total").cast("double")
    return (
        exp.join(obs, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            nobs.alias("n_obs"),
            F.round(p_obs, 6).alias("p_obs_r"),
            "p_benford",
            F.round(p_obs - F.col("p_benford"), 6).alias("dev_r"),
        )
    )


_KANON_ORACLE = """
    WITH qi AS (
      SELECT c_mktsegment AS segment,
             c_nationkey AS nation,
             (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
               + 100000) // 100000 AS bal_band,
             c_custkey
      FROM customer
    ),
    g AS (
      SELECT segment, nation, bal_band,
             CAST(COUNT(*) AS BIGINT) AS grp_n
      FROM qi GROUP BY 1, 2, 3
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN grp_n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS risky_groups,
           CAST(SUM(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS BIGINT)
             AS risky_rows,
           CAST(MIN(grp_n) AS BIGINT) AS min_group,
           CAST(MAX(grp_n) AS BIGINT) AS max_group
    FROM g GROUP BY segment
"""


@query("k_anonymity_risk", oracle=_KANON_ORACLE)
def k_anonymity_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY RISK PROFILE — the privacy/compliance audit every
    dataset release pipeline runs before publishing: group rows by
    their QUASI-IDENTIFIER tuple (market segment, nation, account-
    balance band — the classic linkable attributes) and report, per
    segment, how many QI groups fall below k=5 and how many ROWS sit
    in those re-identifiable groups. Bands come from exact cents
    with the label_centroid_outliers NON-NEGATIVITY SHIFT (+100000
    cents covers the fixture's [-999.99, ...] balance floor) before
    the integer division: acctbal IS negative in the fixture, and
    while DuckDB's `//` happens to truncate like Spark's `div` on
    BIGINT operands, the shift makes band assignment floor/truncate-
    agnostic by construction instead of by engine coincidence
    (shift-invariant grouping: +1 to every band label). Two keyed
    aggregates, both map-side combining; linear at any scale (the
    QI-group relation is the only shuffle)."""
    cust = load(spark, sf_dir, "customer")
    qi = cust.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation"),
        F.expr(
            "(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " + 100000) div 100000"
        ).alias("bal_band"),
    )
    g = qi.groupBy("segment", "nation", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("grp_n")
    )
    return g.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("grp_n") < 5, 1).otherwise(0))
        .cast("long")
        .alias("risky_groups"),
        F.sum(F.when(F.col("grp_n") < 5, F.col("grp_n")).otherwise(0))
        .cast("long")
        .alias("risky_rows"),
        F.min("grp_n").cast("long").alias("min_group"),
        F.max("grp_n").cast("long").alias("max_group"),
    )


_FKPROF_ORACLE = """
    WITH pairs AS (
      SELECT 'events.user_id->customer.c_custkey' AS pair,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_child,
             CAST(COUNT(DISTINCT CASE WHEN user_id IN
               (SELECT c_custkey FROM customer) THEN user_id END)
               AS BIGINT) AS n_matched
      FROM events
      UNION ALL
      SELECT 'orders.o_custkey->customer.c_custkey',
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
             CAST(COUNT(DISTINCT CASE WHEN o_custkey IN
               (SELECT c_custkey FROM customer) THEN o_custkey END)
               AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'lineitem.l_orderkey->orders.o_orderkey',
             CAST(COUNT(DISTINCT l_orderkey) AS BIGINT),
             CAST(COUNT(DISTINCT CASE WHEN l_orderkey IN
               (SELECT o_orderkey FROM orders) THEN l_orderkey END)
               AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'events.event_id->customer.c_custkey',
             CAST(COUNT(DISTINCT event_id) AS BIGINT),
             CAST(COUNT(DISTINCT CASE WHEN event_id IN
               (SELECT c_custkey FROM customer) THEN event_id END)
               AS BIGINT)
      FROM events
    )
    SELECT pair, n_child, n_matched,
           ROUND(CAST(n_matched AS DOUBLE) / CAST(n_child AS DOUBLE), 6)
             AS containment_r
    FROM pairs
"""


@query("fk_candidate_profile", oracle=_FKPROF_ORACLE)
def fk_candidate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOREIGN-KEY DISCOVERY PROFILE — the schema-inference pass a
    data catalog runs over an unfamiliar lake: for candidate
    (child column -> parent column) pairs, the INCLUSION COEFFICIENT
    |distinct(child) ∩ parent| / |distinct(child)| — 1.0 means the
    pair satisfies referential integrity (an FK candidate), low
    values reject it (the fourth pair, event_id -> c_custkey, is the
    planted NEGATIVE control: ids that overlap only by numeric
    coincidence). Physical per pair: distinct on the child column
    (map-side partial), then a LEFT SEMI join against the parent key
    — matching stays key-only (never row payloads), so at 100 TB
    each pair costs one narrow distinct + one key-to-key semi join.
    Join strategy is LEFT TO CATALYST: dimension parents broadcast,
    but the lineitem -> orders pair is fact-to-fact and must be
    allowed to shuffle (a forced broadcast would OOM at scale). The
    counts land as planning scalars (4 pairs x 2 longs); the ratio
    is rounded IN-ENGINE on both sides (Python round() is
    half-even, SQL ROUND is half-away — the registry float rule)."""
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    def prof(name: str, child, ccol: str, parent, pcol: str):
        # NULL child keys are EXCLUDED to match the oracle's
        # COUNT(DISTINCT col) semantics — Spark's distinct().count()
        # would count a NULL key and silently diverge if a testdata
        # regen ever introduces NULLs in a child column (review r8).
        # LAZY checkpoint (optimization r9): the count right below is
        # the materializing action, so each pair probe pays one fewer
        # sequential driver job; the semi-join count reads the cache.
        d = (
            child.select(F.col(ccol).alias("k"))
            .filter(F.col("k").isNotNull())
            .distinct()
            .localCheckpoint(eager=False)
        )
        n_child = d.count()
        n_matched = d.join(
            parent.select(F.col(pcol).alias("k")), "k", "left_semi"
        ).count()
        return (name, n_child, n_matched)

    # The four pairs are independent planning probes — run them as
    # concurrent jobs (the progressive-resolver publish pattern) so
    # the 8 counts overlap instead of serializing.
    from concurrent.futures import ThreadPoolExecutor

    specs = [
        ("events.user_id->customer.c_custkey", ev, "user_id", cust, "c_custkey"),
        ("orders.o_custkey->customer.c_custkey", orders, "o_custkey", cust,
         "c_custkey"),
        ("lineitem.l_orderkey->orders.o_orderkey", li, "l_orderkey",
         orders.select("o_orderkey"), "o_orderkey"),
        ("events.event_id->customer.c_custkey", ev, "event_id", cust,
         "c_custkey"),
    ]
    with ThreadPoolExecutor(max_workers=4) as pool:
        rows = list(pool.map(lambda s: prof(*s), specs))
    return spark.createDataFrame(
        rows, "pair string, n_child long, n_matched long"
    ).select(
        "pair",
        "n_child",
        "n_matched",
        F.round(
            F.col("n_matched").cast("double") / F.col("n_child").cast("double"), 6
        ).alias("containment_r"),
    )


_LDIV_ORACLE = """
    WITH o AS (
      SELECT c.c_nationkey AS nation,
             strftime(o.o_orderdate, '%Y-%m') AS ym,
             o.o_orderpriority AS sensitive
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    g AS (
      SELECT nation, ym,
             CAST(COUNT(*) AS BIGINT) AS grp_n,
             CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l
      FROM o GROUP BY 1, 2
    )
    SELECT nation,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS risky_groups,
           CAST(SUM(CASE WHEN l < 3 THEN grp_n ELSE 0 END) AS BIGINT)
             AS risky_rows,
           CAST(MIN(l) AS BIGINT) AS min_l
    FROM g GROUP BY nation
"""


@query("l_diversity_risk", oracle=_LDIV_ORACLE)
def l_diversity_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-DIVERSITY AUDIT — k_anonymity_risk's sibling and the second
    half of the release-pipeline privacy battery: a QI group that
    passes k-anonymity still leaks if its SENSITIVE attribute is
    homogeneous (everyone in the group shares one value). QI =
    (customer nation, order month), sensitive = order priority; per
    nation: how many QI groups have l = COUNT(DISTINCT sensitive)
    < 3, and how many rows sit in them. Month emitted as a STRING on
    both sides (the orders_by_month DATE-fetch rule). Physical: one
    broadcast dim join (customer keys) + two map-side-combining
    aggregates — linear, one QI-group shuffle, same shape as
    k_anonymity_risk."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nation"),
    )
    o = orders.join(F.broadcast(cust), "o_custkey").select(
        "nation",
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.col("o_orderpriority").alias("sensitive"),
    )
    g = o.groupBy("nation", "ym").agg(
        F.count(F.lit(1)).cast("long").alias("grp_n"),
        F.countDistinct("sensitive").cast("long").alias("l"),
    )
    return g.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("l") < 3, 1).otherwise(0))
        .cast("long")
        .alias("risky_groups"),
        F.sum(F.when(F.col("l") < 3, F.col("grp_n")).otherwise(0))
        .cast("long")
        .alias("risky_rows"),
        F.min("l").cast("long").alias("min_l"),
    )


_TCLOSE_ORACLE = """
    WITH o AS (
      SELECT c.c_nationkey AS nation,
             strftime(o.o_orderdate, '%Y-%m') AS ym,
             o.o_orderpriority AS s
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    gs AS (
      SELECT nation, ym, s, CAST(COUNT(*) AS BIGINT) AS n_gs
      FROM o GROUP BY 1, 2, 3
    ),
    g AS (
      SELECT nation, ym, CAST(SUM(n_gs) AS BIGINT) AS n_g
      FROM gs GROUP BY 1, 2
    ),
    sv AS (SELECT s, CAST(SUM(n_gs) AS BIGINT) AS n_s FROM gs GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_gs) AS BIGINT) AS n_tot FROM gs),
    adj AS (
      SELECT gs.nation, gs.ym,
             SUM(ABS(CAST(gs.n_gs AS DECIMAL(18,0))
                       * CAST(t.n_tot AS DECIMAL(18,0))
                     - CAST(sv.n_s AS DECIMAL(18,0))
                       * CAST(g.n_g AS DECIMAL(18,0)))
                 - CAST(sv.n_s AS DECIMAL(18,0))
                   * CAST(g.n_g AS DECIMAL(18,0))) AS adj
      FROM gs
      JOIN sv USING (s)
      JOIN g ON gs.nation = g.nation AND gs.ym = g.ym, tot t
      GROUP BY 1, 2
    ),
    tvd AS (
      SELECT a.nation,
             CAST(a.adj + CAST(t.n_tot AS DECIMAL(18,0))
                            * CAST(g.n_g AS DECIMAL(18,0)) AS DOUBLE)
               / (CAST(2 AS DOUBLE) * CAST(g.n_g AS DOUBLE)
                  * CAST(t.n_tot AS DOUBLE)) AS tvd
      FROM adj a JOIN g ON a.nation = g.nation AND a.ym = g.ym, tot t
    )
    SELECT nation,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN tvd > 0.35 THEN 1 ELSE 0 END) AS BIGINT)
             AS risky_groups,
           ROUND(MAX(tvd), 6) AS max_tvd
    FROM tvd GROUP BY nation
"""


@query("t_closeness_risk", oracle=_TCLOSE_ORACLE)
def t_closeness_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-CLOSENESS AUDIT — the third leg of the release-pipeline
    privacy battery (k_anonymity_risk / l_diversity_risk / here): a
    QI group passes k-anonymity AND l-diversity yet still leaks if
    its sensitive-value DISTRIBUTION diverges from the corpus-wide
    one (an attacker learns "this group skews URGENT"). Distance is
    TOTAL VARIATION — chosen over the paper's EMD/KL exactly like
    ari_score chose Rand over NMI: TVD has NO ln() and reduces to
    EXACT INTEGERS. Per group g: TVD = sum_s |n_gs/n_g - n_s/N| / 2
    = (N*n_g + sum_{s present}(|n_gs*N - n_s*n_g| - n_s*n_g))
      / (2*n_g*N)
    — the absent-sensitive-value terms (sum_s n_s = N) telescope
    into the N*n_g constant, so NO group x sensitive cross join is
    ever built; only PRESENT (g,s) cells are touched. Products run
    in DECIMAL(18,0) (a 1e7-row cell times a 1e12-row corpus
    overflows BIGINT), the cross-cell reduction is an exact DECIMAL
    SUM (order-free), and the single double division per group is
    identical-expression-order on both engines (CAST(2 AS DOUBLE) —
    never bare 2.0, which DuckDB types DECIMAL and quantizes). The
    0.35 threshold splits the sf0.01 fixture ~40/60 (median group
    TVD 0.299), so both CASE branches are exercised. Physical: one
    broadcast dim join, the (nation,ym,s) cell relation
    localCheckpointed (3 downstream references), N as a planning
    scalar, the 5-row sensitive-marginal broadcast — one QI-cell
    shuffle total, linear at any scale."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nation"),
    )
    o = orders.join(F.broadcast(cust), "o_custkey").select(
        "nation",
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.col("o_orderpriority").alias("s"),
    )
    # LAZY checkpoint (optimization r9): the n_tot planning collect
    # right below materializes it, so the query pays one sequential
    # driver job here instead of two; the three downstream references
    # read the cached RDD either way.
    gs = (
        o.groupBy("nation", "ym", "s")
        .agg(F.count(F.lit(1)).cast("long").alias("n_gs"))
        .localCheckpoint(eager=False)
    )
    n_tot = int(gs.agg(F.sum("n_gs")).collect()[0][0])
    g = gs.groupBy("nation", "ym").agg(
        F.sum("n_gs").cast("long").alias("n_g")
    )
    sv = gs.groupBy("s").agg(F.sum("n_gs").cast("long").alias("n_s"))
    dec = lambda c: c.cast("decimal(18,0)")  # noqa: E731
    ntot_d = dec(F.lit(n_tot))
    adj = (
        gs.join(F.broadcast(sv), "s")
        .join(g, ["nation", "ym"])
        .select(
            "nation",
            "ym",
            (
                F.abs(
                    dec(F.col("n_gs")) * ntot_d
                    - dec(F.col("n_s")) * dec(F.col("n_g"))
                )
                - dec(F.col("n_s")) * dec(F.col("n_g"))
            ).alias("term"),
        )
        .groupBy("nation", "ym")
        .agg(F.sum("term").alias("adj"))
    )
    tvd = adj.join(g, ["nation", "ym"]).select(
        "nation",
        (
            (F.col("adj") + ntot_d * dec(F.col("n_g"))).cast("double")
            / (
                F.lit(2).cast("double")
                * F.col("n_g").cast("double")
                * F.lit(n_tot).cast("double")
            )
        ).alias("tvd"),
    )
    return tvd.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("tvd") > 0.35, 1).otherwise(0))
        .cast("long")
        .alias("risky_groups"),
        F.round(F.max("tvd"), 6).alias("max_tvd"),
    )


_GINI_ORACLE = """
    WITH o AS (
      SELECT c.c_mktsegment AS segment, o.o_orderpriority AS label
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    gs AS (
      SELECT segment, label, CAST(COUNT(*) AS BIGINT) AS n_i
      FROM o GROUP BY 1, 2
    ),
    agg AS (
      SELECT segment,
             CAST(SUM(n_i) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_labels,
             SUM(CAST(n_i AS DECIMAL(18,0)) * CAST(n_i AS DECIMAL(18,0)))
               AS ssq
      FROM gs GROUP BY 1
    )
    SELECT segment, n, n_labels,
           ROUND(
             CAST(CAST(n AS DECIMAL(18,0)) * CAST(n AS DECIMAL(18,0))
                  - ssq AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)),
             6
           ) AS gini_r
    FROM agg
"""


@query("segment_gini_impurity", oracle=_GINI_ORACLE)
def segment_gini_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI IMPURITY / SIMPSON CONCENTRATION per segment — the
    ln-free label-concentration metric (decision-tree split quality,
    market-concentration HHI's complement): per market segment over
    its orders' priority labels, gini = 1 - sum_i p_i^2
    = (n^2 - sum_i n_i^2) / n^2 — EXACT integer numerator (the
    ari_score no-ln rule: entropy needs ln and is not bit-identical
    across engines; Gini is pure arithmetic), squares in
    DECIMAL(18,0) (a 1e10-row label cell squared overflows BIGINT),
    one identical-order double division per segment, rounded 6dp.
    Physical: broadcast dim join + two map-side-combining keyed
    aggregates (cells, then segments) — one narrow shuffle of the
    (segment,label) cell relation, linear at any scale."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    o = orders.join(F.broadcast(cust), "o_custkey").select(
        "segment", F.col("o_orderpriority").alias("label")
    )
    gs = o.groupBy("segment", "label").agg(
        F.count(F.lit(1)).cast("long").alias("n_i")
    )
    ni_d = F.col("n_i").cast("decimal(18,0)")
    agg = gs.groupBy("segment").agg(
        F.sum("n_i").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_labels"),
        F.sum(ni_d * ni_d).alias("ssq"),
    )
    n_d = F.col("n").cast("decimal(18,0)")
    return agg.select(
        "segment",
        "n",
        "n_labels",
        F.round(
            (n_d * n_d - F.col("ssq")).cast("double")
            / (F.col("n").cast("double") * F.col("n").cast("double")),
            6,
        ).alias("gini_r"),
    )


_GDPR_ORACLE = """
    WITH forget AS (
      SELECT c_custkey FROM customer
      WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal < 0
    ),
    del_orders AS (
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM forget)
    )
    SELECT 'customer' AS tbl,
           CAST(COUNT(CASE WHEN c_custkey IN (SELECT c_custkey FROM forget)
                           THEN 1 END) AS BIGINT) AS n_delete,
           CAST(COUNT(CASE WHEN c_custkey IS NULL OR c_custkey NOT IN
                           (SELECT c_custkey FROM forget)
                           THEN 1 END) AS BIGINT) AS n_keep,
           CAST(COALESCE(SUM(CASE WHEN c_custkey IN
                             (SELECT c_custkey FROM forget)
                             THEN c_custkey END), 0) AS BIGINT) AS del_id_sum
    FROM customer
    UNION ALL
    SELECT 'orders',
           CAST(COUNT(CASE WHEN o_custkey IN (SELECT c_custkey FROM forget)
                           THEN 1 END) AS BIGINT),
           CAST(COUNT(CASE WHEN o_custkey IS NULL OR o_custkey NOT IN
                           (SELECT c_custkey FROM forget)
                           THEN 1 END) AS BIGINT),
           CAST(COALESCE(SUM(CASE WHEN o_custkey IN
                             (SELECT c_custkey FROM forget)
                             THEN o_orderkey END), 0) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem',
           CAST(COUNT(CASE WHEN l_orderkey IN
                           (SELECT o_orderkey FROM del_orders)
                           THEN 1 END) AS BIGINT),
           CAST(COUNT(CASE WHEN l_orderkey IS NULL OR l_orderkey NOT IN
                           (SELECT o_orderkey FROM del_orders)
                           THEN 1 END) AS BIGINT),
           CAST(COALESCE(SUM(CASE WHEN l_orderkey IN
                             (SELECT o_orderkey FROM del_orders)
                             THEN l_orderkey END), 0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'events',
           CAST(COUNT(CASE WHEN user_id IN (SELECT c_custkey FROM forget)
                           THEN 1 END) AS BIGINT),
           CAST(COUNT(CASE WHEN user_id IS NULL OR user_id NOT IN
                           (SELECT c_custkey FROM forget)
                           THEN 1 END) AS BIGINT),
           CAST(COALESCE(SUM(CASE WHEN user_id IN
                             (SELECT c_custkey FROM forget)
                             THEN event_id END), 0) AS BIGINT)
    FROM events
"""


@query("deletion_propagation_audit", oracle=_GDPR_ORACLE)
def deletion_propagation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-TO-BE-FORGOTTEN CASCADE AUDIT — the operational leg of
    the privacy battery (the k/l/t audits say what leaks; this plans
    the enforcement): given an ATTRIBUTE-defined forget set
    (AUTOMOBILE customers with negative balance — deliberately not
    key arithmetic, so child tables genuinely need the joins), walk
    the FK graph (orders by custkey, lineitem transitively by the
    deleted orders' keys, events by user id) and report, per table,
    exactly how many rows the cascade deletes and keeps, plus an
    exact id-sum WITNESS over the deleted rows (the
    stratified_sample_counts membership pattern — the hash pins
    WHICH rows, not just how many). Physical: each table takes ONE
    pass — a LEFT flag-join against the KEY-UNIQUE forget set (both
    keysets are primary keys by construction, so the outer join
    cannot duplicate rows; a semi+anti pair would scan the fact
    twice) followed by one flag aggregate. The forget keyset is a
    dim fraction (broadcast-eligible, left to Catalyst/AQE); the
    transitive lineitem step probes the deleted-ORDERS keyset, which
    is fact-scale and must be allowed to shuffle at 100 TB. Counts
    and sums are exact BIGINTs. The oracle's NOT IN branches carry
    an explicit IS NULL escape: a NULL child key joins nothing on
    the Spark side (kept), while bare NOT IN would classify it
    into NEITHER bucket (review r9)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    ev = load(spark, sf_dir, "events")

    # LAZY checkpoints (optimization r9): nothing here needs a driver
    # value before the final unioned plan, so the two eager driver
    # jobs this query used to run at build time fold into the single
    # final action (the checkpointed RDDs are cached at first compute;
    # a concurrent-branch duplicate compute of the tiny forget filter
    # costs at most what the un-checkpointed form always paid).
    forget = (
        cust.filter(
            (F.col("c_mktsegment") == "AUTOMOBILE") & (F.col("c_acctbal") < 0)
        )
        .select(F.col("c_custkey").alias("fk"))
        .localCheckpoint(eager=False)
    )

    def audit(df: DataFrame, name: str, key: str, idc: str, keyset) -> DataFrame:
        flagged = df.join(
            keyset.withColumnRenamed(keyset.columns[0], "__fk").withColumn(
                "__hit", F.lit(1)
            ),
            df[key] == F.col("__fk"),
            "left",
        )
        hit = F.col("__hit").isNotNull()
        return flagged.agg(
            F.lit(name).alias("tbl"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_delete"),
            F.sum(F.when(hit, 0).otherwise(1)).cast("long").alias("n_keep"),
            F.coalesce(F.sum(F.when(hit, F.col(idc))), F.lit(0))
            .cast("long")
            .alias("del_id_sum"),
        )

    del_orders = (
        orders.join(forget, orders["o_custkey"] == forget["fk"], "left_semi")
        .select(F.col("o_orderkey").alias("dok"))
        .localCheckpoint(eager=False)
    )
    return (
        audit(cust, "customer", "c_custkey", "c_custkey", forget)
        .unionAll(audit(orders, "orders", "o_custkey", "o_orderkey", forget))
        .unionAll(audit(li, "lineitem", "l_orderkey", "l_orderkey", del_orders))
        .unionAll(audit(ev, "events", "user_id", "event_id", forget))
    )


from streaming_cdc_spark.functions.hashing import md5_long_sql

def _pseud_sql(k: str) -> str:
    """DuckDB rendering of the surrogate — ALWAYS via md5_long_sql so
    a change to the 60-bit hash updates both engines together
    (review r9: an inline copy would silently pin this oracle to the
    old formula)."""
    return md5_long_sql(f"CAST({k} AS VARCHAR)", salt="pseud|")

_PSEUD_ORACLE = f"""
    WITH pairs AS (
      SELECT 'customer' AS tbl, c_custkey AS k,
             {_pseud_sql("c_custkey")} AS p
      FROM customer
      UNION ALL
      SELECT 'orders', o_custkey, {_pseud_sql("o_custkey")}
      FROM orders
      UNION ALL
      SELECT 'events', user_id, {_pseud_sql("user_id")}
      FROM events
    )
    SELECT tbl,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys,
           CAST(COUNT(DISTINCT p) AS BIGINT) AS n_pseudo,
           CAST(bit_xor(DISTINCT p) AS BIGINT) AS pseudo_checksum
    FROM pairs GROUP BY tbl
    UNION ALL
    SELECT 'all',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT k) AS BIGINT),
           CAST(COUNT(DISTINCT p) AS BIGINT),
           CAST(bit_xor(DISTINCT p) AS BIGINT)
    FROM pairs
"""


@query("pseudonymize_consistent", oracle=_PSEUD_ORACLE)
def pseudonymize_consistent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REFERENTIALLY-CONSISTENT PSEUDONYMIZATION AUDIT — the
    privacy-engineering twin of deletion_propagation_audit: replace
    the user key everywhere with a deterministic surrogate
    p = md5_long('pseud|' || key) and PROVE, per table and corpus-
    wide, that the mapping is (a) INJECTIVE on the key domain
    (n_pseudo == n_keys — a 60-bit collision would break joins
    post-pseudonymization; this is the md5 injectivity pin made a
    driver-verified output, the test_dedup precedent) and
    (b) CONSISTENT across tables (the 'all' row's corpus-wide
    distinct-pseudonym count equals its distinct-key count — the
    same key never maps two ways, so FK joins still work on
    surrogates). pseudo_checksum = bit_xor over the DISTINCT
    surrogate set: order-free, overflow-free (a SUM of raw 60-bit
    surrogates overflows BIGINT past ~15 keys), and DISTINCT-aware
    on both engines — it pins WHICH surrogates exist, not just how
    many. Physical: ONE multi-distinct aggregate pass per table plus
    one corpus-wide pass (each a single Expand over a key-only
    projection — nothing row-sized shuffles); the pseudonym itself
    is one JVM-side md5 projection, the same per-row cost the
    minhash family already pays at scale. Four one-row results union
    on the driver side of the agg — no scalar joins (a one-row
    tbl-literal equi-join constant-folds to an unwhitelisted
    BroadcastNestedLoopJoin; audit_plans caught the first draft)."""
    from streaming_cdc_spark.functions.hashing import md5_long

    def pairs(df: DataFrame, name: str, key: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("tbl"),
            F.col(key).alias("k"),
            md5_long(F.col(key).cast("string"), salt="pseud|").alias("p"),
        )

    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    ev = load(spark, sf_dir, "events")
    # LAZY checkpoint (optimization r9): both consumers live in the
    # single final plan — materialization rides that action instead of
    # paying an eager driver job at build time.
    allp = (
        pairs(cust, "customer", "c_custkey")
        .unionAll(pairs(orders, "orders", "o_custkey"))
        .unionAll(pairs(ev, "events", "user_id"))
        .localCheckpoint(eager=False)
    )

    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("k").cast("long").alias("n_keys"),
        F.countDistinct("p").cast("long").alias("n_pseudo"),
        F.expr("bit_xor(DISTINCT p)").cast("long").alias("pseudo_checksum"),
    ]
    # one keyed pass for the three per-table rows + one global pass —
    # not a filtered pass per table (review r9: 3x redundant scans)
    per_tbl = allp.groupBy("tbl").agg(*aggs)
    alls = allp.agg(F.lit("all").alias("tbl"), *aggs)
    return per_tbl.unionAll(alls)


_RELEASE_ORACLE = f"""
    SELECT 'k_anonymity' AS step,
           CAST(SUM(risky_groups) AS BIGINT) AS n_flagged,
           CAST(SUM(risky_rows) AS BIGINT) AS witness
    FROM ({_KANON_ORACLE})
    UNION ALL
    SELECT 'l_diversity',
           CAST(SUM(risky_groups) AS BIGINT),
           CAST(SUM(risky_rows) AS BIGINT)
    FROM ({_LDIV_ORACLE})
    UNION ALL
    SELECT 't_closeness',
           CAST(SUM(risky_groups) AS BIGINT),
           CAST(SUM(n_groups) AS BIGINT)
    FROM ({_TCLOSE_ORACLE})
    UNION ALL
    SELECT 'deletion_cascade',
           CAST(SUM(n_delete) AS BIGINT),
           CAST(SUM(del_id_sum) AS BIGINT)
    FROM ({_GDPR_ORACLE})
    UNION ALL
    SELECT 'pseudonymization',
           CAST(n_keys - n_pseudo AS BIGINT),
           n_keys
    FROM ({_PSEUD_ORACLE}) WHERE tbl = 'all'
"""


@query("privacy_release_manifest", oracle=_RELEASE_ORACLE)
def privacy_release_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRIVACY RELEASE MANIFEST — the pipeline_manifest pattern
    applied to the privacy battery: the whole release gate
    (k-anonymity -> l-diversity -> t-closeness -> deletion cascade
    -> pseudonymization) COMPOSED into one five-row manifest under
    ONE oracle, so the driver hash verifies the composition, not
    just the parts. Each step is literally the registered query
    (this function CALLS k_anonymity_risk et al. and reduces their
    outputs; the oracle nests the same five oracle strings as
    subqueries) — any drift between a part and its use inside the
    release pipeline fails here first. Rows: (step, n_flagged,
    witness) — flagged QI groups + re-identifiable rows for the
    three audits, cascade delete total + the deleted-id-sum witness
    for enforcement, and injectivity violations (expected 0) + the
    corpus key count for pseudonymization. Physical: five
    independent aggregate pipelines unioned — each linear per its
    own docstring; nothing new moves."""
    ka = k_anonymity_risk(spark, sf_dir).agg(
        F.lit("k_anonymity").alias("step"),
        F.sum("risky_groups").cast("long").alias("n_flagged"),
        F.sum("risky_rows").cast("long").alias("witness"),
    )
    ld = l_diversity_risk(spark, sf_dir).agg(
        F.lit("l_diversity").alias("step"),
        F.sum("risky_groups").cast("long").alias("n_flagged"),
        F.sum("risky_rows").cast("long").alias("witness"),
    )
    tc = t_closeness_risk(spark, sf_dir).agg(
        F.lit("t_closeness").alias("step"),
        F.sum("risky_groups").cast("long").alias("n_flagged"),
        F.sum("n_groups").cast("long").alias("witness"),
    )
    dc = deletion_propagation_audit(spark, sf_dir).agg(
        F.lit("deletion_cascade").alias("step"),
        F.sum("n_delete").cast("long").alias("n_flagged"),
        F.sum("del_id_sum").cast("long").alias("witness"),
    )
    ps = (
        pseudonymize_consistent(spark, sf_dir)
        .filter(F.col("tbl") == "all")
        .select(
            F.lit("pseudonymization").alias("step"),
            (F.col("n_keys") - F.col("n_pseudo")).cast("long").alias("n_flagged"),
            F.col("n_keys").cast("long").alias("witness"),
        )
    )
    return ka.unionAll(ld).unionAll(tc).unionAll(dc).unionAll(ps)


_FD_PAIRS = [
    ("nation", "n_nationkey", "n_regionkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
]

_FD_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{t}.{a}->{b}' AS fd,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(n - mx) AS BIGINT) AS g3_violations,
           SUM(n - mx) = 0 AS holds
    FROM (
      SELECT a, SUM(c) AS n, MAX(c) AS mx FROM (
        SELECT {a} AS a, {b} AS b, COUNT(*) AS c FROM {t} GROUP BY 1, 2
      ) GROUP BY a
    )"""
    for t, a, b in _FD_PAIRS
)


@query("fd_candidate_profile", oracle=_FD_ORACLE)
def fd_candidate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUNCTIONAL-DEPENDENCY DISCOVERY (TANE's g3 error) — the
    schema-inference sibling of fk_candidate_profile: for candidate
    determinant -> dependent column pairs, the g3 measure = the
    minimum number of rows to delete before A -> B holds
    = sum over determinant values of (group size - its majority
    dependent count). All-integer (exact cell counts, keyed MAX —
    ties in the majority need no tie-break because only the COUNT
    matters), so holds/violations are hash-stable. nation.n_nationkey
    -> n_regionkey is the planted HOLDING dependency (a real FD of
    the schema); the other three pairs are violated — both branches
    of `holds` are exercised at every sf. NULL dependents form their
    own group on both engines (GROUP BY NULL-equality matches).
    Physical per pair: two map-side-combining aggregates over a
    two-column projection ((a,b) cells, then per-a majority) — the
    cell relation is the only shuffle, linear at any scale; pairs
    union independently."""
    out = None
    for t, a, b in _FD_PAIRS:
        df = load(spark, sf_dir, t)
        cells = df.groupBy(
            F.col(a).alias("a"), F.col(b).alias("b")
        ).agg(F.count(F.lit(1)).cast("long").alias("c"))
        grp = cells.groupBy("a").agg(
            F.sum("c").cast("long").alias("n"),
            F.max("c").cast("long").alias("mx"),
        )
        s = grp.agg(
            F.lit(f"{t}.{a}->{b}").alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.col("n") - F.col("mx")).cast("long").alias("g3_violations"),
            (F.sum(F.col("n") - F.col("mx")) == 0).alias("holds"),
        )
        out = s if out is None else out.unionAll(s)
    return out
