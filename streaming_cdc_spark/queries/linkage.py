"""Record-linkage queries: sorted-neighborhood blocking and
Fellegi-Sunter probabilistic match scoring over the customer table —
the classic identity-resolution layer (Hernández-Stolfo SNM,
Fellegi-Sunter 1969) above the reference's exact-key clustering
(string_match.py:14-28). Complements the shingle/embedding blocking
families with RANK-banded blocking and frequency-calibrated scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_cdc_spark.queries.registry import query
from streaming_cdc_spark.tables import load

_FIELDS = ["nat", "seg", "bal"]
_M_MICRO = {"nat": 900_000, "seg": 950_000, "bal": 800_000}
_WINDOW = 4

_U_SUBQ = {
    f: f"(SELECT SUM(ct * (ct - 1)) FROM "
       f"(SELECT COUNT(*) AS ct FROM c GROUP BY {f}) t_{f})"
    for f in _FIELDS
}


def _ratio_sql(f: str) -> str:
    m = _M_MICRO[f]
    return (
        f"CASE WHEN agree_{f} = 1 "
        f"THEN CAST({m} * den AS DOUBLE) / CAST(1000000 * u_{f} AS DOUBLE) "
        f"ELSE CAST({1_000_000 - m} * den AS DOUBLE) "
        f"/ CAST(1000000 * (den - u_{f}) AS DOUBLE) END"
    )


_LINKAGE_SQL = f"""
    WITH c AS (
      SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nat,
             c_mktsegment AS seg,
             CAST(FLOOR(c_acctbal / 100) AS BIGINT) AS bal
      FROM customer
    ),
    r AS (SELECT c.*, row_number() OVER (ORDER BY seg, bal, c_custkey) AS rk
          FROM c),
    p AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             a.rk AS rank_a, b.rk AS rank_b,
             CASE WHEN a.nat = b.nat THEN 1 ELSE 0 END AS agree_nat,
             CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS agree_seg,
             CASE WHEN a.bal = b.bal THEN 1 ELSE 0 END AS agree_bal
      FROM r a JOIN r b
        ON b.rk >= a.rk + 1 AND b.rk <= a.rk + {_WINDOW - 1}
    ),
    s AS (
      SELECT COUNT(*) * (COUNT(*) - 1) AS den,
             {_U_SUBQ['nat']} AS u_nat,
             {_U_SUBQ['seg']} AS u_seg,
             {_U_SUBQ['bal']} AS u_bal
      FROM c
    )
    SELECT id_a, id_b, rank_a, rank_b,
           CAST(agree_nat AS BIGINT) AS agree_nat,
           CAST(agree_seg AS BIGINT) AS agree_seg,
           CAST(agree_bal AS BIGINT) AS agree_bal,
           ROUND((({_ratio_sql('nat')}) * ({_ratio_sql('seg')}))
                 * ({_ratio_sql('bal')}), 4) AS score_r
    FROM p, s
"""


@query("record_linkage_scores", oracle=_LINKAGE_SQL)
def record_linkage_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking + Fellegi-Sunter scoring
    (operators/linkage.py): customers globally ranked by
    (segment, $100-balance-bucket, key) in ONE range exchange (the
    mono-id rank decode), candidate pairs = rank distance < 4 via the
    bucket-banded equi-join (every row meets <= 2 windows of rows —
    linear output, no theta join), then each pair scored with the
    product of per-field likelihood ratios m_f/u_f, where u_f is the
    EXACT frequency-based estimate sum f_v(f_v-1)/(N(N-1)) in BIGINTs
    shipped as a one-row broadcast. Floats appear only in one
    fixed-order division/multiply chain (IEEE-identical cross-engine;
    product of ratios = monotone twin of the textbook log-weight sum —
    ln() is not bit-identical across engines, so it never enters).
    The oracle replays ranking, banding, u-estimation and the exact
    score expression relationally. FLOOR before the bucket cast
    (Spark truncates double->bigint, DuckDB rounds)."""
    from streaming_cdc_spark.operators.linkage import (
        fellegi_sunter_scores,
        fs_u_stats,
        sorted_neighborhood_pairs,
    )

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 100).cast("long").alias("bal"),
    )
    pairs = sorted_neighborhood_pairs(
        cust, ["seg", "bal", "c_custkey"], "c_custkey",
        window=_WINDOW, keep_cols=_FIELDS,
    )
    stats = fs_u_stats(cust, _FIELDS)
    scored = fellegi_sunter_scores(pairs, stats, _FIELDS, _M_MICRO)
    return scored.select(
        "id_a", "id_b", "rank_a", "rank_b",
        *[F.col(f"agree_{f}").cast("long").alias(f"agree_{f}") for f in _FIELDS],
        "score_r",
    )
