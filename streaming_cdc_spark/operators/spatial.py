"""Grid-cell spatial join: exact top-k-within-radius over 2-D points.

The 2-D sibling of the interval bucket join (operators/temporal.py):
cell width = radius guarantees every within-R partner sits in the 3x3
cell neighborhood, the probe side explodes to those 9 cells, and the
build side keeps its single home cell — each candidate pair is
generated exactly once, so no DISTINCT. All geometry is exact integer
micro-units (caller quantizes with floor + a positive shift so `div`
== floor on both Spark and DuckDB — Spark div truncates toward zero,
the negative-operand trap). Per-probe top-k goes through row_number,
which Spark evaluates with a map-side WindowGroupLimit below the
exchange: every shuffle in the plan is linear in n even as cell
density grows; the within-cell quadratic candidate work stays compute
inside the join stage, bounded by the radius dial. A fixed-radius
ALL-PAIRS emit would instead have quadratic OUTPUT on densifying
data — which is why the exported shape is top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_knn(
    points: DataFrame,
    radius: int,
    k: int,
    id_col: str = "vec_id",
    x_col: str = "qx",
    y_col: str = "qy",
    max_cell_population: int | None = None,
) -> DataFrame:
    """points: (id, qx, qy) with NON-NEGATIVE integer coords (already
    quantized + shifted). Returns (q, neighbor, dist2, rank) — each
    point's k nearest neighbors with dist2 < radius^2, ranked by the
    total (dist2, neighbor) order.

    max_cell_population is the SKEW DIAL (the ppjoin_skewed /
    resource_allocation hub-cap pattern): when set, only the `cap`
    lowest-id points of each home cell enter the BUILD index — a
    planted hot cell (a geo point-of-interest, a default coordinate)
    otherwise makes the within-cell candidate work quadratic in the
    hot population. The cap is recall-trading but DETERMINISTIC
    (membership = row_number over (cell, id) <= cap, replayable in
    SQL), and every point still PROBES, so capped points keep their
    own neighbor lists. The cap filter itself is skew-safe: Spark
    plants a map-side WindowGroupLimit below the cell exchange, so
    the hot cell ships at most cap rows per input partition — the
    cap never becomes its own single-partition sort wall."""
    from pyspark.sql import Window as W

    from streaming_cdc_spark.session import fan_out

    # fan_out before the checkpoint: a single small parquet row-group
    # scans as ONE partition, and the 9x probe explode plus the cell
    # join's map side would run in one task (the doc_fingerprints
    # lesson — every explode-shaped operator takes this guard)
    p = fan_out(
        points.select(
            F.col(id_col).alias("_id"),
            F.col(x_col).cast("long").alias("_qx"),
            F.col(y_col).cast("long").alias("_qy"),
        )
    ).localCheckpoint()
    build = p.select(
        F.col("_id").alias("neighbor"),
        F.col("_qx").alias("bx"),
        F.col("_qy").alias("by"),
        F.expr(f"_qx div {radius}").alias("cx"),
        F.expr(f"_qy div {radius}").alias("cy"),
    )
    if max_cell_population is not None:
        cw = W.partitionBy("cx", "cy").orderBy("neighbor")
        build = (
            build.select(
                "neighbor", "bx", "by", "cx", "cy",
                F.row_number().over(cw).alias("_cr"),
            )
            .filter(F.col("_cr") <= max_cell_population)
            .drop("_cr")
        )
    probe = (
        p.select(
            F.col("_id").alias("q"),
            "_qx",
            "_qy",
            F.expr(f"_qx div {radius}").alias("hx"),
            F.expr(f"_qy div {radius}").alias("hy"),
        )
        .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "q", "_qx", "_qy",
            (F.col("hx") + F.col("dx")).alias("cx"),
            (F.col("hy") + F.col("dy")).alias("cy"),
        )
    )
    dist2 = (F.col("_qx") - F.col("bx")) * (F.col("_qx") - F.col("bx")) + (
        F.col("_qy") - F.col("by")
    ) * (F.col("_qy") - F.col("by"))
    cand = (
        probe.join(build, ["cx", "cy"])
        .filter(F.col("q") != F.col("neighbor"))
        .select("q", "neighbor", dist2.alias("dist2"))
        # radius^2 folded in Python: it exceeds int32, and an int
        # literal multiply would overflow at constant folding
        .filter(F.col("dist2") < F.lit(radius * radius))
    )
    w = W.partitionBy("q").orderBy("dist2", "neighbor")
    return (
        cand.select("q", "neighbor", "dist2", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
        .select(
            "q", "neighbor", F.col("dist2").cast("long"), F.col("rank").cast("long")
        )
    )
