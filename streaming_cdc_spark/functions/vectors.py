"""Vector math as JVM-side Column expressions (no Python in the hot
path). These express the reference's embedding ops — L2 normalize
(nn_thresh.py:172-173, grinch_alg.py:104-114), dot / cosine kernels
(nn_thresh.py:112-115, grinch_alg.py:70-92) — over
``array<float>``/``array<double>`` columns using Spark's higher-order
functions, so they run inside codegen'd stages and survive column
pruning/pushdown.

For dense all-pairs scoring use operators/similarity.py (Arrow-batched
numpy matmul); these expressions are the right tool for per-row or
join-condition use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Inner product: aggregate(zip_with(a,b,*), 0.0, +) — sequential
    left-to-right fold, deterministic."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return F.sqrt(dot(v, v))


def l2_normalize(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    n = l2_norm(v)
    return F.transform(v, lambda x: x / n)


def cosine(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x))


def inv_l2_kernel(a: Column | str, b: Column | str) -> Column:
    """P12 'l2' kernel (grinch_alg.py:70-92): 1 / (1 + ||a-b||)."""
    return F.lit(1.0) / (F.lit(1.0) + l2_distance(a, b))


def inv_sql2_kernel(a: Column | str, b: Column | str) -> Column:
    """P12 'sql2' kernel: 1 / (1 + ||a-b||^2)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.lit(1.0) / (F.lit(1.0) + F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x))


def quant_scale(v: Column | str, bits: int = 8) -> Column:
    """Per-vector symmetric quantization scale: max|v| / (2^(bits-1)-1),
    floored at 1e-12 so zero vectors stay finite."""
    v = F.col(v) if isinstance(v, str) else v
    qmax = float((1 << (bits - 1)) - 1)
    return F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-12)
    ) / F.lit(qmax)


def quantize(v: Column | str, scale: Column) -> Column:
    """Symmetric scalar quantization to integer codes:
    floor(x/scale + 0.5) — floor-based half-up so both engines round
    identically (no ties-to-even ambiguity). Pass ``scale`` as a
    MATERIALIZED column (withColumn), not an inline quant_scale
    expression — lambdas re-evaluate it per element (O(d^2))."""
    v = F.col(v) if isinstance(v, str) else v
    return F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"))


def quant_abs_error(v: Column | str, scale: Column) -> Column:
    """Max absolute reconstruction error of the quantized vector —
    computed from v and scale alone (err_i = |x - floor(x/scale+0.5)
    * scale|), no zip with the codes needed. Same caveat as
    quantize: pass scale as a materialized column."""
    v = F.col(v) if isinstance(v, str) else v
    return F.array_max(
        F.transform(v, lambda x: F.abs(x - F.floor(x / scale + F.lit(0.5)) * scale))
    )
