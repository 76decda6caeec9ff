"""Vector math as native Catalyst expressions (no Python UDFs).

These are the engine's semantic reference implementations of the
reference study's vector kernels:

- cosine similarity: ``sklearn.cosine_similarity`` at
  ``002-brute_force_similarity.py:189-191``
- L2 normalization: ``faiss.normalize_L2`` at ``004-faiss_demo.py:193-196``
- normalize-once + inner-product ≡ cosine trick: ``004-faiss_demo.py:184-196``

All arithmetic is performed in DOUBLE with strict left-to-right
accumulation (``F.aggregate`` folds sequentially), matching DuckDB's
``list_dot_product`` on ``DOUBLE[]`` so oracle hash-matching at 6
decimals is stable.

Everything here stays inside whole-stage codegen — these compile to
Catalyst higher-order functions (``zip_with``/``aggregate``/
``transform``), executed JVM-side. The bulk/hot path for large
query×corpus scoring is the GEMM pandas-UDF kernel in
``operators/topk.py``; these expressions are the exact-semantics path
the oracle verifies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    """Cast ``array<float>`` → ``array<double>`` so every downstream op
    runs in double precision (float32 storage, float64 math — the
    reference does the same: float32 matrices, float64 metrics)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Elementwise product then strict sequential sum — a Catalyst
    ``aggregate(zip_with(...))`` chain, all JVM-side."""
    aa = as_double_array(a)
    bb = as_double_array(b)
    return F.aggregate(
        F.zip_with(aa, bb, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot_product(a, a))


def l2_normalize(a: Column | str) -> Column:
    """x / ||x||, with zero vectors passed through unchanged
    (``faiss.normalize_L2`` semantics: 0-vector stays 0)."""
    aa = as_double_array(a)
    nrm = F.sqrt(
        F.aggregate(F.transform(aa, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    return F.when(nrm == 0.0, aa).otherwise(F.transform(aa, lambda x: x / nrm))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (||a||·||b||); 0 when either side is a zero vector."""
    d = dot_product(a, b)
    na = l2_norm(a)
    nb = l2_norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(d / (na * nb))
