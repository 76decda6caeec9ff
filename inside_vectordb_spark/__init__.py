"""inside_vectordb_spark — a PySpark-native analytics/vector-search engine.

A from-scratch re-expression of the query semantics of the reference
study ``sagarsrc/inside-vectordb`` (brute-force cosine top-k search,
HNSW-style ANN, IR metrics, benchmark reporting) as an idiomatic Spark
DataFrame/SQL engine, extended with the operators a large-scale
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal plumbing).

Design principles (SURVEY.md §7):
- Declarative DataFrame plans; let Catalyst/Tungsten optimize.
- Built-in ``pyspark.sql.functions`` in the hot path; Arrow-batched
  pandas UDFs only where built-ins can't express the kernel
  (embedding encode, GEMM-batched scoring, per-partition ANN index).
- Broadcast small sides; pre-normalize once and score with dot
  product (the reference's O6 trick, ``004-faiss_demo.py:187-196``).
"""

__version__ = "0.1.0"
