"""Grouped-map pandas operators (``groupBy().applyInPandas``).

The third pandas-UDF execution shape the engine exposes (alongside
``mapInPandas`` — embed/ann/multimodal — and
``applyInPandasWithState`` — streaming/stateful.py): each GROUP
lands in one pandas DataFrame, for per-group kernels that need the
whole group in memory (centroid fits, per-group model fits,
covariances).

Scale notes: the shuffle is keyed on the group column; a group must
fit one executor's memory — for unbounded groups pre-aggregate or
sub-sample per group first. Output is long-form (group, component,
value) so downstream stays relational.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

def _centroid_schema(label_type) -> StructType:
    """Output schema with ``label`` typed as the caller's group
    column (review r9-5: a hard-coded IntegerType + int() coercion
    made every non-int group column — ``lang``, ``source`` — crash
    as an opaque executor PythonException despite the ``group_col``
    parameter inviting exactly those)."""
    return StructType(
        [
            StructField("label", label_type),
            StructField("component", IntegerType()),
            StructField("mean_value", DoubleType()),
            StructField("n_vectors", LongType()),
        ]
    )


def group_centroids(
    embeddings: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group embedding centroid, long-form: (label, component,
    mean_value, n_vectors) — one GEMM-free columnwise mean per group
    inside a grouped-map pandas UDF. ``label`` keeps the group
    column's own type (int labels, string langs/sources alike)."""

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.array(list(pdf["v"]), dtype=np.float64)
        mean = mat.mean(axis=0)
        label = pdf["g"].iloc[0]
        return pd.DataFrame(
            {
                "label": label,
                "component": np.arange(mat.shape[1], dtype=np.int32),
                "mean_value": mean,
                "n_vectors": len(mat),
            }
        )

    src = embeddings.select(
        F.col(group_col).alias("g"), F.col(vec_col).alias("v")
    )
    label_type = src.schema["g"].dataType
    return src.groupBy("g").applyInPandas(
        centroid, schema=_centroid_schema(label_type)
    )
