"""The UDF surface, demonstrated end-to-end — and when NOT to use it.

The reference pipeline is deliberately UDF-free (SURVEY.md §2.10): every
hot-path transformation in this engine is a built-in column expression
that Catalyst optimizes through. The escape hatches below exist for
algorithms Spark genuinely lacks, in preference order:

1. **SQL UDF** (``io.register_sql_function``) — Catalyst-INLINED, zero
   cost, for shared business expressions. Always first choice.
2. **Vectorized pandas UDFs** — Arrow-batched, for dense numeric work
   the JVM can't express (BLAS ops: ``similarity._bucket_udf``).
3. **Grouped-agg pandas UDAF** (:func:`grouped_median` here) — one
   Arrow batch per group, for custom aggregates. The group's values
   must fit in memory — use only on bounded groups.
4. **mapInPandas / applyInPandasWithState** — whole-partition or
   stateful streams (``multimodal.extract_features``,
   ``streaming.running_totals``).

Row-at-a-time ``F.udf`` appears nowhere in this engine and should stay
that way: it serializes per row through a Python worker and walls off
the optimizer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def _median_udaf(v: pd.Series) -> float:
    # one Arrow batch per group; np.median interpolates the middle
    # pair exactly like percentile(0.5)
    return float(np.median(v.to_numpy(dtype="float64")))


def grouped_median(
    df: DataFrame, keys: list[str], value_col: str, out_col: str = "median"
) -> DataFrame:
    """Per-group median via a GROUPED_AGG pandas UDAF — the custom-
    aggregate escape hatch, shaped exactly like a real one (swap the
    numpy call for any per-group fit/score).

    For median itself the built-in ``percentile``/``approx_percentile``
    is strictly better (JVM-side, partial-aggregable); this exists to
    pin the UDAF plumbing (Arrow group transfer, grouping semantics)
    against the built-in's answer — see ``f_pandas_udaf_median``.
    """
    return df.groupBy(*keys).agg(_median_udaf(F.col(value_col)).alias(out_col))
