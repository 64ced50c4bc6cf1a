"""As-of (nearest-prior) join — an operator Spark lacks natively.

SURVEY.md §2.3 notes the reference has no range/as-of joins; large-scale
event pipelines need one constantly (join each event to the latest state row
at or before its timestamp).  Composition per the preference order (SURVEY.md
§7.3 / pyspark guide): cogrouped ``applyInPandas`` running
``pandas.merge_asof`` per key group — each group arrives time-sorted after an
in-group sort, the merge is O(n+m) per group, and the shuffle is the ordinary
hash exchange on the join key.  DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest ``on`` value
    <= left's (per ``by`` key; direction="forward" flips the comparison).

    Output: all left columns + right_value_cols (+ "_right_" + on).
    Left rows with no match keep nulls (left-join semantics).
    """
    from pyspark.sql import functions as F

    left_cols = left.columns
    out_schema = ", ".join(
        [f"`{c}` {left.schema[c].dataType.simpleString()}" for c in left_cols]
        + [f"`{c}` {right.schema[c].dataType.simpleString()}" for c in right_value_cols]
        + [f"`_right_{on}` {right.schema[on].dataType.simpleString()}"]
    )
    # Alias EVERY right-side column to a name absent from the left.  When
    # both sides descend from the same relation (self-as-of), the cogroup
    # node deduplicates same-lineage attributes and silently DROPS the
    # right side's copies from the Arrow payload — unique names sidestep it.
    rv = right.select(
        F.col(by).alias("_asof_by"),
        F.col(on).alias(f"_right_{on}"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_value_cols],
    )

    def merge(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(on, kind="mergesort")
        if len(rpdf) == 0:
            res = lpdf.copy()
            for c in right_value_cols:
                res[c] = None
            res[f"_right_{on}"] = None
            return res[list(lpdf.columns) + right_value_cols + [f"_right_{on}"]]
        rpdf = rpdf.sort_values(f"_right_{on}", kind="mergesort").drop(columns=["_asof_by"])
        res = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=on,
            right_on=f"_right_{on}",
            direction=direction,
        )
        res = res.rename(columns={f"_rv_{c}": c for c in right_value_cols})
        return res[list(lpdf.columns) + right_value_cols + [f"_right_{on}"]]

    return (
        left.groupBy(by)
        .cogroup(rv.groupBy("_asof_by"))
        .applyInPandas(merge, out_schema)
    )
