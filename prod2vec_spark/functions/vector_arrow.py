"""Arrow-vectorized vector math (SURVEY.md §2.12 pandas_udf surface).

NOTE: deliberately NO ``from __future__ import annotations`` here —
``pandas_udf`` infers its eval type from *resolved* type hints, and
postponed evaluation turns them into strings it cannot resolve unless
pandas is a module global.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def pair_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
    """Per-row dot product of two (already unit-scaled) array columns:
    one numpy einsum per Arrow batch — the vectorized fast path for
    pair volumes where interpreted HOF folds dominate.  numpy sums
    pairwise (not a strict left fold), so values can differ from the
    HOF/oracle path by ~1 ulp."""
    av = np.stack(a.to_numpy())
    bv = np.stack(b.to_numpy())
    return pd.Series(np.einsum("ij,ij->i", av, bv))
