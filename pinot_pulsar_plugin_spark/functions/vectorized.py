"""Arrow-vectorized exact kernels (r13 optimization round).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
resolves the type hints at decoration time, and PEP-563 stringified
hints from an importing module's future-import would break the
signature inference.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def cos_seq_fold(
    ea: pd.Series, eb: pd.Series, na: pd.Series, nb: pd.Series
) -> pd.Series:
    """Cosine from two embedding arrays and their precomputed norms,
    bit-identical to ``fold_dot(a, b) / (na * nb)``: the per-dimension
    loop accumulates ``acc + a_j * b_j`` in j-order, so every IEEE
    multiply/add rounds exactly like the sequential fold (and the
    oracle's ``list_reduce``) — vectorized ACROSS pairs, sequential
    across dimensions (proven frame-equal including float bits against
    the fold form at sf0.01/sf0.1)."""
    A = np.array(ea.tolist(), dtype=np.float64)
    B = np.array(eb.tolist(), dtype=np.float64)
    if len(A) == 0:
        return pd.Series(np.zeros(0))
    acc = np.zeros(A.shape[0])
    for j in range(A.shape[1]):
        acc = acc + A[:, j] * B[:, j]
    return pd.Series(acc / (na.to_numpy() * nb.to_numpy()))
