"""Arrow-vectorized exact kernels (r13/r14 optimization rounds).

r13 shipped ``cos_seq_fold``, a pandas_udf that vectorized the exact
sequential-fold cosine ACROSS pairs but still paid a per-row Python
list conversion (``Series.tolist()``) on both embedding columns.
r14 replaces it with :func:`cos_rerank`, a ``mapInArrow`` kernel that
reads the Arrow list buffers directly — ``ListArray.flatten()`` hands
back the flat float buffer with no per-element Python objects — and
fixes the zero-norm divide semantics flagged in ADVICE r13 (the SQL
form the kernel replaced returns NULL for a zero divisor; numpy
returned inf/NaN, and NaN compares GREATER than any threshold in
Spark, so an all-zero embedding would have silently passed the d48
filter).
"""

import sys

import numpy as np
import pyarrow as pa

# Workers unpickle the mapInArrow function by reference unless this
# module is registered by value with pyspark's VENDORED cloudpickle —
# same worker-shipping constraint as streaming/sessions.py et al.
# (the driver contract imports the package from an arbitrary cwd, so
# the repo is NOT on the Python workers' sys.path).
try:
    from pyspark import cloudpickle as _pyspark_cloudpickle

    _pyspark_cloudpickle.register_pickle_by_value(sys.modules[__name__])
except (ImportError, AttributeError):  # old pyspark: repo-on-path only
    pass

_RERANK_SCHEMA = "vec_a long, vec_b long, cosine double"
_RERANK_COLS = ["vec_a", "vec_b", "emb_a", "emb_b", "nrm_a", "nrm_b"]


def _rerank_batches(it):
    for batch in it:
        if batch.num_rows == 0:
            continue
        col = {n: batch.column(i) for i, n in enumerate(batch.schema.names)}
        n = batch.num_rows
        # embeddings are float32 in parquet: cast every element to
        # double BEFORE the multiply (matching fold_dot's
        # ``cast("double")``) or the products round in float32 first
        A = col["emb_a"].flatten().to_numpy(zero_copy_only=False)
        B = col["emb_b"].flatten().to_numpy(zero_copy_only=False)
        A = A.astype(np.float64, copy=False).reshape(n, -1)
        B = B.astype(np.float64, copy=False).reshape(n, -1)
        na = col["nrm_a"].to_numpy(zero_copy_only=False)
        nb = col["nrm_b"].to_numpy(zero_copy_only=False)
        # dot product as the j-order sequential fold: acc starts at
        # 0.0 and adds a_j*b_j per dimension, so every IEEE
        # multiply/add rounds exactly like fold_dot (and the oracle's
        # list_reduce) — vectorized across pairs, sequential across
        # dimensions
        acc = np.zeros(n)
        for j in range(A.shape[1]):
            acc = acc + A[:, j] * B[:, j]
        den = na * nb
        zero = den == 0
        cos = pa.array(
            acc / np.where(zero, 1.0, den), type=pa.float64(), mask=zero
        )
        yield pa.RecordBatch.from_arrays(
            [col["vec_a"], col["vec_b"], cos], ["vec_a", "vec_b", "cosine"]
        )


def cos_rerank(df):
    """Exact-rerank cosine over candidate pairs, zero-copy via Arrow.

    Input must carry ``vec_a, vec_b, emb_a, emb_b, nrm_a, nrm_b``;
    returns ``(vec_a, vec_b, cosine)`` where cosine is bit-identical
    to ``fold_dot(emb_a, emb_b) / (nrm_a * nrm_b)`` — proven
    frame-equal (float bits included) against the fold form at sf0.1.

    Preconditions (ADVICE r13): embeddings must be NON-NULL and
    same-length within a batch — a null or ragged list makes the
    reshape raise inside the executor. Fine for the fixed-dim
    embeddings table; assert before adopting elsewhere.

    Zero-norm pairs yield NULL cosine (SQL divide semantics), so a
    ``cosine >= tau`` filter drops them exactly as the SQL form did.
    """
    return df.select(*_RERANK_COLS).mapInArrow(_rerank_batches, _RERANK_SCHEMA)
