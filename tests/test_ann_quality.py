"""ANN quality: recall of the approximate paths vs the exact baseline.

On this synthetic corpus embeddings are near-orthogonal (random
directions), so neighbors are barely distinguishable and absolute
recall is intrinsically modest — the floors below are regression
guards, not quality targets (random chance at k=3 over 500 vectors is
~0.006, so a broken bucket/cell join shows up as recall collapsing by
an order of magnitude). Clustered real-world embeddings collide far
more; recall tunes with s49 table count / s50 nprobe without ever
reintroducing an all-pairs product.
"""

from __future__ import annotations

from pinot_pulsar_plugin_spark.operators import similarity as S

SF = "/root/testdata/sf0.01"


def _pairs(df):
    return {(r.q_id, r.n_id) for r in df.collect()}


def test_ann_recall_floors(spark):
    exact = _pairs(S.s48_cosine_topk(spark, SF).filter("rank <= 3"))
    assert len(exact) == 30  # 10 queries x top-3
    lsh = _pairs(S.s49_ann_lsh_topk(spark, SF))
    ivf = _pairs(S.s50_ann_ivf_topk(spark, SF))
    # measured 2026-08: s49 ~0.33, s50 ~0.13 on the near-orthogonal corpus
    assert len(lsh & exact) / len(exact) >= 0.20
    assert len(ivf & exact) / len(exact) >= 0.08
    # every query must get its full k back (buckets/cells non-degenerate)
    assert len(lsh) == 30 and len(ivf) == 30
