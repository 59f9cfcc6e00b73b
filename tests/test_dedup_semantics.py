"""Semantic unit tests for dedup operators on crafted corpora."""

from __future__ import annotations


def test_d44_drops_boilerplate_stop_shingles(spark, tmp_path):
    """A corpus-wide boilerplate shingle (the hot join key at scale) is
    stop-filtered, so docs sharing ONLY boilerplate never pair; docs
    sharing genuine content still do."""
    from pinot_pulsar_plugin_spark.operators.dedup import d44_ngram_jaccard_pairs

    texts = []
    for i in range(50):  # threshold: df > 5 (10% of 50)
        # every doc opens with the same boilerplate 3-gram "corp legal
        # disclaimer"; docs 4 and 5 also share a genuine tail
        tail = "alpha beta gamma delta" if i in (4, 5) else f"u{i} v{i} p{i} q{i}"
        texts.append((i, f"corp legal disclaimer {tail}"))
    spark.createDataFrame(texts, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = d44_ngram_jaccard_pairs(spark, str(tmp_path)).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in out}
    # without the stop filter all C(50,2)=1225 doc pairs would collide
    # on "corp legal disclaimer" (df=50 > 5 -> stopped); only the
    # genuine pair survives
    assert set(pairs) == {(4, 5)}, set(pairs)
    r = pairs[(4, 5)]
    # kept shingles per doc: "disclaimer alpha beta", "alpha beta
    # gamma", "beta gamma delta" + ("legal disclaimer alpha" has df=2,
    # kept) -> both docs have identical kept sets of size 4
    assert r.n_common == 4 and abs(r.jaccard - 1.0) < 1e-12, r


def test_d49_components_chain_and_singletons(spark, tmp_path):
    """A chain of pairwise near-dups (diameter 7 — forces several
    propagation rounds) collapses to one component labeled by its min
    doc_id; isolated docs stay their own keepers."""
    from pinot_pulsar_plugin_spark.operators.pipelines import d49_neardup_components

    texts = []
    for i in range(8):  # doc i shares exactly one 3-gram with doc i+1
        texts.append((i, f"x{i} y{i} z{i} x{i+1} y{i+1} z{i+1}"))
    for i in range(8, 24):  # isolated docs (no shared shingles)
        texts.append((i, f"a{i} b{i} c{i} d{i} e{i} f{i}"))
    spark.createDataFrame(texts, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {r.doc_id: r for r in d49_neardup_components(spark, str(tmp_path)).collect()}
    assert len(rows) == 24
    for i in range(8):
        assert rows[i].component == 0 and rows[i].is_keeper == (1 if i == 0 else 0)
    for i in range(8, 24):
        assert rows[i].component == i and rows[i].is_keeper == 1


def test_d51_keeper_prefers_highest_quality(spark, tmp_path):
    """Within a near-dup cluster the quality-aware keeper is the
    longest document (n_chars DESC, doc_id tiebreak), NOT d49's min
    doc_id; singletons keep themselves."""
    from pinot_pulsar_plugin_spark.operators.pipelines import (
        d51_cluster_keeper_quality,
    )

    texts = []
    for i in range(4):  # chain 0-1-2-3: one cluster, component 0
        texts.append((i, f"x{i} y{i} z{i} x{i+1} y{i+1} z{i+1}"))
    for i in range(4, 30):  # isolated; corpus of 30 keeps the df>10%
        texts.append((i, f"a{i} b{i} c{i} d{i} e{i} f{i}"))  # stop filter above the chain's df=2 shingles
    # doc 2 is the "best" (longest) member of the cluster; ties between
    # 0 and 1 would break toward the lower doc_id
    n_chars = {0: 100, 1: 100, 2: 400, 3: 50}
    rows = [(i, txt, n_chars.get(i, 10)) for i, txt in texts]
    spark.createDataFrame(rows, "doc_id long, text string, n_chars long").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r.doc_id: r for r in d51_cluster_keeper_quality(spark, str(tmp_path)).collect()}
    assert len(out) == 30
    for i in range(4):
        assert out[i].component == 0
        assert out[i].is_keeper == (1 if i == 2 else 0), out[i]
    for i in range(4, 30):
        assert out[i].component == i and out[i].is_keeper == 1
    # exactly one keeper per component
    comps = {}
    for r in out.values():
        comps[r.component] = comps.get(r.component, 0) + r.is_keeper
    assert all(v == 1 for v in comps.values()), comps


def test_short_docs_do_not_crash_shingle_ops(spark, tmp_path):
    """Docs with < 3 tokens hit Spark's descending-sequence footgun
    (sequence(1, 0) == [1, 0] with implicit step -1), which crashed
    slice() at runtime and diverged from DuckDB's empty
    generate_series (ADVICE r2). Short docs must simply produce no
    shingles on either engine."""
    from pinot_pulsar_plugin_spark.operators.dedup import (
        d44_ngram_jaccard_pairs,
        d45_minhash_lsh_candidates,
    )
    from pinot_pulsar_plugin_spark.operators.pipelines import d50_contamination

    texts = [
        (1, ""),
        (2, "one"),
        (3, "one two"),
        (30, "alpha beta gamma delta epsilon"),
        (31, "alpha beta gamma delta epsilon"),
        (40, "x"),  # short doc on the training side of d50
    ]
    # filler so the duplicate pair's shingles (df=2) stay under d44's
    # stop threshold (df > 10% of corpus)
    texts += [(50 + i, f"f{i}a f{i}b f{i}c f{i}d") for i in range(20)]
    spark.createDataFrame(texts, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    sf = str(tmp_path)
    pairs = {(r.doc_a, r.doc_b) for r in d44_ngram_jaccard_pairs(spark, sf).collect()}
    assert pairs == {(30, 31)}
    # d45: short docs contribute no shingles -> no signatures -> absent
    cand = d45_minhash_lsh_candidates(spark, sf).collect()
    assert all(r.doc_a >= 30 and r.doc_b >= 30 for r in cand)
    # d50: only docs with >= 3 tokens appear, contamination in [0,1]
    cont = {r.doc_id: r for r in d50_contamination(spark, sf).collect()}
    # every training-side doc with >= 3 tokens scores; doc 40 (1 token)
    # has no shingles and must be absent, not crash
    assert set(cont) == {30, 31} | {50 + i for i in range(20)}
    assert all(0.0 <= r.contamination <= 1.0 for r in cont.values())


def test_d52_prefix_filter_full_recall_at_boundary(spark, tmp_path):
    """Prefix filtering is EXACT pruning: on a crafted corpus with
    pairs straddling tau=0.5 — including one at exactly 0.5 and decoys
    sharing only hot (high-df) shingles — d52 must equal the
    brute-force exact Jaccard join, pair for pair."""
    from pinot_pulsar_plugin_spark.operators.dedup import (
        _D52_TAU,
        _SHINGLE_K,
        d52_prefix_filter_jaccard,
    )

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    texts = [
        (0, base),                                   # 8 shingles
        (1, base),                                   # identical → J=1.0
        (2, base + " w11 w12"),                      # superset → J>0.5
        (3, "w1 w2 w3 w4 q5 q6 q7 q8 q9 q10"),       # small overlap < 0.5
        # exactly J=0.5 with doc 0: shingle sets of size 8 each
        # sharing... construct via half-overlap below
        (4, "w5 w6 w7 w8 w9 w10 z1 z2 z3 z4"),       # suffix overlap
        (5, "hot hot2 hot3 a1 a2 a3 a4 a5"),         # hot-shingle decoys
        (6, "hot hot2 hot3 b1 b2 b3 b4 b5"),
        (7, "hot hot2 hot3 c1 c2 c3 c4 c5"),
        (8, "xx"),                                   # sub-k tokens
    ]
    spark.createDataFrame(texts, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        (r.doc_a, r.doc_b): (r.n_common, round(r.jaccard, 9))
        for r in d52_prefix_filter_jaccard(spark, str(tmp_path)).collect()
    }

    # brute-force reference
    def shingles(s: str) -> set[str]:
        tk = s.lower().split(" ")
        return {
            " ".join(tk[i : i + _SHINGLE_K])
            for i in range(len(tk) - _SHINGLE_K + 1)
        } if len(tk) >= _SHINGLE_K else set()

    sets = {i: shingles(s) for i, s in texts}
    expected = {}
    for a in sets:
        for b in sets:
            if a >= b or not sets[a] or not sets[b]:
                continue
            nc = len(sets[a] & sets[b])
            j = nc / (len(sets[a]) + len(sets[b]) - nc)
            if j >= _D52_TAU:
                expected[(a, b)] = (nc, round(j, 9))
    assert got == expected
    assert (0, 1) in expected  # sanity: the crafted dup pairs exist
    assert (0, 2) in expected


def test_d45_minhash_recall_on_near_identical_docs(spark, tmp_path):
    """MinHash-LSH semantic guarantee the rows-only gate can't see:
    near-identical document pairs (one word edited → shingle Jaccard
    well above 0.9) MUST surface as candidates with a high estimated
    Jaccard — with 32 bands of 2 rows, miss probability per such pair
    is (1-J^2)^32 < 1e-25 — while unrelated documents (disjoint
    vocabularies) must produce no candidate pair at all."""
    import os

    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.operators.dedup import d45_minhash_lsh_candidates

    base = " ".join(f"tok{i}" for i in range(60))
    edited = base.replace("tok30", "tokEDIT")
    other = " ".join(f"zzz{i}" for i in range(60))
    rows = [(0, base), (1, edited), (2, other)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    tmp = str(tmp_path / "corpus")
    os.makedirs(tmp)
    df.write.parquet(os.path.join(tmp, "documents.parquet"))

    pairs = {
        (r.doc_a, r.doc_b): r
        for r in d45_minhash_lsh_candidates(spark, tmp).collect()
    }
    assert (0, 1) in pairs, "near-identical pair missed by banded MinHash"
    assert pairs[(0, 1)].est_jaccard > 0.8
    assert not any({0, 1} & {a, b} and 2 in (a, b) for a, b in pairs), (
        "disjoint-vocabulary doc produced a candidate"
    )


def test_d46_simhash_recall_on_near_identical_docs(spark, tmp_path):
    """SimHash semantic guarantee (rows-only op): a one-word edit on a
    60-token document perturbs few of the 48 majority-vote bit sums, so
    the pair must collide in at least one 12-bit band AND pass the
    Hamming cut with a small distance; disjoint-vocabulary documents
    (independent fingerprints, E[hamming] = 24) must not pair."""
    import os

    from pinot_pulsar_plugin_spark.operators.dedup import d46_simhash_candidates

    base = " ".join(f"tok{i}" for i in range(60))
    edited = base.replace("tok30", "tokEDIT")
    other = " ".join(f"zzz{i}" for i in range(60))
    df = spark.createDataFrame(
        [(0, base), (1, edited), (2, other)], "doc_id bigint, text string"
    )
    tmp = str(tmp_path / "corpus")
    os.makedirs(tmp)
    df.write.parquet(os.path.join(tmp, "documents.parquet"))

    pairs = {(r.doc_a, r.doc_b): r for r in d46_simhash_candidates(spark, tmp).collect()}
    assert (0, 1) in pairs, "near-identical pair missed by SimHash banding"
    assert pairs[(0, 1)].hamming <= 10, pairs[(0, 1)]
    assert not any(2 in (a, b) for a, b in pairs), pairs


def test_d54_winnow_pairs_edit_robust_recall_and_precision(spark):
    """Winnowed pair detection must survive local edits (the MOSS
    guarantee d54 is built on): a document and its 2-token-edited copy
    share every fingerprint whose k+w-1 window avoids the edit sites,
    so the pair clears the Jaccard cut easily — while independent
    random documents over a large vocabulary share (almost) nothing.
    Both directions asserted: every planted pair found, zero spurious
    pairs between unrelated docs."""
    import random as _random

    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.operators.dedup import winnow_pairs

    rng = _random.Random(54)
    vocab = [f"w{c}{i}" for c in "abcdefgh" for i in range(200)]
    rows = []
    planted = set()
    for d in range(30):
        toks = [rng.choice(vocab) for _ in range(60)]
        rows.append((d * 2, " ".join(toks)))
        edited = list(toks)
        for _ in range(2):  # two scattered single-token edits
            edited[rng.randrange(len(edited))] = rng.choice(vocab)
        rows.append((d * 2 + 1, " ".join(edited)))
        planted.add((d * 2, d * 2 + 1))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b)
        for r in winnow_pairs(docs, 0.25).collect()
    }
    assert planted <= got, f"missed planted pairs: {sorted(planted - got)[:5]}"
    assert got <= planted, f"spurious pairs: {sorted(got - planted)[:5]}"


def test_d53_span_counts_match_brute_force_with_boilerplate(spark):
    """d53 against a brute-force reference on an adversarial corpus:
    every doc shares one hot boilerplate span (the skew case), some
    docs repeat a span internally (within-doc duplication must count),
    and some docs are unique filler. Exact per-doc n_spans/n_dup
    equality with the Python reference."""
    import random as _random
    from collections import Counter

    from pinot_pulsar_plugin_spark.operators.dedup import span_dup_fractions

    k = 4
    rng = _random.Random(53)
    vocab = [f"v{i}" for i in range(500)]
    boiler = ["subscribe", "to", "our", "newsletter", "today", "please"]
    rows = []
    for d in range(40):
        toks = [rng.choice(vocab) for _ in range(rng.randrange(8, 30))]
        if d % 2 == 0:
            pos = rng.randrange(len(toks) + 1)
            toks = toks[:pos] + boiler + toks[pos:]  # hot span in half the docs
        if d % 7 == 0:
            seg = toks[:k]
            toks = toks + seg  # within-doc repeat
        rows.append((d, " ".join(toks)))

    # brute force
    corpus = Counter()
    doc_spans = {}
    for doc_id, text in rows:
        tk = text.lower().split(" ")
        spans = [" ".join(tk[i : i + k]) for i in range(len(tk) - k + 1)]
        doc_spans[doc_id] = spans
        corpus.update(spans)
    expected = {
        doc_id: (
            len(spans),
            sum(1 for s in spans if corpus[s] >= 2),
        )
        for doc_id, spans in doc_spans.items()
    }

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans)
        for r in span_dup_fractions(docs, k).collect()
    }
    assert got == expected
    # the boilerplate span really is hot: every even doc has dups
    assert all(expected[d][1] > 0 for d in range(0, 40, 2))


def test_d55_incremental_verdicts_on_planted_delta(spark, tmp_path):
    """Planted-delta ground truth for incremental dedup: the corpus
    (even ids) holds three originals; the delta (odd ids) carries an
    exact copy (whitespace-normalized), a one-word-edited near copy, a
    novel document, and a short doc below shingle length — verdicts
    must be exactly (exact_dup), (near_dup), (keep), (keep)."""
    from pinot_pulsar_plugin_spark.operators.dedup import d55_incremental_dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    other = "completely different content about distributed query engines at scale"
    rows = [
        (0, base),
        (2, other),
        (4, "third corpus document with its own unique and stable wording here"),
        # delta
        (1, "  " + base.upper().lower() + " "),  # exact after normalization
        (3, base.replace("jumps", "leaps")),  # near dup (high jaccard)
        (5, "entirely novel incoming text that matches nothing in the corpus"),
        (7, "tiny doc"),  # < k tokens: no shingles, must still be kept
    ]
    # pad the corpus so the df stop-filter threshold (df > n_docs*0.1)
    # sits above the planted trio's shared-shingle df of 3
    rows += [
        (100 + 2 * i, f"filler corpus doc number {i} speaks of topic{i} "
                      f"and concept{i} exclusively without overlap")
        for i in range(30)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r.doc_id: r for r in d55_incremental_dedup(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 3, 5, 7}
    assert out[1].exact_dup and not out[1].keep
    assert out[3].near_dup and not out[3].exact_dup and not out[3].keep
    assert out[5].keep and not out[5].exact_dup and not out[5].near_dup
    assert out[7].keep


def test_d56_chunk_rewrite_matches_brute_force(spark):
    """chunk_rewrite vs a brute-force Python reference on an
    adversarial corpus: cross-doc boilerplate chunks, intra-doc
    repeats, exact whole-doc duplicates, and sub-chunk-width docs.
    First occurrence = smallest (doc_id, pos) corpus-wide."""
    from pinot_pulsar_plugin_spark.operators.dedup import chunk_rewrite

    W = 4
    boiler = "b1 b2 b3 b4"  # one exact chunk of boilerplate
    docs = [
        (0, f"{boiler} u0 u1 u2 u3"),            # owns the boilerplate chunk
        (1, f"{boiler} v0 v1 v2 v3"),            # boilerplate removed
        (2, f"{boiler} {boiler}"),               # cross-doc AND intra-doc dup
        (3, "w0 w1 w2 w3 w0 w1 w2 w3"),          # intra-doc repeat only
        (4, "u0 u1 u2 u3"),                      # dup of doc 0's 2nd chunk
        (5, "x0 x1"),                            # shorter than one chunk
        (6, "x0 x1"),                            # exact dup of doc 5
        (7, f"y0 y1 y2 y3 y4 y5 {boiler[:5]}"),  # ragged tail "b1 b2" unique
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # brute force
    seen: set[str] = set()
    expect = {}
    for doc_id, text in docs:
        tk = text.split(" ")
        chunks = [" ".join(tk[i : i + W]) for i in range(0, len(tk), W)]
        kept = []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        expect[doc_id] = (len(chunks), len(kept), " ".join(kept))

    rows = {r.doc_id: r for r in chunk_rewrite(df, W).collect()}
    assert set(rows) == set(expect)
    for doc_id, (n_chunks, n_kept, clean) in expect.items():
        r = rows[doc_id]
        assert (r.n_chunks, r.n_kept, r.clean_text) == (n_chunks, n_kept, clean), (
            doc_id,
            r,
        )
    # spot-check the semantics the corpus was built to pin
    assert rows[1].clean_text == "v0 v1 v2 v3"
    assert rows[2].clean_text == "" and rows[2].n_kept == 0
    assert rows[3].clean_text == "w0 w1 w2 w3"
    assert rows[4].clean_text == "" and rows[4].n_chunks == 1
    assert rows[6].clean_text == "" and rows[5].clean_text == "x0 x1"


def test_d57_estimator_exact_on_identical_and_overlapping_docs(spark, tmp_path):
    """Identical docs share every signature slot -> estimate exactly
    1.0; a 1/3-overlap pair reports exact_jaccard 1/3 and a bounded
    estimate; disjoint docs produce no row."""
    from pinot_pulsar_plugin_spark.operators.dedup import d57_minhash_estimate

    docs = [
        (0, "w1 w2 w3 w4 w5", "en", "s", 1),
        (1, "w1 w2 w3 w4 w5", "en", "s", 1),   # identical to 0
        (2, "a b c d", "en", "s", 1),           # shingles {abc, bcd}
        (3, "b c d e", "en", "s", 1),           # shingles {bcd, cde} -> J=1/3
        (4, "x y z q", "en", "s", 1),           # disjoint from all
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    rows = {
        (r.doc_a, r.doc_b): r
        for r in d57_minhash_estimate(spark, str(tmp_path)).collect()
    }
    ident = rows[(0, 1)]
    assert ident.n_match == 32 and ident.est_jaccard == 1.0
    assert ident.exact_jaccard == 1.0
    over = rows[(2, 3)]
    assert over.n_common == 1 and over.exact_jaccard == 1 / 3
    assert 0 <= over.n_match <= 32
    assert not any(4 in k for k in rows)


def test_d58_band_sweep_nesting_and_probe(spark, tmp_path):
    """Identical probe docs are candidates under every banding (equal
    signatures agree on every band) and count as the one relevant
    pair; aligned band boundaries nest the candidate sets, so
    n_candidates is monotone non-increasing in rows-per-band; docs
    without the 'dup' marker stay outside the probe even if they are
    exact duplicates."""
    from pinot_pulsar_plugin_spark.operators.dedup import d58_lsh_band_sweep

    base = "dup alpha beta gamma delta epsilon zeta eta theta iota"
    other = "dup one two three four five six seven eight nine ten"
    docs = [
        (0, base),
        (1, base),                        # exact duplicate of 0
        (2, other),                       # disjoint probe member
        (3, "kappa " + base.replace("dup ", "")),   # near 0/1 but NO marker
        (4, "kappa " + base.replace("dup ", "")),   # its exact twin, NO marker
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {
        r.label: r for r in d58_lsh_band_sweep(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {"b16r2", "b8r4", "b4r8"}
    for r in rows.values():
        assert r.n_relevant == 1          # only (0,1); 3/4 are unprobed
        assert r.n_true == 1 and r.recall_ppm == 1_000_000
        assert r.n_candidates >= 1
    # aligned boundaries nest candidate sets: coarser rows = fewer cands
    assert (
        rows["b16r2"].n_candidates
        >= rows["b8r4"].n_candidates
        >= rows["b4r8"].n_candidates
    )


def test_d59_savings_histogram(spark, tmp_path):
    """Three exact copies (normalization collapses case/whitespace)
    of a 10-char doc plus one 20-char copy pair plus a unique doc:
    group sizes 3, 2, 1 with savings = non-keeper chars; the keeper
    is min doc_id so savings use the OTHER copies' n_chars."""
    from pinot_pulsar_plugin_spark.operators.dedup import d59_dedup_savings

    docs = [
        (0, "Hello  World", 10),      # keeper of group A
        (1, "hello world", 11),       # dup of A (normalized)
        (2, "HELLO   world", 12),     # dup of A
        (3, "foo bar", 20),           # keeper of group B
        (4, "foo bar", 21),           # dup of B
        (5, "unique text", 9),        # singleton
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = {
        r.group_size: (r.n_groups, r.n_docs, r.chars_saved)
        for r in d59_dedup_savings(spark, str(tmp_path)).collect()
    }
    assert got == {
        3: (1, 3, 11 + 12),
        2: (1, 2, 21),
        1: (1, 1, 0),
    }


def test_d60_k_sensitivity_monotonics(spark, tmp_path):
    """An exact duplicate pair stays J=1 at every k; a half-
    overlapping pair decays below tau as k grows (specificity).
    Shingle volume grows... stays positive and the exact pair is
    counted at every k."""
    from pinot_pulsar_plugin_spark.operators.dedup import (
        d60_shingle_k_sensitivity,
    )

    base = "dup a b c d e f g h i j"
    half = "dup a b c d e q r s t u"     # shares a 5-token prefix
    docs = [(0, base), (1, base), (2, half)]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.k: (r.n_shingles, r.n_pairs, r.mean_jaccard_ppm)
        for r in d60_shingle_k_sensitivity(spark, str(tmp_path)).collect()
    }
    assert set(got) == {2, 3, 5}
    for k, (n_sh, n_pairs, mean_j) in got.items():
        assert n_sh > 0 and n_pairs >= 1      # the exact pair always hits
    # the exact duplicate keeps the mean high; at k=5 only the exact
    # pair survives tau, so mean = 1e6 exactly
    assert got[5][1] == 1 and got[5][2] == 1_000_000
    # wider shingles are more specific: pair count never increases
    assert got[2][1] >= got[3][1] >= got[5][1]


def _py_shingles(text: str) -> set:
    """Brute-force k=3 shingle set mirroring d52's tokenization
    exactly: lower, split on single spaces (Spark split semantics on
    the single-space-joined fuzz corpus), distinct joined 3-grams."""
    tk = text.lower().split(" ")
    return {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}


def _fuzz_d52_corpus(rng):
    """Random small-vocab corpus with planted near-dup mutations and an
    exact duplicate — small vocabulary forces shingle collisions so the
    prefix join is exercised, mutations put pairs AT the Jaccard
    boundary where the ceil() prefix-length arithmetic must be exact."""
    vocab = [f"w{i}" for i in range(8)]
    docs = []
    for _ in range(12):
        docs.append(" ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 18))))
    for _ in range(4):
        base = rng.choice([d for d in docs if d])
        tk = base.split(" ")
        op = rng.randrange(3)
        if op == 0:
            tk[rng.randrange(len(tk))] = rng.choice(vocab)
        elif op == 1:
            tk.insert(rng.randrange(len(tk) + 1), rng.choice(vocab))
        elif len(tk) > 1:
            del tk[rng.randrange(len(tk))]
        docs.append(" ".join(tk))
    docs.append(rng.choice([d for d in docs if d]))  # exact duplicate
    return [(i, d) for i, d in enumerate(docs)]


def test_fuzz_d52_prefix_filter_exact_recall_across_thresholds(
    spark, tmp_path, monkeypatch
):
    """d52's docstring PROVES full recall for any tau via the
    rarity-order prefix bound p = n - ceil(tau*n) + 1; the registry
    entry only ever runs tau=0.5. Sweep the proof across thresholds on
    random corpora against a brute-force all-pairs Python oracle: every
    (pair, n_common, jaccard) must match EXACTLY — prefix filtering is
    pruning, not approximation, so a single missed boundary pair means
    the ceil arithmetic is wrong."""
    import random

    from pinot_pulsar_plugin_spark.operators import dedup

    for case, tau in enumerate(
        [0.3, 0.5, 0.6, 2.0 / 3.0, 0.75, 0.8, 0.9, 0.95, 1.0]
    ):
        rng = random.Random(9200 + case)
        rows = _fuzz_d52_corpus(rng)
        out = tmp_path / f"c{case}"
        out.mkdir()
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            str(out / "documents.parquet")
        )
        monkeypatch.setattr(dedup, "_D52_TAU", tau)
        got = {
            (r.doc_a, r.doc_b): (r.n_common, r.jaccard)
            for r in dedup.d52_prefix_filter_jaccard(spark, str(out)).collect()
        }
        sh = {i: _py_shingles(d) for i, d in rows}
        exp = {}
        for a in range(len(rows)):
            for b in range(a + 1, len(rows)):
                sa, sb = sh[a], sh[b]
                if not sa or not sb:
                    continue
                c = len(sa & sb)
                j = c / (len(sa) + len(sb) - c)
                if j >= tau:
                    exp[(a, b)] = (c, j)
        assert set(got) == set(exp), (tau, set(got) ^ set(exp))
        for k, (c, j) in exp.items():
            gc, gj = got[k]
            assert gc == c and abs(gj - j) < 1e-12, (tau, k, got[k], exp[k])


def test_fuzz_d55_prefix_path_matches_brute_force(spark, tmp_path):
    """r14 moved d55's delta×corpus collision join onto d52's
    rarity-order prefix filter; full recall there is a theorem (the
    d52 fuzz above sweeps it), but the NEW interaction is the
    stop-filter (df > 10% of the corpus) feeding both the rarity order
    and the per-doc set sizes. Fuzz random small-vocab corpora (dense
    collisions + real stop-shingles) against a brute-force Python
    oracle of the full verdict semantics: exact-dup by normalized md5,
    near-dup by Jaccard >= 0.5 over STOP-FILTERED shingle sets,
    delta = odd ids vs corpus = even ids."""
    import hashlib
    import random
    import re as _re
    from collections import Counter

    from pinot_pulsar_plugin_spark.operators.dedup import d55_incremental_dedup

    for case in range(4):
        rng = random.Random(5500 + case)
        rows = _fuzz_d52_corpus(rng)
        out = tmp_path / f"c{case}"
        out.mkdir()
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            str(out / "documents.parquet")
        )
        spark.catalog.clearCache()
        got = {
            r.doc_id: (r.exact_dup, r.near_dup, r.keep)
            for r in d55_incremental_dedup(spark, str(out)).collect()
        }
        n_docs = len(rows)
        sh = {i: _py_shingles(d) for i, d in rows}
        df_counts = Counter(x for s in sh.values() for x in s)
        stop = {x for x, c in df_counts.items() if c > n_docs * 0.10}
        kept = {i: s - stop for i, s in sh.items()}

        def norm(t):
            return hashlib.md5(
                _re.sub(r"\s+", " ", t.lower()).strip().encode()
            ).hexdigest()

        corpus_sigs = {norm(d) for i, d in rows if i % 2 == 0}
        exp = {}
        for i, d in rows:
            if i % 2 == 0:
                continue
            exact = norm(d) in corpus_sigs
            near = False
            for j, _ in rows:
                if j % 2 != 0:
                    continue
                a, b = kept[i], kept[j]
                if not a or not b:
                    continue
                c = len(a & b)
                if c and c / (len(a) + len(b) - c) >= 0.5:
                    near = True
                    break
            exp[i] = (exact, near, not exact and not near)
        assert got == exp, (case, got, exp)
