"""Multimodal decode plumbing: codec choice is explicit, never inferred."""

from __future__ import annotations

import pandas as pd
import pytest

from pinot_pulsar_plugin_spark.operators.multimodal import (
    fake_decode_dims,
    make_decode_batches,
)


def _batch():
    return iter([pd.DataFrame({"doc_id": [1, 2], "payload": [b"abc", b"defgh"]})])


def test_fake_codec_is_default_and_deterministic():
    out = pd.concat(list(make_decode_batches()(_batch())))
    w, h, f = fake_decode_dims(3)
    assert (int(out.iloc[0]["width"]), int(out.iloc[0]["height"]), int(out.iloc[0]["n_frames"])) == (w, h, f)
    # same input → same output (no import-state dependence)
    out2 = pd.concat(list(make_decode_batches("fake")(_batch())))
    assert out.equals(out2)


def test_real_codec_is_explicit_opt_in_stub():
    """The real-codec path must be chosen by option, not by whether an
    image library is importable: a green pipeline stays green if pillow
    gets installed (VERDICT r1 'What's wrong' #4)."""
    with pytest.raises(NotImplementedError):
        list(make_decode_batches(codec="real")(_batch()))
    with pytest.raises(ValueError):
        make_decode_batches(codec="pil")


def test_resize_codec_semantics():
    """m58's resize step: explicit codec option (same contract as
    decode), aspect ratio preserved within the 224 target, never
    upscaled, floor-positive dims."""
    from pinot_pulsar_plugin_spark.operators.multimodal import make_resize_batches

    out = pd.concat(list(make_resize_batches()(_batch())))
    assert (out["out_w"] <= 224).all() and (out["out_h"] <= 224).all()
    assert (out["out_w"] >= 1).all() and (out["out_h"] >= 1).all()
    assert (out["scale"] <= 1.0).all()
    # no upscale: dims already within target stay identical
    within = (out["width"] <= 224) & (out["height"] <= 224)
    assert (out.loc[within, "out_w"] == out.loc[within, "width"]).all()
    with pytest.raises(NotImplementedError):
        list(make_resize_batches(codec="real")(_batch()))
    with pytest.raises(ValueError):
        make_resize_batches(codec="pil")


def test_m59_manifest_boundary_payload_sizes(spark, tmp_path):
    """Chunk-count boundaries where a round-instead-of-floor division
    would mint a phantom chunk: payloads of exactly 1, CHUNK-1, CHUNK,
    CHUNK+1, 2*CHUNK and the 2049-byte rounding trap must produce
    ceil(n/CHUNK) chunks whose lengths tile the payload exactly."""
    from pinot_pulsar_plugin_spark.operators.multimodal import (
        _MEDIA_CHUNK,
        m59_payload_chunk_manifest,
    )

    sizes = [1, _MEDIA_CHUNK - 1, _MEDIA_CHUNK, _MEDIA_CHUNK + 1,
             2 * _MEDIA_CHUNK, _MEDIA_CHUNK // 2 + 1]
    rows = [(i, "x" * n) for i, n in enumerate(sizes)]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = m59_payload_chunk_manifest(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, n in enumerate(sizes):
        cs = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        assert len(cs) == -(-n // _MEDIA_CHUNK), (i, n)
        assert sum(c.byte_len for c in cs) == n
        assert cs[-1].byte_start + cs[-1].byte_len == n
        for a, b in zip(cs, cs[1:]):
            assert b.byte_start == a.byte_start + a.byte_len


def test_m60_planted_edit_found_and_hash_reference(spark, tmp_path):
    """A single-character edit off the sampled positions perturbs the
    aHash by at most a few bits, so the planted near-copy pairs with
    its original; unrelated docs don't. The Spark hash also matches a
    sequential Python replica bit for bit (via the pair the replica
    predicts)."""
    from pinot_pulsar_plugin_spark.operators.multimodal import (
        _AHASH_MAX_HAMMING,
        _AHASH_SAMPLES,
        m60_phash_neardup_candidates,
    )

    base = " ".join(f"w{i:03d}" for i in range(60))  # 419 bytes
    edited = base[:-1] + "X"  # same length, one trailing char changed
    other = " ".join(f"z{i:03d}" for i in range(45))
    docs = [(0, base), (1, edited), (2, other)]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )

    def ahash(text: str) -> int:
        nb = len(text.encode())
        px = [ord(text[(k * nb) // _AHASH_SAMPLES]) for k in range(_AHASH_SAMPLES)]
        tot = sum(px)
        h = 0
        for k, p in enumerate(px):
            if p * _AHASH_SAMPLES > tot:
                h += (1 << k) if k < 63 else -(1 << 63)
        return h

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    expect_pair = hamming(ahash(base), ahash(edited)) <= _AHASH_MAX_HAMMING
    rows = m60_phash_neardup_candidates(spark, str(tmp_path)).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    assert expect_pair, "test corpus must plant a findable near-dup"
    assert (0, 1) in pairs, pairs
    assert pairs[(0, 1)] == hamming(ahash(base), ahash(edited))
    assert not any(2 in p for p in pairs), pairs


def test_m60_multibyte_text_parity(spark, tmp_path):
    """Non-ASCII payloads: the byte-derived pixel index can exceed the
    CHAR length (substr counts chars on both engines), where DuckDB
    ord('') = -1 but Spark ascii('') = 0 — the clamp must keep both
    engines on identical pixels. Also pins the empty-text pixel = 0
    rule. Review finding: fixtures are ASCII-only, so only this test
    exercises the divergence."""
    import duckdb

    from pinot_pulsar_plugin_spark.operators.multimodal import (
        m60_phash_neardup_candidates,
    )
    from pinot_pulsar_plugin_spark.registry import all_oracle_sql
    from tests.oracle_harness import compare

    docs = [
        (0, "héllo wörld " * 10 + "ünïcode tail"),   # 2-byte chars inflate bytes
        (1, "héllo wörld " * 10 + "ünïcode tail"),   # exact dup -> must pair
        (2, "日本語のテキスト " * 8),                  # 3-byte chars, much longer in bytes
        (3, ""),                                      # empty text
        (4, "plain ascii filler text " * 6),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    sdf = m60_phash_neardup_candidates(spark, str(tmp_path))
    duck = con.execute(
        all_oracle_sql()["m60_phash_neardup_candidates"]
    ).arrow().to_pandas(date_as_object=True)
    problems = compare("m60_multibyte", sdf, duck)
    assert not problems, problems
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in sdf.collect()}
    assert pairs.get((0, 1)) == 0  # exact dup found with identical hash


def test_m61_batches_partition_the_corpus(spark):
    """Collation totality: batches partition the corpus exactly (sum
    of n_members == #docs, every batch ≤ the configured size, ids are
    the expected div-range), and the audit stats are consistent
    (min ≤ max, sum within [n·64·min, n·64·max])."""
    from pinot_pulsar_plugin_spark.operators.multimodal import (
        _BATCH_DOCS,
        m61_training_batches,
    )
    from pinot_pulsar_plugin_spark.catalog import load_table

    sf = "/root/testdata/sf0.001"
    rows = m61_training_batches(spark, sf).collect()
    n_docs = load_table(spark, sf, "documents").count()
    assert sum(r.n_members for r in rows) == n_docs
    assert all(1 <= r.n_members <= _BATCH_DOCS for r in rows)
    assert {r.batch_id for r in rows} == set(range((n_docs + _BATCH_DOCS - 1) // _BATCH_DOCS))
    for r in rows:
        assert r.px_min <= r.px_max
        assert r.n_members * 64 * r.px_min <= r.px_sum <= r.n_members * 64 * r.px_max


def test_m62_savings_by_modality(spark, tmp_path):
    """doc_ids 0/3/6 are all 'image': two share identical bytes (one
    redundant copy, its full size saved); 1 is 'audio' singleton;
    2/5 are 'video' twins. Identical-digest copies have identical
    sizes, so savings = (sz-1) * member size."""
    from pinot_pulsar_plugin_spark.operators.multimodal import (
        m62_payload_dedup_savings,
    )

    docs = [
        (0, "same image bytes"),   # image, dup with 6
        (6, "same image bytes"),   # image
        (3, "another image"),      # image singleton
        (1, "audio one"),          # audio singleton
        (2, "video bytes"),        # video, dup with 5
        (5, "video bytes"),        # video
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.modality: (r.n_groups, r.n_payloads, r.n_redundant, r.bytes_saved)
        for r in m62_payload_dedup_savings(spark, str(tmp_path)).collect()
    }
    assert got == {
        "image": (2, 3, 1, len("same image bytes")),
        "audio": (1, 1, 0, 0),
        "video": (1, 2, 1, len("video bytes")),
    }


def test_m63_failure_accounting_through_arrow_path(spark, tmp_path):
    """Payload lengths constructed to hit the % 97 failure rule:
    exactly the 97- and 194-byte docs fail; the Arrow-batch accounting
    (counts, ppm, failed bytes) matches hand arithmetic."""
    from pinot_pulsar_plugin_spark.operators.multimodal import (
        m63_decode_failure_audit,
    )

    docs = [
        (0, "x" * 97),    # image, fails
        (3, "x" * 50),    # image, ok
        (6, "x" * 194),   # image, fails
        (1, "y" * 97),    # audio, fails
        (4, "y" * 10),    # audio, ok
        (2, "z" * 30),    # video, ok
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.modality: (r.n_payloads, r.n_failed, r.fail_ppm, r.bytes_failed)
        for r in m63_decode_failure_audit(spark, str(tmp_path)).collect()
    }
    assert got == {
        "image": (3, 2, 666666, 97 + 194),
        "audio": (2, 1, 500000, 97),
        "video": (1, 0, 0, 0),
    }
