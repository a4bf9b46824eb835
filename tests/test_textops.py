"""Dedup / similarity op correctness beyond "it runs"."""

import numpy as np
import pyarrow as pa


def test_minhash_finds_planted_neardups(ray_session):
    from osprey_ray.pipelines.textops import ngram_jaccard, q_minhash_neardup

    out = q_minhash_neardup("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out["jaccard_pct"] >= 70).all()
    # cross-batch consistency: signatures depend on token content, so the
    # same corpus through a different batch size yields the same pairs
    import duckdb

    con = duckdb.connect()
    texts = dict(
        con.execute(
            "SELECT doc_id, text FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
        ).fetchall()
    )
    for a, b, j in out.itertuples(index=False):
        assert ngram_jaccard(texts[a], texts[b]) >= 0.7


def test_simhash_near_for_similar_docs():
    from osprey_ray.pipelines.textops import simhash64

    a = simhash64("the quick brown fox jumps over the lazy dog again today")
    b = simhash64("the quick brown fox jumps over the lazy dog again tomorrow")
    c = simhash64("completely unrelated content about streaming state engines")
    ham_ab = bin(a ^ b).count("1")
    ham_ac = bin(a ^ c).count("1")
    assert ham_ab < ham_ac
    assert simhash64("x y z") == simhash64("x y z")


def test_winnow_fingerprints_overlap_for_shared_text():
    from osprey_ray.pipelines.textops import winnow_fingerprints

    base = "some long shared passage of text that appears in both documents verbatim"
    f1 = set(winnow_fingerprints(base + " plus suffix one"))
    f2 = set(winnow_fingerprints("prefix two plus " + base))
    f3 = set(winnow_fingerprints("entirely different material with no overlap at all here"))
    assert len(f1 & f2) > 0
    assert len(f1 & f3) == 0


def test_ann_lsh_recall_reasonable(ray_session):
    from osprey_ray.pipelines.ann import q_ann_lsh

    out = q_ann_lsh("/root/testdata/sf0.001").to_pandas()
    # random 64-d embeddings have weak neighbor structure; require recall
    # clearly above the chance baseline (candidates drawn uniformly)
    import duckdb

    n = duckdb.sql(
        "SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    ).fetchone()[0]
    chance = (out["n_candidates"] / (n - 1) * 100).mean()
    assert out["recall_pct"].mean() > chance * 1.5
    assert out["recall_pct"].mean() > 10
