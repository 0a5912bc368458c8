"""Dedup + similarity operators: semantic unit tests (beyond the
DuckDB-oracle parity in test_queries_oracle)."""

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.operators import dedup as DD
from cloud_crawler_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),       # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog"),       # near dup
        (3, "completely different content about spark shuffles"),
        (4, "the quick brown fox jumps over the lazy cat"),       # near dup
        (5, "zzz unrelated words entirely here now"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = DD.exact_dedup(docs).collect()
    assert len(out) == 5  # 6 docs, one exact-dup pair
    by_id = {r["doc_id"]: r["n_copies"] for r in out}
    assert by_id[0] == 2  # representative is min doc_id
    assert 1 not in by_id


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = DD.minhash_dedup(docs, k=8, bands=4, threshold=0.7)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (0, 1) in got  # exact dup always survives
    # jaccard(0,2): 8 shared / 10 union = 0.8 (tokens are sets)
    assert (0, 2) in got
    assert all(a < b for a, b in got)


def test_lsh_chunked_expansion_identical(spark):
    """Chunked pair expansion (memory-bounded) must produce exactly the
    same pair set as unchunked, including a bucket far larger than the
    chunk size (one duplicate cluster of 40 docs -> one mega bucket)."""
    rows = [(i, "identical duplicate cluster text") for i in range(40)]
    rows += [(100 + i, f"unique document number {i} with words {i*7}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tiny = DD.lsh_candidate_pairs(df, k=8, bands=4, chunk=3)
    big = DD.lsh_candidate_pairs(df, k=8, bands=4, chunk=4096)
    t = {(r["doc_a"], r["doc_b"], r["band_id"]) for r in tiny.collect()}
    b = {(r["doc_a"], r["doc_b"], r["band_id"]) for r in big.collect()}
    assert t == b
    # the 40-clique contributes 40*39/2 pairs per band x 4 bands
    clique = {(a, b) for a, b, _ in t if a < 100 and b < 100}
    assert len(clique) == 40 * 39 // 2
    assert all(a < b for a, b, _ in t)


def test_lsh_duplicate_ids_no_self_pairs(spark):
    """Duplicate doc_ids in the input must not produce doc_a == doc_b."""
    rows = [(1, "same text twice"), (1, "same text twice"), (2, "same text twice")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = DD.lsh_candidate_pairs(df, k=4, bands=2).collect()
    assert pairs, "bucket of {1,1,2} must still pair 1 with 2"
    assert all(r["doc_a"] < r["doc_b"] for r in pairs)


def test_lsh_overflow_buckets_audit(spark):
    rows = [(i, "identical duplicate cluster text") for i in range(30)]
    rows += [(100, "another doc"), (101, "another doc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = DD.lsh_candidate_pairs(df, k=4, bands=2, max_bucket=10)
    assert all(
        r["doc_a"] >= 100 for r in capped.collect()
    ), "mega-bucket pairs must be dropped by the cap"
    audit = DD.lsh_overflow_buckets(df, k=4, bands=2, max_bucket=10).collect()
    assert audit and all(r["n_docs"] == 30 for r in audit)


def test_simhash_near_dup(spark, docs):
    out = DD.simhash_dedup(docs, max_hamming=4)
    got = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert (0, 1) in got  # identical text -> hamming 0
    ham = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out.collect()}
    assert ham[(0, 1)] == 0


def test_token_jaccard_consecutive(spark, docs):
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.token_jaccard_consecutive(docs).collect()
    }
    assert out[(0, 1)] == 1.0
    assert out[(2, 3)] < 0.2


def test_embedding_near_dups(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0]),   # near 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),   # opposite of 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r["id_a"], r["id_b"]): r["cos_sim"]
           for r in DD.embedding_near_dups(df, threshold=0.95).collect()}
    assert (0, 1) in out and out[(0, 1)] > 0.99
    assert (0, 2) not in out and (0, 3) not in out


@pytest.fixture(scope="module")
def embeddings(spark):
    # deterministic cluster structure: 3 clusters along axes
    rows = []
    for i in range(60):
        c = i % 3
        base = [0.0, 0.0, 0.0]
        base[c] = 1.0
        jitter = [((i * 37 + j * 11) % 19 - 9) / 100.0 for j in range(3)]
        rows.append((i, [b + j for b, j in zip(base, jitter)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_knn_topk(spark, embeddings):
    queries = embeddings.where(F.col("vec_id") < 3)
    out = SIM.brute_force_knn(embeddings, queries, k=4)
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        assert len(rs) == 4
        sims = [r["cos_sim"] for r in sorted(rs, key=lambda r: r["knn_rank"])]
        assert sims == sorted(sims, reverse=True)
        # nearest neighbors share the query's cluster (mod 3)
        top = sorted(rs, key=lambda r: r["knn_rank"])[0]
        assert top["neighbor_id"] % 3 == q % 3


def test_lsh_knn_recall(spark, embeddings):
    queries = embeddings.where(F.col("vec_id") < 6)
    exact = SIM.brute_force_knn(embeddings, queries, k=3)
    approx = SIM.lsh_knn(embeddings, queries, k=3, n_planes=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5  # bucketed candidates keep most true neighbors
    # approx must never invent similarities: every returned sim matches exact cosine
    from cloud_crawler_spark.operators.dedup import cosine  # noqa: F401
    assert all(q == q for q, _ in a)


def test_ivf_knn_recall(spark, embeddings):
    """IVF with n_probe=n_lists degenerates to exact; with fewer probes
    recall stays high on the clustered fixture."""
    queries = embeddings.where(F.col("vec_id") < 6)
    exact = SIM.brute_force_knn(embeddings, queries, k=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    full = SIM.ivf_knn(embeddings, queries, k=3, n_lists=4, n_probe=4, n_iters=2)
    f = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert f == e  # probing every list == brute force

    approx = SIM.ivf_knn(embeddings, queries, k=3, n_lists=4, n_probe=1, n_iters=2)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.5


def test_embedding_near_dups_lsh_default_matches_exact(spark, embeddings):
    """The no-bound default is banded sign-LSH bucketing (never an
    all-pairs theta join). Precision must be exact (cosine filter);
    recall vs the exhaustive path is pinned >= 0.9 on the clustered
    fixture (deterministic planes => deterministic result)."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in DD.embedding_near_dups(
            embeddings, threshold=0.95, max_id=1 << 40
        ).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in DD.embedding_near_dups(embeddings, threshold=0.95).collect()
    }
    assert approx <= exact            # no false positives, ever
    assert len(exact) > 0
    assert len(approx) >= 0.9 * len(exact)


def test_connected_components_multi(spark):
    # two components: {1,2,3,4} (chain) and {10,11}; labels = min id
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    out = {r["id"]: r["label"] for r in DD.connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_star_matches_label(spark):
    # star contraction and label propagation agree on a random graph
    # (both label every node with its component's min id)
    import random

    rnd = random.Random(7)
    raw = [(rnd.randrange(60), rnd.randrange(60)) for _ in range(80)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in raw if a != b], "doc_a long, doc_b long"
    )
    lab = {r["id"]: r["label"] for r in DD.connected_components(edges).collect()}
    star = {
        r["id"]: r["label"]
        for r in DD.connected_components(edges, algorithm="star").collect()
    }
    assert star == lab


def test_connected_components_star_long_chain(spark):
    # a 200-node path (diameter 199): label propagation's default
    # 20-round budget splits it; star contraction finishes in O(log n)
    # rounds — assert convergence (no RuntimeWarning) inside 15 rounds
    # and every node labeled with the global min
    import warnings

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "doc_a long, doc_b long"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = {
            r["id"]: r["label"]
            for r in DD.connected_components_star(edges, max_iter=15).collect()
        }
    assert out == {i: 0 for i in range(200)}


def test_connected_components_star_empty_strings_selfloops(spark):
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert DD.connected_components_star(empty).count() == 0
    # string ids (lexicographic min), duplicate edges, self-loops
    edges = spark.createDataFrame(
        [("b", "c"), ("c", "a"), ("c", "a"), ("x", "y"), ("y", "y")],
        "doc_a string, doc_b string",
    )
    out = {r["id"]: r["label"] for r in DD.connected_components_star(edges).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_connected_components_star_selfloop_only_id_kept(spark):
    # an id touched ONLY by a self-loop is a singleton row — the same
    # contract as the label algorithm (code-review r3 finding)
    edges = spark.createDataFrame(
        [(1, 2), (7, 7)], "doc_a long, doc_b long"
    )
    star = {r["id"]: r["label"] for r in DD.connected_components_star(edges).collect()}
    lab = {r["id"]: r["label"] for r in DD.connected_components(edges).collect()}
    assert star == lab == {1: 1, 2: 1, 7: 7}


def test_connected_components_star_shared_leaf_counterexample(spark):
    # Path 1-10-5-11-2 with NON-MONOTONE ids: after round 1 the edge
    # set is {(5,1),(5,2),(10,1),(11,2)} — parents and children are
    # disjoint, but leaf 5 has TWO parents. A convergence test that
    # only checks "no parent is a child" exits here with node 5
    # double-labeled and {2,11} split off (code-review r3 finding);
    # the fix also requires single-parent per child.
    edges = spark.createDataFrame(
        [(1, 10), (10, 5), (5, 11), (11, 2)], "doc_a long, doc_b long"
    )
    out = DD.connected_components_star(edges).collect()
    as_map = {r["id"]: r["label"] for r in out}
    assert len(out) == len(as_map) == 5  # no duplicate id rows
    assert as_map == {i: 1 for i in (1, 2, 5, 10, 11)}


def test_connected_components_star_random_nonmonotone_vs_label(spark):
    # randomized stress with shuffled (non-monotone) id spaces: star
    # must equal label propagation on every graph
    import random

    for seed in (3, 5, 9):
        rnd = random.Random(seed)
        ids = list(range(1000, 1090))
        rnd.shuffle(ids)
        edges = [
            (ids[rnd.randrange(90)], ids[rnd.randrange(90)]) for _ in range(70)
        ]
        df = spark.createDataFrame(
            [(a, b) for a, b in edges if a != b], "doc_a long, doc_b long"
        )
        lab = {
            r["id"]: r["label"]
            for r in DD.connected_components(df, max_iter=90).collect()
        }
        star = {
            r["id"]: r["label"]
            for r in DD.connected_components_star(df).collect()
        }
        assert star == lab, f"seed {seed}"


def test_lsh_incremental_pairs_prebanded_delta_equal(spark, docs):
    # the pre-banded fast path (signatures computed once by a caller
    # and shared) must produce exactly the raw-corpus result on BOTH
    # sides of the probe join
    base = docs.where("doc_id % 2 = 0")
    delta = docs.where("doc_id % 2 = 1")
    raw = sorted(
        tuple(r)
        for r in DD.lsh_incremental_pairs(base, delta, k=8, bands=4).collect()
    )
    pre = sorted(
        tuple(r)
        for r in DD.lsh_incremental_pairs(
            DD.lsh_banded(base, k=8, bands=4),
            DD.lsh_banded(delta, k=8, bands=4),
            k=8, bands=4,
        ).collect()
    )
    assert pre == raw


def test_lsh_incremental_pairs_ambiguous_frame_raises(spark, docs):
    # a frame that merely CARRIES band columns among others must not
    # silently skip signing: auto-detection only accepts the exact
    # (id_col, band_id, band_key) schema, else demands an explicit flag
    import pytest as _pytest

    base = docs.where("doc_id % 2 = 0")
    delta = docs.where("doc_id % 2 = 1")
    ambiguous = DD.lsh_banded(base, k=8, bands=4).join(
        base.select("doc_id", "text"), "doc_id"
    )
    with _pytest.raises(ValueError, match="base_banded"):
        DD.lsh_incremental_pairs(ambiguous, delta, k=8, bands=4)
    # the explicit flag resolves it (extra columns are projected away)
    ok = DD.lsh_incremental_pairs(
        ambiguous, delta, k=8, bands=4, base_banded=True
    )
    raw = DD.lsh_incremental_pairs(base, delta, k=8, bands=4)
    assert sorted(map(tuple, ok.collect())) == sorted(
        map(tuple, raw.collect())
    )


def test_lsh_cluster_edges_components_match_candidate_pairs(spark, docs):
    # path edges connect exactly what the clique edges connect
    lab_pairs = {
        r["id"]: r["label"]
        for r in DD.connected_components(
            DD.lsh_candidate_pairs(docs, k=8, bands=4)
            .select("doc_a", "doc_b").distinct()
        ).collect()
    }
    lab_path = {
        r["id"]: r["label"]
        for r in DD.connected_components(
            DD.lsh_cluster_edges(docs, k=8, bands=4), algorithm="star"
        ).collect()
    }
    assert lab_path == lab_pairs


def test_connected_components_incremental_matches_full(spark):
    # incremental(CC(old), delta) == CC(old ∪ delta), including ids
    # first seen in the delta
    import random

    rnd = random.Random(11)
    old = [(rnd.randrange(40), rnd.randrange(40)) for _ in range(50)]
    new = [(rnd.randrange(60), rnd.randrange(60)) for _ in range(25)]
    old_df = spark.createDataFrame(
        [(a, b) for a, b in old if a != b], "doc_a long, doc_b long"
    )
    new_df = spark.createDataFrame(
        [(a, b) for a, b in new if a != b], "doc_a long, doc_b long"
    )
    labels0 = DD.connected_components(old_df)
    inc = {
        r["id"]: r["label"]
        for r in DD.connected_components_incremental(labels0, new_df).collect()
    }
    full = {
        r["id"]: r["label"]
        for r in DD.connected_components(
            old_df.unionAll(new_df), algorithm="star"
        ).collect()
    }
    assert inc == full


def test_connected_components_incremental_merges_chains(spark):
    # two long chains whose labels merge through ONE delta edge: the
    # quotient graph the incremental pass clusters has 2 nodes, not 80
    chain = [(i, i + 1) for i in range(39)] + [(i, i + 1) for i in range(50, 89)]
    old_df = spark.createDataFrame(chain, "doc_a long, doc_b long")
    labels0 = DD.connected_components(old_df, algorithm="star")
    delta = spark.createDataFrame([(25, 70)], "doc_a long, doc_b long")
    out = {
        r["id"]: r["label"]
        for r in DD.connected_components_incremental(labels0, delta).collect()
    }
    assert set(out.values()) == {0}
    assert len(out) == 80  # 2 chains x 40 nodes, every id labeled


def test_dedup_clusters_megabucket_single_cluster(spark):
    # 100 exact duplicates = one LSH bucket = a 99-edge PATH under
    # lsh_cluster_edges: the default star CC must collapse it to ONE
    # cluster with one canonical (code-review r3: label propagation's
    # 20-round budget would shatter this into ~80 wrong clusters)
    rows = [(i, "the same exact duplicated text body") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = DD.dedup_clusters(df, k=8, bands=4).collect()
    assert len(out) == 100
    assert {r["cluster_id"] for r in out} == {0}
    assert sum(r["is_canonical"] for r in out) == 1


def test_dedup_clusters_star_algorithm_same_result(spark, docs):
    base = sorted(
        tuple(r) for r in DD.dedup_clusters(docs, k=8, bands=4).collect()
    )
    star = sorted(
        tuple(r)
        for r in DD.dedup_clusters(docs, k=8, bands=4,
                                   cc_algorithm="star").collect()
    )
    assert star == base


def test_dedup_clusters_singletons_and_canonicals(spark, docs):
    out = DD.dedup_clusters(docs, k=8, bands=4).collect()
    by_id = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in out}
    assert len(by_id) == 6          # every doc labeled, including isolated ones
    # cluster label is the min doc_id of the component; each cluster
    # has exactly one canonical and it is its own label
    for doc, (cl, canon) in by_id.items():
        assert cl <= doc
        assert canon == (1 if cl == doc else 0)
    canons = [d for d, (cl, c) in by_id.items() if c]
    assert all(by_id[c][0] == c for c in canons)
    # doc 3 and 5 share no shingles with anything: singleton clusters
    assert by_id[3] == (3, 1)
    assert by_id[5] == (5, 1)
    # the exact dup pair (0,1) must share a cluster rooted at 0
    assert by_id[0] == (0, 1)
    assert by_id[1][0] == 0 and by_id[1][1] == 0


def test_clean_corpus_gates_and_collapses(spark):
    """clean_corpus: lang gate drops 'und', token gate drops short
    docs, exact dedup keeps min id, simhash collapses reordered
    token sets (same distinct-token set => same simhash)."""
    en = "the cat and the dog ran to the house of the man in the rain " \
         "and it was wet for the day is long that it stays"   # >20 toks, en
    rows = [
        (0, en),                                   # survivor (en)
        (1, en),                                   # exact dup of 0
        (2, " ".join(reversed(en.split()))),       # same token set: near-dup
        (3, "xyzzy plugh " * 15),                  # no stopwords -> 'und'
        (4, "the and of to in is that it for"),    # en but < 20 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in DD.clean_corpus(df).collect()}
    assert set(out) == {0}, out
    r = out[0]
    assert r["lang_pred"] == "en"
    assert r["n_tokens"] >= 20
    # 0 survives exact dedup (1 collapsed first), then absorbs 2 in
    # the simhash cluster: cluster size 2
    assert r["n_near_dups"] == 2


def test_clean_corpus_keeps_distinct_languages(spark):
    en = "the cat and the dog went to the house of the man in the rain " \
         "and it was wet for all the day it is that long"
    de = "der hund und die katze in das haus mit von ist der mann war " \
         "nicht im regen und die der das ein eine zu den"
    df = spark.createDataFrame([(7, en), (8, de)], "doc_id long, text string")
    out = {r["doc_id"]: r["lang_pred"] for r in DD.clean_corpus(df).collect()}
    assert out == {7: "en", 8: "de"}


class TestHashedVectors:
    """Feature-hashing vectorizer (operators/similarity.hashed_vectors)."""

    def _run(self, spark, rows, **kw):
        from cloud_crawler_spark.operators.similarity import hashed_vectors
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r.doc_id: r for r in hashed_vectors(df, **kw).collect()}

    def test_same_text_same_vector(self, spark):
        out = self._run(spark, [(0, "alpha beta gamma"),
                                (1, "ALPHA  Beta\tgamma")], dim=8)
        assert out[0].vec == out[1].vec
        assert out[0].n_tokens == 3 and len(out[0].vec) == 8

    def test_counts_accumulate(self, spark):
        a = self._run(spark, [(0, "word"), (1, "word word word")], dim=8)
        assert [3 * x for x in a[0].vec] == list(a[1].vec)

    def test_empty_doc_zero_vector(self, spark):
        out = self._run(spark, [(0, ""), (1, "   ")], dim=8)
        for r in out.values():
            assert list(r.vec) == [0] * 8 and r.n_tokens == 0

    def test_l2_normalized(self, spark):
        import math
        out = self._run(spark, [(0, "alpha beta gamma delta")],
                        dim=8, l2_normalize=True)
        n = math.sqrt(sum(x * x for x in out[0].vec))
        assert abs(n - 1.0) < 1e-9

    def test_l2_empty_doc_stays_zero(self, spark):
        out = self._run(spark, [(0, "")], dim=8, l2_normalize=True)
        assert list(out[0].vec) == [0.0] * 8

    def test_feeds_knn(self, spark):
        # the vectorizer's output schema plugs straight into brute kNN
        from cloud_crawler_spark.operators.similarity import (
            brute_force_knn, hashed_vectors)
        df = spark.createDataFrame(
            [(i, f"token{i} shared common words here") for i in range(6)],
            "doc_id long, text string")
        vecs = hashed_vectors(df, dim=16, l2_normalize=True) \
            .select("doc_id", "vec")
        res = brute_force_knn(vecs, vecs.limit(2), k=3,
                              vec_col="vec", id_col="doc_id")
        assert res.count() == 6  # 2 queries x top-3


class TestTokenContainment:
    """Asymmetric containment near-dup screen
    (operators/dedup.token_containment_consecutive)."""

    def _run(self, spark, rows, **kw):
        from cloud_crawler_spark.operators.dedup import (
            token_containment_consecutive)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {(r.doc_a, r.doc_b): r
                for r in token_containment_consecutive(df, **kw).collect()}

    def test_subset_flagged_where_jaccard_misses(self, spark):
        short = "alpha beta gamma delta"
        longer = short + " " + " ".join(f"extra{i}" for i in range(12))
        out = self._run(spark, [(0, short), (1, longer)])
        r = out[(0, 1)]
        assert r.containment_a == 1.0
        assert r.jaccard == round(4 / 16, 6)
        assert r.superset_dup == 1  # Jaccard alone would keep both

    def test_symmetric_duplicate_not_superset(self, spark):
        out = self._run(spark, [(0, "same words here"),
                                (1, "same words here")])
        r = out[(0, 1)]
        assert r.jaccard == 1.0 and r.containment_a == 1.0
        assert r.superset_dup == 0  # plain dup: exact/Jaccard dedup's job

    def test_disjoint_docs(self, spark):
        out = self._run(spark, [(0, "aa bb cc"), (1, "dd ee ff")])
        r = out[(0, 1)]
        assert r.jaccard == 0.0 and r.containment_a == 0.0
        assert r.superset_dup == 0

    def test_containment_is_directional(self, spark):
        out = self._run(spark, [(0, "a b c d e f g h i j"), (1, "a b")])
        r = out[(0, 1)]
        assert r.containment_b == 1.0 and r.containment_a == 0.2

    def test_empty_doc(self, spark):
        out = self._run(spark, [(0, ""), (1, "words here")])
        r = out[(0, 1)]
        assert r.containment_a == 0.0 and r.superset_dup == 0


class TestSortedNeighborhood:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_near_dups_meet_in_window(self, spark):
        from cloud_crawler_spark.operators.dedup import sorted_neighborhood

        d = self._docs(spark, [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different text about database systems"),
        ])
        pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
                 for r in sorted_neighborhood(d, window=3,
                                              max_hamming=3).collect()}
        assert (0, 1) in pairs or (1, 0) in pairs
        assert all(h <= 3 for h in pairs.values())

    def test_identical_docs_hamming_zero(self, spark):
        from cloud_crawler_spark.operators.dedup import sorted_neighborhood

        d = self._docs(spark, [
            (0, "alpha beta gamma"), (1, "alpha beta gamma"),
        ])
        out = sorted_neighborhood(d, window=2, max_hamming=0).collect()
        assert len(out) == 1 and out[0]["hamming"] == 0
        # rank order (sh, id): doc 0 ranks first
        assert (out[0]["doc_a"], out[0]["doc_b"]) == (0, 1)

    def test_window_bounds_candidates(self, spark):
        from cloud_crawler_spark.operators.dedup import sorted_neighborhood

        # 5 identical docs, window=2: only 4 adjacent pairs, never the
        # full 10-pair quadratic
        d = self._docs(spark, [(i, "same text here") for i in range(5)])
        out = sorted_neighborhood(d, window=2, max_hamming=16).collect()
        assert len(out) == 4


class TestSparseCosinePairs:
    def test_exact_cosine_on_hand_corpus(self, spark):
        from cloud_crawler_spark.operators.similarity import (
            sparse_cosine_pairs,
        )

        d = spark.createDataFrame([
            (0, "apple banana cherry"),
            (1, "apple banana durian"),
            (2, "xylo zulu waldo"),
        ], "doc_id long, text string")
        got = {(r["doc_a"], r["doc_b"]): r["cos_sim"]
               for r in sparse_cosine_pairs(d, min_sim=0.1,
                                            max_df=10).collect()}
        # docs 0,1 share 2 of 3 equal-weight terms (idf ln(3/2) for
        # shared, ln 3 for unique): cos = 2a^2/(2a^2+b^2)
        import math
        a, b = math.log(3 / 2), math.log(3.0)
        want = 2 * a * a / (2 * a * a + b * b)
        assert set(got) == {(0, 1)}
        assert abs(got[(0, 1)] - round(want, 6)) < 1e-9

    def test_df_cut_kills_stopword_pairs(self, spark):
        from cloud_crawler_spark.operators.similarity import (
            sparse_cosine_pairs,
        )

        # 'the' appears in all docs: with max_df=2 it can't join pairs
        d = spark.createDataFrame([
            (0, "the alpha"), (1, "the beta"), (2, "the gamma"),
        ], "doc_id long, text string")
        assert sparse_cosine_pairs(d, min_sim=0.0, max_df=2).count() == 0


class TestCollocations:
    def test_pmi_ranks_true_collocation_first(self, spark):
        import math

        from cloud_crawler_spark.functions.text import collocations

        # "los angeles" always together; "a b" crossed with others
        d = spark.createDataFrame(
            [(i, "los angeles a b") for i in range(3)]
            + [(9, "b a a b")],
            "doc_id long, text string",
        )
        out = {r["gram"]: (r["n"], r["pmi"], r["rank"])
               for r in collocations(d, min_count=3, k=10).collect()}
        assert out["los angeles"][2] == 1  # top PMI
        # hand-check: c(los angeles)=3, B=12, c(los)=3, c(angeles)=3, T=16
        want = math.log((3 / 12) / ((3 / 16) * (3 / 16)))
        assert abs(out["los angeles"][1] - want) < 1e-12

    def test_min_count_gates_hapax(self, spark):
        from cloud_crawler_spark.functions.text import collocations

        d = spark.createDataFrame(
            [(0, "rare pair common common common common")],
            "doc_id long, text string",
        )
        grams = {r["gram"] for r in
                 collocations(d, min_count=2, k=10).collect()}
        assert "rare pair" not in grams
        assert "common common" in grams


class TestIncrementalLSH:
    DOCS = [
        (1, "spark joins shuffle data across the cluster nodes"),
        (2, "spark joins shuffle data across the cluster nodes"),  # dup of 1
        (3, "an entirely different document about web crawling"),
        (4, "spark joins shuffle data across the cluster nodes"),  # delta dup
        (8, "an entirely different document about web crawling"),  # delta dup of 3
        (12, "fresh unique delta content with no historical twin"),
    ]

    def _split(self, spark):
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        return (df.where(F.col("doc_id") % 4 != 0),
                df.where(F.col("doc_id") % 4 == 0))

    def test_probe_matches_and_base_never_self_pairs(self, spark):
        from cloud_crawler_spark.operators.dedup import lsh_incremental_pairs

        base, delta = self._split(spark)
        got = {(r.base_id, r.delta_id)
               for r in lsh_incremental_pairs(base, delta, k=8,
                                              bands=2).collect()}
        # each delta dup finds its base twins; base pair (1,2) absent
        assert (1, 4) in got and (2, 4) in got and (3, 8) in got
        assert all(b % 4 != 0 and d % 4 == 0 for b, d in got)
        assert not any(d == 12 for _, d in got)  # unique delta: no match

    def test_prebuilt_index_equals_corpus_base(self, spark):
        from cloud_crawler_spark.operators.dedup import (
            lsh_banded, lsh_incremental_pairs,
        )

        base, delta = self._split(spark)
        via_corpus = sorted(
            (r.base_id, r.delta_id, r.band_id)
            for r in lsh_incremental_pairs(base, delta, k=8,
                                           bands=2).collect())
        idx = lsh_banded(base, k=8, bands=2)
        via_index = sorted(
            (r.base_id, r.delta_id, r.band_id)
            for r in lsh_incremental_pairs(idx, delta, k=8,
                                           bands=2).collect())
        assert via_corpus == via_index

    def test_max_bucket_skips_mega_buckets(self, spark):
        from cloud_crawler_spark.operators.dedup import lsh_incremental_pairs

        # base: 5 identical docs (one mega bucket); delta: one more copy
        base = spark.createDataFrame(
            [(i, "same exact text every time") for i in (1, 2, 3, 5, 6)],
            "doc_id long, text string")
        delta = spark.createDataFrame(
            [(100, "same exact text every time")], "doc_id long, text string")
        full = lsh_incremental_pairs(base, delta, k=8, bands=2).collect()
        assert len(full) == 5
        capped = lsh_incremental_pairs(base, delta, k=8, bands=2,
                                       max_bucket=3).collect()
        assert capped == []
