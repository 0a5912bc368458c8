"""BPE training pinned EXACTLY against an independent pure-Python
reference implementation (Sennrich et al. 2016 greedy merges, same
(count desc, left asc, right asc) tie-break): same merge sequence,
same final symbolizations, same tokenization. This is the correctness
gate standing in for a SQL oracle — BPE is iterative and genuinely
non-SQL-expressible, so q_bpe_merges ships rows-only."""

from collections import Counter

from pyspark.sql import functions as F

from cloud_crawler_spark.operators.bpe import bpe_tokenize, train_bpe


# ------------------------- pure-Python reference (test-local, naive)


def _ref_word_counts(texts):
    c = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                c[w] += 1
    return c


def _ref_merge_word(syms, left, right):
    out = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def _ref_train(texts, n_merges, min_count=2):
    wc = _ref_word_counts(texts)
    vocab = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        # max by count, ties by (left asc, right asc)
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), c = best
        if c < min_count:
            break
        merges.append((l, r, c))
        vocab = {w: _ref_merge_word(s, l, r) for w, s in vocab.items()}
    return merges, vocab, wc


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "the low bar and the lower bar",
]


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_bpe_matches_reference_exactly(spark):
    n_merges = 10
    merges_df, vocab_df = train_bpe(_docs(spark, TEXTS), n_merges=n_merges)
    got = [(r["left"], r["right"], r["pair_count"])
           for r in merges_df.orderBy("rank").collect()]
    ref_merges, ref_vocab, ref_wc = _ref_train(TEXTS, n_merges)
    assert got == ref_merges

    got_vocab = {r["word"]: (r["n"], list(r["syms"]))
                 for r in vocab_df.collect()}
    assert got_vocab == {w: (ref_wc[w], ref_vocab[w]) for w in ref_vocab}


def test_bpe_min_count_early_stop(spark):
    # every word unique -> all pair counts are 1 < min_count=2: no merges
    merges_df, vocab_df = train_bpe(
        _docs(spark, ["abc def", "ghi jkl"]), n_merges=5
    )
    assert merges_df.count() == 0
    # vocab stays at character symbols
    assert all(list(r["syms"]) == list(r["word"])
               for r in vocab_df.collect())


def test_bpe_tokenize_known_and_oov(spark):
    docs = _docs(spark, TEXTS)
    _, vocab_df = train_bpe(docs, n_merges=10)
    ref_merges, ref_vocab, _ = _ref_train(TEXTS, 10)

    test_docs = spark.createDataFrame(
        [(100, "low newest zebra")], "doc_id long, text string"
    )
    out = bpe_tokenize(test_docs, vocab_df).collect()[0]
    expect = ref_vocab["low"] + ref_vocab["newest"] + list("zebra")  # OOV -> chars
    assert list(out["bpe_tokens"]) == expect
    assert out["n_bpe_tokens"] == len(expect)


def test_bpe_overlap_is_left_to_right(spark):
    # "aaaa" x3: first merge is (a,a) -> [aa, aa]; second (aa,aa) -> [aaaa]
    merges_df, vocab_df = train_bpe(
        _docs(spark, ["aaaa aaaa aaaa"]), n_merges=2
    )
    got = [(r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()]
    assert got == [("a", "a"), ("aa", "aa")]
    syms = vocab_df.where(F.col("word") == "aaaa").collect()[0]["syms"]
    assert list(syms) == ["aaaa"]
