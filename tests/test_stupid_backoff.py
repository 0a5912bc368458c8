"""Stupid-backoff trigram LM (Brants et al. 2007) pinned against a
pure-Python reference that exercises all three backoff tiers: seen
trigram (relative frequency), unseen trigram with seen (w2,w3) bigram
(0.4 backoff), and OOV (0.16 * floor/N). The SQL oracle covers the
corpus-wide parity; this pins the per-tier arithmetic on a corpus
small enough to check by hand."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.operators.lm import stupid_backoff_score

ALPHA = 0.4

# ids 0-3 train (id%5<4), id 4 held out: its text mixes a trigram the
# train split contains, one it lacks (but whose (w2,w3) it has), and
# an OOV word
DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the rug"),
    (2, "a dog sat on the mat"),
    (3, "the dog ran to the mat"),
    (4, "the cat sat zebra on the mat"),
    (5, "hi"),  # < 3 tokens -> n_trigrams 0, NULL score
    (9, "the cat sat on the mat again"),  # held out, all tiers seen
]


def _ref_scores(docs, train_mod=5, train_keep=4, alpha=ALPHA):
    toks = {i: t.lower().split() for i, t in docs}
    train = [toks[i] for i, _ in docs if i % train_mod < train_keep]
    uni, big, tri = Counter(), Counter(), Counter()
    for t in train:
        uni.update(t)
        big.update(zip(t, t[1:]))
        tri.update(zip(t, t[1:], t[2:]))
    n = max(sum(uni.values()), 1)

    def s(w1, w2, w3):
        if tri[(w1, w2, w3)]:
            return tri[(w1, w2, w3)] / big[(w1, w2)]
        if big[(w2, w3)]:
            return alpha * big[(w2, w3)] / uni[w2]
        return alpha * alpha * max(uni[w3], 0.5) / n

    out = {}
    for i, _ in docs:
        t = toks[i]
        tris = list(zip(t, t[1:], t[2:]))
        if not tris:
            out[i] = (0, None)
        else:
            lps = [math.log(s(*g)) for g in tris]
            out[i] = (len(tris), round(sum(lps) / len(lps), 6))
    return out


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_trigrams"], r["avg_logscore"])
        for r in stupid_backoff_score(df).collect()
    }


def test_matches_reference(scored):
    want = _ref_scores(DOCS)
    assert set(scored) == set(want)
    for i in want:
        assert scored[i][0] == want[i][0], i
        if want[i][1] is None:
            assert scored[i][1] is None, i
        else:
            assert scored[i][1] == pytest.approx(want[i][1], abs=2e-6), i


def test_all_three_tiers_hit(scored):
    """Doc 4 must exercise trigram-hit, bigram-backoff AND OOV floor:
    its score strictly between the all-seen doc 9 and a pure-OOV
    lower bound, and strictly below doc 9 (backing off costs)."""
    assert scored[4][1] < scored[9][1]


def test_short_doc_null(scored):
    assert scored[5] == (0, None)
