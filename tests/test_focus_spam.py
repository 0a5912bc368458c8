"""Hand-computed semantics pins for the link-analysis additions:
salsa (degree-normalized HITS sibling), spam_mass (rank minus
trusted-core contribution), and shark_priorities (focused-crawl
frontier scoring). The DuckDB oracle rows (q_salsa / q_spam_mass /
q_shark_priority) prove cross-engine agreement at corpus scale; these
pin the closed-form arithmetic on graphs small enough to verify by
hand."""

import pytest

from cloud_crawler_spark import CrawlConfig, crawl
from cloud_crawler_spark.operators.focus import shark_priorities
from cloud_crawler_spark.operators.graph import salsa, spam_mass
from tests.helpers import make_corpus, make_seeds

HOST = "www.example.com"


def _crawl(spark, graph):
    return crawl(
        spark, make_corpus(spark, graph),
        make_seeds(spark, [f"http://{HOST}/0"]), CrawlConfig(),
    ).crawled


def test_salsa_two_iterations_by_hand(spark):
    # 0 -> {1,2}, 1 -> {2}: indeg(1)=1, indeg(2)=2, outdeg(0)=2,
    # outdeg(1)=1. a0 uniform over {1,2} = 0.5 each.
    # i1: h0=0.5+0.25=0.75, h1=0.25; a1=0.375, a2=0.625
    # i2: h0=0.375+0.3125=0.6875, h1=0.3125; a1=0.34375, a2=0.65625
    crawled = _crawl(spark, {"0": {"links": ["1", "2"]},
                             "1": {"links": ["2"]}, "2": {}})
    rows = {r["canon_url"].rsplit("/", 1)[1]: r
            for r in salsa(crawled, iterations=2).collect()}
    assert rows["1"]["authority"] == pytest.approx(0.34375)
    assert rows["2"]["authority"] == pytest.approx(0.65625)
    assert rows["0"]["authority"] == 0.0
    assert rows["0"]["hub"] == pytest.approx(0.6875)
    assert rows["1"]["hub"] == pytest.approx(0.3125)
    assert rows["2"]["hub"] == 0.0
    # both chains stay L1-normalized with no normalization pass
    assert sum(r["authority"] for r in rows.values()) == pytest.approx(1.0)
    assert sum(r["hub"] for r in rows.values()) == pytest.approx(1.0)


def test_spam_mass_one_iteration_by_hand(spark):
    # 0 -> 1, trusted = {0}, n=2, n_t=1, one iteration.
    # PR:  r0=.5 each; node 1 dangles (dm=.5):
    #      r(0)=.075+.85*.25=.2875, r(1)=.075+.85*.75=.7125
    # TR:  r0=(1,0); dm=0: r(0)=.15, r(1)=.85
    # core = TR * (1/2); mass = PR - core; rel = mass/PR
    crawled = _crawl(spark, {"0": {"links": ["1"]}, "1": {}})
    trusted = spark.createDataFrame(
        [(f"http://{HOST}/0",)], "canon_url string")
    rows = {r["canon_url"].rsplit("/", 1)[1]: r
            for r in spam_mass(crawled, trusted, iterations=1).collect()}
    assert rows["0"]["rank"] == pytest.approx(0.2875)
    assert rows["1"]["rank"] == pytest.approx(0.7125)
    assert rows["0"]["core"] == pytest.approx(0.075)
    assert rows["1"]["core"] == pytest.approx(0.425)
    assert rows["0"]["rel_spam_mass"] == pytest.approx(0.2125 / 0.2875)
    assert rows["1"]["rel_spam_mass"] == pytest.approx(0.2875 / 0.7125)


def test_spam_mass_trust_starved_farm_scores_high(spark):
    # a 2-page farm (3<->4) reachable only from untrusted 2; trusted
    # core {0,1} links to itself — farm pages must carry the highest
    # relative spam mass.
    crawled = _crawl(spark, {
        "0": {"links": ["1", "2"]}, "1": {"links": ["0"]},
        "2": {"links": ["3"]}, "3": {"links": ["4"]},
        "4": {"links": ["3"]},
    })
    trusted = spark.createDataFrame(
        [(f"http://{HOST}/0",), (f"http://{HOST}/1",)], "canon_url string")
    rows = {r["canon_url"].rsplit("/", 1)[1]: r["rel_spam_mass"]
            for r in spam_mass(crawled, trusted, iterations=3).collect()}
    farm_min = min(rows["3"], rows["4"])
    core_max = max(rows["0"], rows["1"])
    assert farm_min > core_max


def test_shark_priorities_inheritance(spark):
    # topic {x, y}: parent 10 text "x y" (rel 1.0), parent 20 text "z"
    # (rel 0). child 1 pointed at by 10 with anchor "y" (score
    # .5*1 + .5*.5 = .75) and by 20 with anchor "x y" (.5*0+.5*1=.5):
    # max wins -> .75, n_inlinks 2. child 2 only from 20, anchor ""
    # -> 0.0.
    pages = spark.createDataFrame(
        [(10, "x y"), (20, "z")], "id long, text string")
    edges = spark.createDataFrame(
        [(10, 1, "y"), (20, 1, "x y"), (20, 2, "")],
        "src long, dst long, anchor string")
    rows = {r["dst"]: r for r in
            shark_priorities(pages, edges, ["x", "y"]).collect()}
    assert rows[1]["priority"] == pytest.approx(0.75)
    assert rows[1]["n_inlinks"] == 2
    assert rows[2]["priority"] == pytest.approx(0.0)


def test_shark_priorities_unknown_parent_scores_anchor_only(spark):
    # an edge whose src page was never fetched contributes anchor
    # relevance only (parent relevance coalesces to 0)
    pages = spark.createDataFrame([(10, "x")], "id long, text string")
    edges = spark.createDataFrame(
        [(99, 5, "x y")], "src long, dst long, anchor string")
    (row,) = shark_priorities(pages, edges, ["x", "y"]).collect()
    assert row["priority"] == pytest.approx(0.5)


def test_shark_priorities_rejects_empty_topic(spark):
    pages = spark.createDataFrame([(1, "t")], "id long, text string")
    with pytest.raises(ValueError):
        shark_priorities(pages, pages.selectExpr(
            "id as src", "id as dst", "text as anchor"), [])
