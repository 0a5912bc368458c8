"""spark-submit entry point for the crawl engine.

This is the multi-executor cluster path (reference: bin/run_worker.rb /
bin/restart_workers.rb fleet scripts — on Spark the cluster manager owns
the fleet, and one submitted driver owns the crawl):

    python scripts/make_pyfiles.py dist/cloud_crawler_spark.zip
    spark-submit --master spark://head:7077 --num-executors 16 \
        --py-files dist/cloud_crawler_spark.zip \
        scripts/submit_crawl.py \
        --pages s3a://bucket/pages.parquet --seeds s3a://bucket/seeds.parquet \
        --out s3a://bucket/crawl_out --depth 2 --host-budget 200

The script sets NO master/parallelism config of its own: master,
executor count (the N vs 4N scaling contrast), memory, and
spark.sql.shuffle.partitions all come from spark-submit flags, so the
same job artifact runs unchanged at both cluster sizes.

Inputs: a pages parquet in the Common-Crawl-ish shape
(url, warc_ts, html binary, text, lang) and a seeds parquet (url
string). `--synth N` generates the deterministic synthetic web
instead, to smoke-test the submit path with no data dependencies.

Outputs under --out: crawled/ and lineage/ parquet, checkpoint
snapshots (resumable with --resume), and one JSON metrics line on
stdout (urls, rounds, seconds, urls_per_sec).
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="pages parquet path (url, warc_ts, html, text, lang)")
    src.add_argument("--synth", type=int, metavar="N",
                     help="generate an N-page deterministic synthetic web instead")
    p.add_argument("--seeds", help="seeds parquet path (url string); required with --pages")
    p.add_argument("--n-seeds", type=int, default=None,
                   help="with --synth: number of seed URLs (default N/6)")
    p.add_argument("--out", required=True, help="output directory (crawled/, lineage/, checkpoint/)")
    p.add_argument("--depth", type=int, default=None, help="BFS depth limit (default unlimited)")
    p.add_argument("--max-rounds", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=None,
                   help="per-round global fetch cap (default: no cap)")
    p.add_argument("--host-budget", type=int, default=None,
                   help="per-host fetches per round (politeness)")
    p.add_argument("--outside-domain", action="store_true",
                   help="follow off-host links too")
    p.add_argument("--no-robots", action="store_true", help="skip the robots.txt gate")
    p.add_argument("--discard-page", action="store_true",
                   help="drop html bodies from crawled output")
    p.add_argument("--use-bloom", action="store_true",
                   help="probe the partitioned Bloom filter before the exact seen anti-join")
    p.add_argument("--resume", action="store_true",
                   help="resume from the last committed checkpoint under --out")
    p.add_argument("--no-checkpoint", action="store_true",
                   help="skip per-round checkpoint commits (faster, not resumable)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.pages and not args.seeds and not args.resume:
        raise SystemExit("--pages requires --seeds (or --resume)")

    # getOrCreate with no master: spark-submit supplies it, which is the
    # whole point — one artifact, any cluster size.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("cloud_crawler_spark.crawl").getOrCreate()

    from cloud_crawler_spark import CrawlConfig, Crawler
    from cloud_crawler_spark.sources.corpus import prepare_corpus
    from cloud_crawler_spark.sources.store import FrontierStore

    if args.synth:
        from cloud_crawler_spark.sources.webgen import synth_pages, synth_seeds

        n_hosts = max(args.synth // 200, 16)
        pages = synth_pages(spark, args.synth, n_hosts=n_hosts,
                            links_per_page=20, hot_host_frac=0.2)
        n_seeds = args.n_seeds or max(args.synth // 6, 8)
        seeds = synth_seeds(spark, n_seeds, args.synth, n_hosts=n_hosts,
                            hot_host_frac=0.2)
    else:
        pages = spark.read.parquet(args.pages)
        seeds = spark.read.parquet(args.seeds) if args.seeds else None

    corpus = prepare_corpus(pages)
    cfg = CrawlConfig(
        depth_limit=args.depth,
        max_rounds=args.max_rounds,
        batch_size=args.batch_size,
        host_budget=args.host_budget,
        outside_domain=args.outside_domain,
        obey_robots_txt=not args.no_robots,
        discard_page=args.discard_page,
        use_bloom=args.use_bloom,
    )
    store = None if args.no_checkpoint else FrontierStore(spark, args.out + "/checkpoint")
    crawler = Crawler(spark, corpus, cfg, store=store)

    t0 = time.time()
    res = crawler.resume() if args.resume else crawler.run(seeds)
    crawled = res.crawled
    if args.discard_page and "html" in crawled.columns:
        crawled = crawled.drop("html")
    crawled.write.mode("overwrite").parquet(args.out + "/crawled")
    res.lineage.write.mode("overwrite").parquet(args.out + "/lineage")
    n = spark.read.parquet(args.out + "/crawled").count()
    dt = time.time() - t0
    print(json.dumps({
        "urls": n,
        "rounds": res.rounds,
        "seconds": round(dt, 2),
        "urls_per_sec": round(n / dt, 1) if dt > 0 else None,
        "out": args.out,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
