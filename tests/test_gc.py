"""Snapshot GC during a live crawl: expiring old snapshots every N rounds
must not change crawl ordering, the seen set, or resumability."""

from azure_blob_crawler_spark.plans.crawl_round import CrawlRunner
from azure_blob_crawler_spark.plans.simulator import simulate
from azure_blob_crawler_spark.sources import synthetic

N_SEEDS = 15
ROUND_SIZE = 8


def test_crawl_with_gc_matches_simulator(spark, tmp_path):
    runner = CrawlRunner(
        spark, str(tmp_path / "gcstore"), round_size=ROUND_SIZE, n_buckets=8,
        expire_every=2,
    )
    seeds = spark.createDataFrame(
        [(e["url"], e["depth"], e["discovery_seq"]) for e in synthetic.seed_frontier_py(N_SEEDS)],
        "url string, depth int, discovery_seq long",
    )
    runner.init_frontier(seeds, synthetic.robots_df(spark))
    metrics = runner.run(max_rounds=40)
    assert metrics, "crawl must progress"

    sim = simulate(
        [e["url"] for e in synthetic.seed_frontier_py(N_SEEDS)],
        {r["host"]: r["crawl_delay_s"] for r in synthetic.robots_rows()},
        round_size=ROUND_SIZE,
    )
    assert runner.claim_log() == sim.claim_log
    assert runner.seen_set() == sim.seen
    # GC actually expired history: frontier keeps at most keep_last manifests
    assert len(runner.store.history("frontier")) <= 3
    # tables still readable and consistent after the final GC
    assert runner.store.read("frontier").count() == len(sim.seen)
