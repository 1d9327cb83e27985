"""Cluster job driver for the flagship crawl — the ``ray job submit``
entry point of the north rule.

On a real multi-node cluster (this sandbox is single-node, so the script
is exercised locally by ``python jobs/crawl_job.py --local``):

    ray job submit \
        --working-dir . \
        --runtime-env-json '{"py_modules": ["ieps_crawler_ray"]}' \
        -- python jobs/crawl_job.py \
        --out s3://bucket/crawl-run-01 --sf-dir /data/sf100

The job driver itself is thin on purpose: all distribution lives in the
Dataset pipeline (`pipelines/crawl.run_crawl`), which already
- hash-partitions the frontier on domain (``dpart``) so adding nodes
  splits domains, not rounds;
- writes resumable per-generation hive-partitioned parquet with
  per-partition lineage manifests (a resubmitted job skips completed
  generations — crash-safe under job retries);
- sizes actor-pool stages from the cluster total
  (``ray.cluster_resources()``), not a per-node constant.

Scaling protocol (two cluster sizes, N vs 4N): submit the same job to
both clusters and compare `fetched_urls_per_s` from the final manifest
summary this driver prints. In this sandbox the equivalent evidence is
produced by ``python bench.py --scaling`` (fresh processes at 2/8/32
cpus over the same world — see BASELINE.md).
"""

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--local", action="store_true",
                    help="run with a local ray.init (sandbox mode); "
                         "under `ray job submit` the cluster address "
                         "comes from the job runtime instead")
    args = ap.parse_args()

    import ray
    if args.local:
        ray.init(address="local", include_dashboard=False)
    elif not ray.is_initialized():
        ray.init()  # RAY_ADDRESS is injected by the job runtime

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ieps_crawler_ray.config import CrawlConfig
    from ieps_crawler_ray.pipelines import crawl as C
    from ieps_crawler_ray.pipelines.flagship import world_for_sf

    web = world_for_sf(args.sf_dir)
    t0 = time.time()
    C.run_crawl(web, CrawlConfig(out_dir=args.out, seeds=list(web.seeds)),
                resume=not args.no_resume)
    wall = time.time() - t0
    man = C._read_manifests(args.out)
    fetched = sum(m.get("fetched", 0) for m in man.values())
    print(json.dumps({"out": args.out, "rounds": len(man),
                      "fetched": fetched, "wall_sec": round(wall, 2),
                      "fetched_urls_per_s": round(fetched / wall, 2)}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
