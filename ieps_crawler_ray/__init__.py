"""ieps_crawler_ray — a Ray-Data-native web-crawl data-processing engine.

A from-scratch reimplementation of the data-processing capabilities of the
reference crawler (ghajduk3/ieps-crawler, see /root/reference and SURVEY.md):
a URL-frontier + fetch scheduler expressed as ``ray.data.Dataset`` pipelines
of ``map_batches`` over zero-copy Arrow batches, with sharded stateful actor
pools for the URL-seen set (cuckoo filter + exact tier), robots.txt caching,
and politeness scheduling; image decode / phash / caption stages; and
Parquet-based versioned table sinks with per-partition lineage manifests.

Layout:
  functions/  pure, heavily unit-tested operators (canonicalize, extract,
              robots, hashing, image codecs, text analysis, dedup sketches)
  state/      cuckoo/bloom filters and the sharded Ray actors built on them
  stages/     map_batches stage functions / actor classes
  sources/    synthetic corpus + web generators, frontier checkpoint I/O
  pipelines/  the BFS crawl driver loop, the single-threaded oracle,
              analytics pipelines over the TPC-H-ish testdata tables
"""

__version__ = "0.1.0"
