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


def _install_empty_split_log_filter() -> None:
    """Suppress Ray Data's schema-divergence warning for the one case
    that is structurally benign: a ZERO-COLUMN empty bundle following a
    real one. Ray's sort-based groupby exchange normalizes blocks to
    pandas and builds empty range splits (duplicate sampled boundaries
    when key cardinality < block count) as column-less frames; Ray
    itself treats the reverse direction (empty old schema → real new
    schema) as benign and skips the warning
    (ray/data/_internal/execution/streaming_executor_state.py:783-793,
    block.py:_is_empty_schema). We cannot give those splits their
    schema from user code — they are produced inside the sort — so we
    filter exactly that message shape and nothing else."""
    import logging

    class _EmptySplitFilter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            if "RefBundle with a different schema" not in msg:
                return True
            # empty pandas split (zero-column frame) or empty arrow
            # schema (prints as the empty string)
            benign = ("new schema: PandasBlockSchema(names=[], "
                      "types=[])" in msg
                      or "new schema: . This may lead" in msg)
            return not benign

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySplitFilter())


_install_empty_split_log_filter()
