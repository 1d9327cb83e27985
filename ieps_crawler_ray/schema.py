"""Arrow schemas for the engine's logical tables (SURVEY.md §1).

``frontier``  — one BFS generation of candidates (queue/Queue.scala:38 analog)
``fetched``   — the per-round wide output of the fetch stage; pages, images
                and page_data are column/row projections of it (written once
                per round, derived lazily — no payload is ever written twice)
"""

import pyarrow as pa

FRONTIER_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("h1", pa.int64()),
    ("h2", pa.int64()),
    ("domain", pa.string()),
    ("kind", pa.int8()),            # 0=html 1=image 2=data
    ("parent_url", pa.string()),
    ("p_dom", pa.string()),         # sort key: parent domain
    ("p_seq", pa.int64()),          # sort key: parent seq
    ("cls", pa.int32()),            # sort key: enqueue class
    ("pos", pa.int32()),            # sort key: position within class
    ("con_type", pa.string()),      # images: conType quirk value
    ("alt", pa.string()),           # images: alt text (caption sidecar)
    # logical enqueue timestamp (parent's fetch completion = fetch_time +
    # delay_ms; 0 for roots/sitemap rows) — wait_ms = fetch_time -
    # enq_time is the frontier-queue wait statistic (A2 parity with the
    # reference's r/waitTime.R)
    ("enq_time", pa.int64()),
])

FETCHED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("h1", pa.int64()),
    ("h2", pa.int64()),
    ("domain", pa.string()),
    ("kind", pa.int8()),
    ("parent_url", pa.string()),
    ("seq", pa.int64()),
    ("fetch_time", pa.int64()),
    ("enq_time", pa.int64()),
    ("allowed", pa.bool_()),
    ("delay_ms", pa.int64()),
    ("download", pa.bool_()),
    ("stores_page", pa.bool_()),
    ("round", pa.int32()),
    # per-domain carried state after this round's schedule (every row of a
    # domain carries the domain's final values; max() per domain is exact)
    ("clock_after", pa.int64()),
    ("next_seq_after", pa.int64()),
    # page fields (kind 0 / disallowed)
    ("page_type", pa.string()),
    ("http_status", pa.int32()),
    ("html", pa.large_string()),
    ("content_hash", pa.string()),
    ("load_time_ms", pa.int64()),
    # image / page_data fields
    ("con_type", pa.string()),
    ("is_duplicate", pa.bool_()),
    ("downloaded", pa.bool_()),
    ("data", pa.large_binary()),
    ("content_type", pa.string()),
    ("data_type", pa.string()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("phash", pa.int64()),
    ("caption", pa.string()),
])
