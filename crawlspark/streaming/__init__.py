"""Structured Streaming rendering of the crawl loop (SURVEY.md §2.9).

The contract's engine is batch-iterative (BASELINE.json:6) — rounds with
exact checkpoints, implemented in crawlspark.engine. This package maps the
same operators onto Structured Streaming for deployments where link
discovery arrives continuously:

- round            → micro-batch (foreachBatch / availableNow trigger)
- URL-seen set     → watermarked streaming dropDuplicates on url_hash
- crawl-delay      → per-host stateful gate (applyInPandasWithState)
- late links       → event-time watermark
"""

from crawlspark.streaming.frontier_stream import (  # noqa: F401
    canonical_url_stream,
    perhost_rate,
    politeness_gate,
    streaming_seen_filter,
)
