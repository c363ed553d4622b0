"""Large-scale data-processing operators beyond the reference's SQL
surface: deduplication, similarity search, multimodal columns, as-of
joins.  All are compositions of DataFrame ops (explode / groupBy /
join) — no driver-side loops, no row-at-a-time Python — so they scale
with the cluster."""

from sparkplans.operators import (  # noqa: F401
    asof,
    dedup,
    multimodal,
    quality,
    rollup,
    similarity,
    zorder,
)
