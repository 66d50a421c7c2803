"""One-call curation pipeline: the standard pre-training document flow
(quality gate -> near-dup removal -> quota sampling) composed from the
individual operators, all lazy — a user gets the whole 100 TB curation pass
as a single DataFrame expression.

Stage shapes: the quality gate is a codegen filter fused into the scan; the
dedup stage shuffles only shingle/bucket keys (LSH) plus the tiny pair graph
(CC); sampling is another scan-fused filter. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..dedup.dedup import neardup_keep
from .quality import filter_quality
from .sampling import stratified_sample


def curate(
    df: DataFrame,
    *,
    min_tokens: int = 5,
    max_tokens: int | None = None,
    max_punct_ratio: float = 0.2,
    max_upper_ratio: float = 0.5,
    langs: list[str] | None = None,
    dedup_threshold: float | None = 0.05,
    sample_rates: dict[str, float] | None = None,
    salt: str = "curate",
    portable: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark: DataFrame | None = None,
    decontaminate_n: int = 13,
) -> DataFrame:
    """documents -> curated survivors.

    1. filter_quality: length window + punct/upper caps + lang allowlist.
    2. benchmark decontamination (skipped when ``benchmark`` is None):
       drop docs sharing any ``decontaminate_n``-gram with the eval set —
       before dedup, so a contaminated doc can't win a near-dup cluster
       and knock out its clean near-copies.
    3. two-tier near-dup removal (skipped when ``dedup_threshold`` is
       None): byte-identical collapse, then MinHash-LSH clusters over the
       unique representatives -> keep min-id doc per cluster. Identical
       output to single-tier LSH (identical docs always form Jaccard-1.0
       clusters won by their min id), but an identical-content cluster of c
       copies costs O(c) instead of O(c^2) candidate pairs — the dominant
       duplication mode in real crawls.
    4. deterministic stratified sampling by ``sample_rates`` (skipped when
       None) — reproducible across reruns/engines (portable hash).
    """
    kept = filter_quality(
        df,
        text_col=text_col,
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        max_punct_ratio=max_punct_ratio,
        max_upper_ratio=max_upper_ratio,
        langs=langs,
    )
    if benchmark is not None:
        from .decontaminate import decontaminate

        kept = decontaminate(
            kept, benchmark, n=decontaminate_n, id_col=id_col, text_col=text_col
        )
    if dedup_threshold is not None:
        # two-tier: byte-identical collapse first, LSH over unique
        # representatives only — identical output, but an identical-content
        # cluster of c copies contributes 1 row to the band self-join
        # instead of O(c^2) candidate pairs (the crawl-scale killer)
        kept = neardup_keep(
            kept,
            id_col=id_col,
            text_col=text_col,
            verify_threshold=dedup_threshold,
            portable=portable,
        )
    if sample_rates is not None:
        kept = stratified_sample(kept, sample_rates, id_col=id_col, salt=salt)
    return kept
