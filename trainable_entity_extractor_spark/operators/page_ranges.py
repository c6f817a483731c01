"""A10: valid-page-range inference (reference
use_cases/FilterValidSegmentsPagesUseCase.py:20-151) — the partition/
predicate-pushdown analog: learn from labeled boxes which page window can
contain the answer, then prune all other pages before parsing.

From training stats (per labeled document: start gap = first labeled page
- 1, end gap = pages - last labeled page, range size): front-anchored when
min(start_gaps) <= min(end_gaps), else back-anchored; no labels at all =>
first-4 + last-4 pages fallback.

In Spark the learned ranges become a native `filter(page BETWEEN …)` on
the segments table — Catalyst prunes from there.
"""

from __future__ import annotations

MAX_PAGES = 99999


class PageRangeModel:
    def __init__(self):
        self.start_gaps: list[int] = []
        self.end_gaps: list[int] = []
        self.range_sizes: list[int] = []

    def fit(self, docs: list[dict]) -> "PageRangeModel":
        """docs: [{'total_pages': int, 'label_pages': [int, ...]}]"""
        for doc in docs:
            label_pages = doc.get("label_pages") or []
            if not label_pages:
                continue
            total = doc.get("total_pages") or 1000
            self.range_sizes.append(max(label_pages) - min(label_pages) + 1)
            self.start_gaps.append(min(label_pages) - 1)
            self.end_gaps.append(total - max(label_pages))
        if not self.range_sizes:
            self.start_gaps, self.end_gaps, self.range_sizes = [0], [0], [MAX_PAGES]
        return self

    @property
    def is_unbounded(self) -> bool:
        return self.range_sizes == [MAX_PAGES]

    @staticmethod
    def _bounded_range(start: int, end: int, total: int) -> list[int]:
        start = max(0, start - 1)
        end = min(end + 1, total)
        return list(range(start + 1, end + 1))

    def valid_pages(self, total_pages: int) -> list[int]:
        if self.is_unbounded:
            # no labels: first-4 + last-4 pages (reference :142-151)
            pages = set(range(1, min(5, total_pages + 1)))
            pages |= {p for p in range(total_pages - 3, total_pages + 1) if p > 0}
            return sorted(pages)
        if min(self.start_gaps) <= min(self.end_gaps):  # front-anchored
            start = min(self.start_gaps)
            end = max(self.start_gaps) + max(self.range_sizes)
            return self._bounded_range(start, end, total_pages)
        start = total_pages - max(self.end_gaps) - max(self.range_sizes)
        end = total_pages - min(self.end_gaps)
        return self._bounded_range(start, end, total_pages)

    def to_dict(self) -> dict:
        return {
            "start_gaps": self.start_gaps,
            "end_gaps": self.end_gaps,
            "range_sizes": self.range_sizes,
        }

    @staticmethod
    def from_dict(d: dict) -> "PageRangeModel":
        m = PageRangeModel()
        m.start_gaps = d.get("start_gaps", [0])
        m.end_gaps = d.get("end_gaps", [0])
        m.range_sizes = d.get("range_sizes", [MAX_PAGES])
        return m


def filter_segments_to_valid_pages(segments, model: PageRangeModel, url_col: str = "url"):
    """Native pruning: per document keep only pages in the learned window.
    Uses the per-doc max(page) as total_pages (one window + one filter)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    totals = Window.partitionBy(url_col)
    df = segments.withColumn("_total_pages", F.max("page").over(totals))
    if model.is_unbounded:
        cond = (F.col("page") <= F.least(F.lit(4), F.col("_total_pages"))) | (
            F.col("page") >= F.col("_total_pages") - 3
        )
    elif min(model.start_gaps) <= min(model.end_gaps):
        start = max(0, min(model.start_gaps) - 1)
        end = max(model.start_gaps) + max(model.range_sizes) + 1
        cond = (F.col("page") >= start + 1) & (
            F.col("page") <= F.least(F.lit(end), F.col("_total_pages"))
        )
    else:
        start = F.greatest(
            F.col("_total_pages") - max(model.end_gaps) - max(model.range_sizes) - 1, F.lit(0)
        )
        end = F.col("_total_pages") - min(model.end_gaps) + 1
        cond = (F.col("page") >= start + 1) & (
            F.col("page") <= F.least(end, F.col("_total_pages"))
        )
    return df.filter(cond).drop("_total_pages")
