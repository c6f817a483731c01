"""Filter-segments family (SURVEY §2.2 F7-F9): prefix/suffix character
budgets with optional clean-word variants.

Reference: Beginning750.py:11-45, End750.py:1-20, CleanBeginningDot250.py
(+9 parameterized siblings under filter_segments_methods/).

Two implementations with identical semantics:
- `filter_segments_py`: per-document kernel over a segment list (used
  inside method composition / pandas UDFs).
- `filter_segments_df`: native window expression over the exploded
  segments table — running `sum(length) over (partition by url order by
  seg_idx)` gates rows, a per-row word cut trims the boundary segment.
  This is the scale path: one window, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cut_words(text: str, limit: int, clean_alpha: bool, keep_digits: bool) -> str:
    """Budgeted word accumulation (Beginning750.get_segment:28-45;
    CleanBeginningDot250.clean_content_pdf_token:33-53). Reference quirk
    kept: the overflow check uses the CLEAN word but the running budget
    grows by the ORIGINAL word, and emitted words are the clean ones."""
    words = []
    text_len = 0
    for word in (text or "").split():
        if clean_alpha:
            clean = "".join(c for c in word if c.isalpha() or (keep_digits and c.isdigit()))
        else:
            clean = word
        if text_len + 1 + len(clean) > limit:
            break
        if clean:
            words.append(clean)
            text_len += 1 + len(word)
    return " ".join(words)


def filter_segments_py(
    segments: list[dict],
    budget: int = 750,
    from_end: bool = False,
    clean_alpha: bool = False,
    keep_digits: bool = False,
    keep_dot: bool = False,
    placeholder_on_empty: bool = False,
) -> list[dict]:
    """Reference semantics per document. segments: dicts with 'text'."""
    seq = list(reversed(segments)) if from_end else list(segments)
    total = 0
    out = []
    for seg in seq:
        remaining = budget - total
        if remaining <= 0:
            break
        cut = _cut_words(seg.get("text") or "", remaining, clean_alpha, keep_digits)
        new_seg = dict(seg)
        text = cut
        if keep_dot and text and (seg.get("text") or "").endswith("."):
            text += "."
        new_seg["text"] = text
        # budget grows by the EMITTED text including the kept dot — the
        # reference appends the dot to text_content before accumulating
        # total_text (CleanBeginningDot500.get_first_tokens:19-24)
        total += 1 + len(text)
        out.append(new_seg)
    if from_end:
        out = list(reversed(out))
    if placeholder_on_empty and (not out or "".join(s["text"].strip() for s in out) == ""):
        return [{"seg_idx": 0, "page": 1, "text": "no text", "seg_type": "TEXT", "ml_label": 1}]
    return out


def filter_segments_both_ends(
    segments: list[dict],
    budget_start: int = 600,
    budget_end: int = 600,
    clean_alpha: bool = True,
    keep_digits: bool = True,
    keep_dot: bool = True,
    placeholder_on_empty: bool = True,
) -> list[dict]:
    """CleanBeginning600End600.filter_segments: a 600-char cleaned prefix,
    then a 600-char cleaned suffix taken from the segments the prefix did
    NOT consume (the reference marks consumed segments via ml_label and
    excludes them from the end pass)."""
    front = filter_segments_py(
        segments, budget_start, clean_alpha=clean_alpha,
        keep_digits=keep_digits, keep_dot=keep_dot,
    )
    rest = list(segments)[len(front):]
    back = filter_segments_py(
        rest, budget_end, from_end=True, clean_alpha=clean_alpha,
        keep_digits=keep_digits, keep_dot=keep_dot,
    )
    out = front + back
    if placeholder_on_empty and (
        not out or "".join((s.get("text") or "").strip() for s in out) == ""
    ):
        return [{"seg_idx": 0, "page": 1, "text": "no text", "seg_type": "TEXT", "ml_label": 1}]
    return out


def filter_segments_grouped(
    segments: DataFrame,
    budget: int = 750,
    from_end: bool = False,
    clean_alpha: bool = False,
    keep_digits: bool = False,
    keep_dot: bool = False,
    url_col: str = "url",
    idx_col: str = "seg_idx",
    text_col: str = "text",
) -> DataFrame:
    """Reference-exact distributed path: applyInPandas per document runs
    the same sequential budget kernel as filter_segments_py (the
    reference's loop is stateful across segments — a boundary cut can let
    words from LATER segments in, which no window expression reproduces)."""
    import pandas as pd

    schema = segments.schema

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(idx_col)
        segs = pdf.to_dict("records")
        for s in segs:
            s["text"] = s.pop(text_col)
        kept = filter_segments_py(
            segs, budget, from_end, clean_alpha, keep_digits, keep_dot
        )
        cols = [f.name for f in schema.fields]
        if not kept:
            return pd.DataFrame(columns=cols)
        out = pd.DataFrame(kept).rename(columns={"text": text_col})
        for c in cols:  # placeholder rows may lack layout columns
            if c not in out.columns:
                out[c] = None
        return out[cols]

    return segments.groupBy(url_col).applyInPandas(run, schema=schema)


def filter_segments_df(
    segments: DataFrame,
    budget: int = 750,
    from_end: bool = False,
    clean_alpha: bool = False,
    keep_digits: bool = False,
    url_col: str = "url",
    idx_col: str = "seg_idx",
    text_col: str = "text",
) -> DataFrame:
    """Native window path over segments(url, seg_idx, text, ...).

    Running char budget via window sum; the boundary segment's word cut is
    an aggregate expression over the split words (no Python). NOTE: equals
    the reference kernel except in the boundary case where a partial cut
    would admit words from later segments — use filter_segments_grouped
    when exact parity matters; use this when budget >> word length and
    throughput matters."""
    if clean_alpha:
        pattern = r"[^\p{L}\p{Nd}]" if keep_digits else r"[^\p{L}]"
        word_expr = F.transform(
            F.split(F.col(text_col), r"\s+"), lambda w: F.regexp_replace(w, pattern, "")
        )
    else:
        word_expr = F.split(F.col(text_col), r"\s+")
    words = F.filter(word_expr, lambda w: w != "")

    seg_len = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w) + 1)
    order = F.col(idx_col).desc() if from_end else F.col(idx_col).asc()
    w_prev = (
        Window.partitionBy(url_col)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spent = F.coalesce(F.sum("_seg_len").over(w_prev), F.lit(0))

    df = segments.withColumn("_seg_len", seg_len).withColumn("_spent", spent)
    remaining = F.lit(budget) - F.col("_spent")

    # per-row word cut: keep words while cumulative length fits `remaining`
    # (aggregate carries (chars_used, kept_words) as a struct accumulator)
    cut = F.aggregate(
        words,
        F.struct(F.lit(0).alias("used"), F.array().cast("array<string>").alias("kept")),
        lambda acc, word: F.when(
            acc["used"] + F.length(word) + 1 <= remaining,
            F.struct(
                (acc["used"] + F.length(word) + 1).alias("used"),
                F.concat(acc["kept"], F.array(word)).alias("kept"),
            ),
        ).otherwise(acc),
        lambda acc: F.array_join(acc["kept"], " "),
    )

    return (
        df.filter(remaining > 0)
        .withColumn(text_col, cut)
        .drop("_seg_len", "_spent")
    )
