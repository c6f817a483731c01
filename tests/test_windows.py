"""Native window-operator tests (W1-W4, A8)."""

import pandas as pd
from pyspark.sql import functions as F

from trainable_entity_extractor_spark.operators.windows import (
    layout_modes,
    with_last_title,
    with_neighbor_features,
    with_neighbor_score_smoothing,
    with_reading_order,
)


def segs_df(spark):
    rows = []
    for d in ("a", "b"):
        for i, (typ, text) in enumerate(
            [("TITLE", "Heading One"), ("TEXT", "body one"), ("TEXT", "body two"),
             ("TITLE", "Heading Two"), ("TEXT", "body three")]
        ):
            rows.append(
                {"url": d, "seg_idx": i, "page": 1, "left": 10.0 * (i % 2), "top": 100.0 * i,
                 "width": 100.0, "height": 12.0, "seg_type": typ, "text": text, "ml_label": 0}
            )
    return spark.createDataFrame(pd.DataFrame(rows))


def test_reading_order(spark):
    df = segs_df(spark).drop("seg_idx")
    out = with_reading_order(df).filter("url = 'a'").orderBy("seg_idx").collect()
    assert [r["seg_idx"] for r in out] == [0, 1, 2, 3, 4]
    assert [r["top"] for r in out] == sorted(r["top"] for r in out)


def test_neighbor_features(spark):
    out = {
        (r["url"], r["seg_idx"]): r
        for r in with_neighbor_features(segs_df(spark)).collect()
    }
    assert out[("a", 0)]["prev_text"] is None
    assert out[("a", 1)]["prev_text"] == "Heading One"
    assert out[("a", 1)]["next_text"] == "body two"
    assert out[("a", 4)]["next_text"] is None


def test_last_title_carry_forward(spark):
    out = {
        (r["url"], r["seg_idx"]): r["last_title"]
        for r in with_last_title(segs_df(spark)).collect()
    }
    assert out[("a", 0)] is None  # nothing precedes the first title
    assert out[("a", 1)]["text"] == "Heading One"
    assert out[("a", 2)]["text"] == "Heading One"
    assert out[("a", 4)]["text"] == "Heading Two"


def test_neighbor_score_smoothing(spark):
    rows = [{"url": "a", "seg_idx": i, "score": s} for i, s in enumerate([0.1, 0.9, 0.1, 0.1, 0.1])]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = {r["seg_idx"]: r["selected"] for r in with_neighbor_score_smoothing(df, k=1).collect()}
    assert out == {0: True, 1: True, 2: True, 3: False, 4: False}


def test_layout_modes(spark):
    out = {r["url"]: r for r in layout_modes(segs_df(spark)).collect()}
    assert out["a"]["n_segments"] == 5
    assert out["a"]["height_mode"] == 12.0
    assert out["a"]["line_space_mode"] == 88.0  # 100-step tops, 12 height


def test_remove_repeated_headers_df(spark):
    """Distributed F12: page-edge text repeating on >=3 distinct pages is
    stripped; same text in the page body survives (only cluster members,
    all edge paragraphs, are removed — like the reference)."""
    from trainable_entity_extractor_spark.operators.windows import (
        remove_repeated_headers_df,
    )

    rows = []
    for page in range(1, 6):
        rows.append(("d1", page, 10.0, 12.0, "Annual Report"))        # edge header
        rows.append(("d1", page, 400.0, 12.0, f"body {page}"))         # unique body
    rows.append(("d1", 1, 420.0, 12.0, "Annual Report"))               # body copy, kept
    rows.append(("d1", 2, 20.0, 12.0, "rare note"))                    # edge, 1 page only
    # second doc: header on only 2 pages -> below max(ceil(0.2*2),3)=3, kept
    for page in (1, 2):
        rows.append(("d2", page, 10.0, 12.0, "Annual Report"))
    seg = spark.createDataFrame(
        rows, "url string, page int, top double, height double, text string"
    )
    out = remove_repeated_headers_df(seg, page_height=700.0)
    got = [(r["url"], r["page"], r["top"], r["text"]) for r in out.collect()]
    d1_headers_on_edge = [g for g in got if g[0] == "d1" and g[3] == "Annual Report" and g[2] < 140]
    assert d1_headers_on_edge == []  # 5-page cluster removed
    assert ("d1", 1, 420.0, "Annual Report") in got  # body copy kept
    assert ("d1", 2, 20.0, "rare note") in got  # single-page edge kept
    assert len([g for g in got if g[0] == "d2"]) == 2  # below min_pages kept
    assert len([g for g in got if g[3].startswith("body")]) == 5


def test_repeated_headers_df_matches_list_variant_on_exact_headers(spark):
    """Parity: on corpora whose repeated headers are EXACT duplicates
    (the case where the distributed exact-text clustering and the
    per-document fuzz>90 clustering coincide), remove_repeated_headers_df
    must keep exactly the texts the list-based alignment pass keeps."""
    import random

    from trainable_entity_extractor_spark.operators.alignment import (
        paragraph_features,
        remove_repeated_headers,
    )
    from trainable_entity_extractor_spark.operators.windows import (
        remove_repeated_headers_df,
    )

    rng = random.Random(5)
    page_height = 700.0
    rows, pars = [], []
    for page in range(1, 9):
        per_page = []
        if page <= 7:
            # whitespace variants must cluster together (normalization)
            banner = "Top  Banner 2024" if page % 2 else "Top Banner 2024"
            per_page.append((banner, 5.0))
        # same text at BOTH edges of page 1-2: member-count semantics
        # (the reference counts cluster members, not distinct pages)
        if page <= 2:
            per_page.append(("Mirrored Notice", 8.0))
            per_page.append(("Mirrored Notice", 665.0))
        per_page += [
            (f"unique body {page}-{i} {rng.randint(0, 9)}", 200.0 + 30 * i) for i in range(3)
        ]
        if page >= 3:
            per_page.append(("Footer Line", 660.0))
        for text, top in per_page:
            rows.append(("docA", page, float(top), 12.0, text, "TEXT"))
            pars.append(
                paragraph_features(
                    {"text": text, "page": page, "seg_type": "TEXT", "top": top, "height": 12.0},
                    len(pars),
                )
            )
    # typed header dropped unconditionally by both variants
    rows.append(("docA", 4, 300.0, 12.0, "one-off page header", "PAGE_HEADER"))
    pars.append(
        paragraph_features(
            {"text": "one-off page header", "page": 4, "seg_type": "PAGE_HEADER",
             "top": 300.0, "height": 12.0},
            len(pars),
        )
    )
    seg = spark.createDataFrame(
        rows, "url string, page int, top double, height double, text string, seg_type string"
    )

    def norm(t):
        return " ".join(t.split())

    df_kept = sorted(
        (r["page"], norm(r["text"]))
        for r in remove_repeated_headers_df(seg, page_height=page_height).collect()
    )
    list_kept = sorted(
        (p["page"], p["text"]) for p in remove_repeated_headers(pars, page_height=page_height)
    )
    assert df_kept == list_kept
    assert all(t != "Mirrored Notice" for _, t in df_kept)  # 4 members >= 3
    assert all("Banner" not in t for _, t in df_kept)  # normalized cluster
    assert all("one-off" not in t for _, t in df_kept)  # typed drop


def test_remove_repeated_headers_df_null_seg_type_kept(spark):
    """A NULL seg_type must not be swallowed by the typed-segment filter:
    ~isin(...) is NULL (treated as false) for NULL inputs, so without the
    explicit isNull() arm every untyped segment would vanish."""
    from trainable_entity_extractor_spark.operators.windows import (
        remove_repeated_headers_df,
    )

    rows = [
        ("d", 1, 300.0, 12.0, "untyped body", None),
        ("d", 1, 310.0, 12.0, "typed body", "TEXT"),
        ("d", 2, 300.0, 12.0, "typed footer", "PAGE_FOOTER"),
    ]
    seg = spark.createDataFrame(
        rows, "url string, page int, top double, height double, text string, seg_type string"
    )
    kept = {r["text"] for r in remove_repeated_headers_df(seg, page_height=700.0).collect()}
    assert kept == {"untyped body", "typed body"}


def test_remove_repeated_headers_df_distinct_pages_variant(spark):
    """distinct_pages=True counts pages, not members: a header+footer pair
    repeating the same text twice per page on 2 pages has 4 members but
    only 2 distinct pages — below min_cluster_pages=3, so it is KEPT under
    the crawl variant while the member-count default strips it."""
    from trainable_entity_extractor_spark.operators.windows import (
        remove_repeated_headers_df,
    )

    rows = []
    for page in (1, 2):
        rows.append(("d", page, 5.0, 12.0, "Mirrored Notice"))
        rows.append(("d", page, 665.0, 12.0, "Mirrored Notice"))
        rows.append(("d", page, 300.0, 12.0, f"body {page}"))
    seg = spark.createDataFrame(
        rows, "url string, page int, top double, height double, text string"
    )
    default_kept = {r["text"] for r in remove_repeated_headers_df(seg, page_height=700.0).collect()}
    assert "Mirrored Notice" not in default_kept  # 4 members >= 3
    distinct_kept = {
        r["text"]
        for r in remove_repeated_headers_df(seg, page_height=700.0, distinct_pages=True).collect()
    }
    assert "Mirrored Notice" in distinct_kept  # only 2 distinct pages < 3
