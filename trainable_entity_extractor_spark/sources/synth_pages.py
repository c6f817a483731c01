"""Deterministic, fully distributed synthetic Common-Crawl-style pages
(FIXTURES.md §1). No external data; generation is pure native Spark column
expressions (murmur3 `hash` + word-pool indexing), so the same (n, seed)
yields byte-identical rows at any parallelism — the basis of the
byte-identical-per-url invariant and the N vs 4N scaling benchmark.

Columns: url, warc_ts, html (binary), text, lang — BASELINE.json input_hint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

WORDS = (
    "the of and to in for on with as by from at is was are be this that it "
    "report committee session agenda resolution draft human rights council "
    "decision president assembly general secretary united nations document "
    "working group member states review annex paragraph article treaty law "
    "international development economic social cultural political freedom "
    "education health water climate energy trade finance budget programme"
).split()

# Phrases that play the role of extractable option labels / entity mentions.
PHRASES = [
    "adopted without a vote",
    "submitted by the secretariat",
    "human rights violations",
    "universal periodic review",
    "sustainable development goals",
    "rule of law",
    "climate change mitigation",
    "freedom of expression",
]

LANGS = ["en", "en", "en", "en", "en", "en", "es", "es", "fr", "ru"]
BAD_LANGS = ["eng", "xx"]  # ~2% invalid codes to exercise sanitize (F16)

HOT_DOMAINS = ["hot-a.example", "hot-b.example", "hot-c.example"]


def _pick(arr: list[str], key: Column) -> Column:
    lit = F.array(*[F.lit(x) for x in arr])
    return F.element_at(lit, (F.pmod(key, F.lit(len(arr))) + 1).cast("int"))


def synth_pages(spark: SparkSession, n_rows: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Generate n_rows pages. ~20% of rows land on 3 hot domains (skew
    exercise); each page has 3-7 paragraph segments of 8-23 words with a
    ~35% chance of one embedded phrase."""
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    h = lambda salt: F.abs(F.hash(i, F.lit(seed), F.lit(salt)))

    domain = F.when(
        F.pmod(h("dom"), 5) == 0, _pick(HOT_DOMAINS, h("hotdom"))
    ).otherwise(F.concat(F.lit("site"), F.pmod(h("site"), 97).cast("string"), F.lit(".example")))

    # ~1/7 of pages are near-duplicates of an earlier "base" page (Common-
    # Crawl boilerplate analog): content derives from cid, with one word
    # perturbed, so MinHash linking has true near-dup families to find.
    #
    # Staged projections keep each expression tree under the codegen size
    # limit (is_dup/cid inlined everywhere previously blew it, forcing
    # interpreted eval that cannot host downstream Python UDFs).
    is_dup = F.pmod(h("dup"), 7) == 0
    lang = F.when(F.pmod(h("langbad"), 50) == 0, _pick(BAD_LANGS, h("langbadpick"))).otherwise(
        _pick(LANGS, h("lang"))
    )
    staged = df.select(
        i.alias("id"),
        is_dup.alias("is_dup"),
        F.when(is_dup, i - F.pmod(i, F.lit(37))).otherwise(i).alias("cid"),
        domain.alias("domain"),
        lang.alias("lang"),
    )

    cid = F.col("cid")
    n_segs = (F.pmod(F.abs(F.hash(cid, F.lit(seed), F.lit("nseg"))), 5) + 3).cast("int")

    def seg_text(seg_idx: Column) -> Column:
        n_words = F.pmod(F.abs(F.hash(cid, seg_idx, F.lit(seed), F.lit("nw"))), 16) + 8

        # every conditional is expressed as concat(base, optional-suffix)
        # so no `when` duplicates a large subtree — keeps the generated
        # code under the codegen size limit.
        def one_word(w: Column) -> Column:
            base = _pick(WORDS, F.abs(F.hash(cid, seg_idx, w, F.lit(seed), F.lit("w"))))
            # ~30% of tokens carry a numeric suffix (ids/dates/codes — real
            # web text is token-diverse; without this every mention is
            # ~0.5-similar to every other and LSH blocking degenerates)
            roll = F.abs(F.hash(cid, seg_idx, w, F.lit(seed), F.lit("sfx")))
            suffix = F.when(
                F.pmod(roll, 10) < 3, F.pmod(roll, F.lit(99991)).cast("string")
            ).otherwise(F.lit(""))
            return F.concat(base, suffix)

        words = F.transform(
            F.sequence(F.lit(0), (n_words - 1).cast("int")), one_word
        )
        base = F.array_join(words, " ")
        phrase_roll = F.pmod(F.abs(F.hash(cid, seg_idx, F.lit(seed), F.lit("ph"))), 100)
        phrase = _pick(PHRASES, F.abs(F.hash(cid, seg_idx, F.lit(seed), F.lit("phx"))))
        phrase_suffix = F.when(phrase_roll < 35, F.concat(F.lit(" "), phrase)).otherwise(F.lit(""))
        # perturb duplicates: tweak the first word on segment 0 only
        dup_prefix = F.when(
            F.col("is_dup") & (seg_idx == 0),
            F.concat(F.lit("rev"), F.pmod(F.col("id"), F.lit(37)).cast("string"), F.lit(" ")),
        ).otherwise(F.lit(""))
        return F.concat(dup_prefix, base, phrase_suffix)

    staged = staged.withColumn(
        "segs", F.transform(F.sequence(F.lit(0), (n_segs - 1).cast("int")), seg_text)
    )

    html = F.concat(
        F.lit("<html><body>"),
        F.array_join(
            F.transform(F.col("segs"), lambda s: F.concat(F.lit("<p>"), s, F.lit("</p>"))), ""
        ),
        F.lit("</body></html>"),
    )

    return staged.select(
        F.concat(F.lit("https://"), F.col("domain"), F.lit("/doc/"), F.col("id").cast("string")).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(mins=F.col("id").cast("int"))
        ).alias("warc_ts"),
        html.cast("binary").alias("html"),
        F.array_join(F.col("segs"), "\n\n").alias("text"),
        F.col("lang"),
    )
