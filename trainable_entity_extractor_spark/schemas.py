"""Canonical schemas (SURVEY.md §1.2).

Reference data model: pydantic BaseModels (ExtractionData / TrainingSample /
PdfDataSegment / Suggestion — see /root/reference/src/trainable_entity_extractor/domain/).
Here every entity is a fixed Spark StructType so Catalyst sees typed columns.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input table (BASELINE.json input_hint): Common-Crawl-style pages.
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# One text segment (reference PdfDataSegment: domain/PdfDataSegment.py:9-14).
SEGMENT_STRUCT = T.StructType(
    [
        T.StructField("seg_idx", T.IntegerType(), False),
        T.StructField("page", T.IntegerType(), True),
        T.StructField("left", T.DoubleType(), True),
        T.StructField("top", T.DoubleType(), True),
        T.StructField("width", T.DoubleType(), True),
        T.StructField("height", T.DoubleType(), True),
        T.StructField("seg_type", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("ml_label", T.IntegerType(), True),
    ]
)

SEGMENTS_SCHEMA = T.StructType(
    [T.StructField("url", T.StringType(), False)] + list(SEGMENT_STRUCT.fields)
)

# Label-space dimension (reference Option: domain/Option.py:4-7). Small, broadcast.
OPTION_STRUCT = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
    ]
)

# Emitted value (reference Value: domain/Value.py:6-23).
VALUE_STRUCT = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("label", T.StringType(), True),
        T.StructField("segment_text", T.StringType(), True),
    ]
)

# Training sample row (reference TrainingSample/LabeledData:
# domain/TrainingSample.py:13-17, domain/LabeledData.py:7-20).
SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("sample_id", T.StringType(), False),
        T.StructField("source_text", T.StringType(), True),
        T.StructField("label_text", T.StringType(), True),
        T.StructField("values", T.ArrayType(OPTION_STRUCT), True),
        T.StructField("language_iso", T.StringType(), True),
        T.StructField("segments", T.ArrayType(SEGMENT_STRUCT), True),
    ]
)

# Prediction input row (reference PredictionSample: domain/PredictionSample.py:9-13).
PREDICTION_SCHEMA = T.StructType(
    [
        T.StructField("entity_name", T.StringType(), False),
        T.StructField("source_text", T.StringType(), True),
        T.StructField("segments", T.ArrayType(SEGMENT_STRUCT), True),
    ]
)

# Output/suggestion row re-expressed as a triples table (reference Suggestion:
# domain/Suggestion.py:19-30): subj=entity/url, pred=extraction_name, obj=value.
TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj_id", T.StringType(), True),
        T.StructField("obj_label", T.StringType(), True),
        T.StructField("obj_text", T.StringType(), True),
        T.StructField("segment_text", T.StringType(), True),
        T.StructField("page", T.IntegerType(), True),
    ]
)

# Output geometry (reference SegmentBox.to_output: page_width/height and
# type dropped; coordinates scaled up x(1/0.75) — SegmentBox.py:23-45).
SEGMENT_BOX_STRUCT = T.StructType(
    [
        T.StructField("left", T.DoubleType(), True),
        T.StructField("top", T.DoubleType(), True),
        T.StructField("width", T.DoubleType(), True),
        T.StructField("height", T.DoubleType(), True),
        T.StructField("page_number", T.IntegerType(), True),
    ]
)

# Suggestion-shaped (one row per entity, values collected) — the predict()
# return surface, mirrors reference list[Suggestion].
SUGGESTIONS_SCHEMA = T.StructType(
    [
        T.StructField("entity_name", T.StringType(), False),
        T.StructField("values", T.ArrayType(VALUE_STRUCT), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("segment_text", T.StringType(), True),
        T.StructField("page_number", T.IntegerType(), True),
        T.StructField("segments_boxes", T.ArrayType(SEGMENT_BOX_STRUCT), True),
    ]
)
