"""Canonical schemas for the interleaved-spans document table.

Input shape from BASELINE.json.input_hint / SURVEY.md §1.2:
    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int32>>

Output adds per-doc `confidence` (mean of valid span confidences, 0.0 if none —
reference ocr_components/local_ocr_engine.py:459-464), `extractor` (mandatory
engine name — reference ocr_engine_interface.py:72) and an error envelope
(reference ocr_workflow_orchestrator.py:308-319).
"""

from __future__ import annotations

from pyspark.sql import types as T

KINDS = ("text", "html", "pdf", "ocr", "media")

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT, False), False),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT, False), False),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("extractor", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("error_source", T.StringType(), True),
    ]
)

# Flattened DOM-node intermediate for the HTML boilerplate scorer (FIXTURES.md §3)
DOM_NODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("node_id", T.IntegerType(), False),
        T.StructField("parent_id", T.IntegerType(), True),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("tag", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("text_len", T.IntegerType(), False),
        T.StructField("link_text_len", T.IntegerType(), False),
        T.StructField("n_words", T.IntegerType(), False),
        T.StructField("keep", T.BooleanType(), False),
    ]
)
