"""J1/J2 — per-kind dispatch inside ONE Arrow-batched mapInPandas stage.

The reference selects an engine per document via a 3-level fallback chain
(ref ocr_workflow_orchestrator.py:272-294) and keeps a registry of loaded
engines (ref :40-105). Here the registry is a static dict kind→extractor
(code shipped with --py-files; no dynamic import on executors), and dispatch
is a branch on the `kind` column INSIDE the UDF — one Python stage for all
heavy kinds instead of one shuffle per kind.

Within each Arrow batch, spans are regrouped BY KIND and handed to the
extractors as columnar lists, so the per-span Python surface is the kernel
itself (DOM parse, XY-cut recursion, image kernels), not Spark bookkeeping.

Error envelopes follow the reference (ref ocr_workflow_orchestrator.py:308-319):
a failing span sets the document's `error`/`error_source` and the doc keeps
flowing with the span's original payload; the batch never dies.

Parity note: the reference's ImagePreprocessor exists but is never wired into
the orchestrator (ref :137-138 sets preprocessor=None) — we match: detection
runs on the raw grayscale; the preprocessing kernels are exposed and tested
standalone (operators/media_kernels.preprocess_pipeline).
"""

from __future__ import annotations

import re
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import types as T

from ocr_spark.schema import SPAN_STRUCT

STAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT, False), False),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("error_source", T.StringType(), True),
    ]
)

HEAVY = ("html", "pdf", "ocr", "media")


def _extract_one(kind: str, text: str | None, media_ref: str | None, backend: str):
    """Single-span extraction: returns (new_text, confidence|None).

    kind routing (J1): html → T8 boilerplate strip; pdf → K15/W3 XY-cut;
    ocr/media → media kernel chain (K1..K12 + T6).
    """
    if kind == "html":
        from ocr_spark.operators.html_extract import extract_main_text

        return extract_main_text(text or ""), None
    if kind == "pdf":
        from ocr_spark.operators.pdf_layout import extract_pdf_text

        return extract_pdf_text(text or ""), None
    # ocr / media
    from ocr_spark.operators.media_kernels import recognize_image
    from ocr_spark.sources.media import resolve_batch

    payload = resolve_batch([media_ref], backend)[0]
    if payload is None:
        raise ValueError(f"unresolvable media_ref: {media_ref!r}")
    return recognize_image(payload)


def _postprocess_text(text: str, rules) -> str:
    """Reference postprocessor on extracted heavy-kind text: clean whitespace
    then ordered rules (ref postprocessing_module.py:130-146). Runs on the
    short already-extracted strings inside the Arrow batch; the text-kind hot
    path uses the native-expression twin in functions/text.py."""
    t = text.replace("\r\n", "\n").replace("\r", "\n")
    t = t.strip()
    t = re.sub(r"[ \t]+", " ", t)
    t = re.sub(r"\n{2,}", "\n", t)
    for find, repl in rules:
        t = t.replace(find, repl)
    return t


def apply_heavy_kinds(df, rules: Sequence[tuple[str, str]], media_resolver: str = "synthetic"):
    """mapInPandas stage handling html/pdf/ocr/media spans of each doc.

    Input:  doc_id, spans (text-kinds already normalized natively).
    Output: STAGE_SCHEMA (extractor column added by the caller).
    """
    rules = list(rules)
    backend = media_resolver

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows: dict[str, list] = {
                "doc_id": [],
                "spans": [],
                "confidence": [],
                "error": [],
                "error_source": [],
            }
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                new_spans = []
                confs: list[float] = []
                has_media = False
                err = None
                err_src = None
                for s in spans:
                    kind = s["kind"]
                    text = s["text"]
                    if kind in HEAVY:
                        try:
                            new_text, conf = _extract_one(
                                kind, text, s["media_ref"], backend
                            )
                            new_text = _postprocess_text(new_text, rules)
                        except Exception as e:  # error envelope, keep flowing
                            new_text, conf = text, None
                            if err is None:
                                err = f"{type(e).__name__}: {e}"
                                err_src = kind
                        if kind in ("ocr", "media"):
                            has_media = True
                            if conf is not None:
                                confs.append(conf)
                        text = new_text
                    new_spans.append(
                        {
                            "kind": kind,
                            "text": text,
                            "media_ref": s["media_ref"],
                            "offset": s["offset"],
                        }
                    )
                # A2: overall confidence = mean of valid (>0) confidences,
                # 0.0 if media spans exist but none valid, null if no media.
                valid = [c for c in confs if c > 0.0]
                if has_media:
                    confidence = (sum(valid) / len(valid)) if valid else 0.0
                else:
                    confidence = None
                out_rows["doc_id"].append(doc_id)
                out_rows["spans"].append(new_spans)
                out_rows["confidence"].append(confidence)
                out_rows["error"].append(err)
                out_rows["error_source"].append(err_src)
            yield pd.DataFrame(out_rows)

    return df.mapInPandas(gen, schema=STAGE_SCHEMA)
