"""Media payload resolution (S1, ref ocr_workflow_orchestrator.py:153-178).

A `media_ref` names an opaque binary payload. Backends:

  * "synthetic" — deterministic bytes derived from the ref itself (sandbox
    default; the fake scan images the fixture corpus is built on).
  * "binaryFile" — at production scale the payloads live in object storage;
    the pipeline broadcast-joins a `spark.read.format("binaryFile")` sidecar
    on media_ref (J3, SURVEY.md §2.3) instead of fetching per row. Kept as a
    documented seam: `sidecar_df()` builds that frame.

Resolution happens INSIDE the Arrow-batched UDF stage (executor-side), never
on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np


def synth_media_bytes(media_ref: str) -> bytes:
    """Deterministic pseudo-scan: 32×32 uint8, 1-3 bright text bands on a
    dark background (so the fake band detector finds structure)."""
    seed = int.from_bytes(hashlib.sha256(media_ref.encode()).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 60, size=(32, 32), dtype=np.uint8)
    n_lines = 1 + seed % 3
    y = 2
    for _ in range(n_lines):
        h = 4 + int(rng.integers(0, 4))
        img[y : y + h, :] = rng.integers(150, 256, size=(h, 32), dtype=np.uint8)
        y += h + 3
    return img.tobytes()


def resolve_batch(refs: list[str], backend: str = "synthetic") -> list[bytes | None]:
    if backend == "synthetic":
        return [synth_media_bytes(r) if r else None for r in refs]
    raise NotImplementedError(
        f"media backend {backend!r}: production path is a broadcast join "
        "against a binaryFile sidecar (see sidecar_df), not per-row fetch"
    )


def sidecar_df(spark, glob_path: str):
    """Production-scale media sidecar: (media_ref, content) from binary files.
    Join pattern: F.broadcast(sidecar) on media_ref when the sidecar is small,
    else a bucketed shuffle join."""
    from pyspark.sql import functions as F

    bf = spark.read.format("binaryFile").load(glob_path)
    return bf.select(F.col("path").alias("media_ref"), F.col("content"))
