"""S5/J1/J2 — static extractor registry + 3-level selection fallback.

The reference discovers engines by dynamic importlib from config entries
(ref ocr_workflow_orchestrator.py:40-89) and keeps a name→instance registry
with availability checks (:91-105). On Spark, dynamic import on executors is
an anti-pattern (code must ship with --py-files), so the registry is STATIC:
a dict of known extractor implementations; config selects and parameterizes
them. The discovery semantics are otherwise mirrored case by case:

  * `enabled != True`       → skipped            (ref :46-48, F1)
  * missing `impl`          → skipped            (ref :50-55 module/class)
  * unknown `impl`          → skipped            (ref :79-82 ImportError)
  * `initialize()` raises   → skipped            (ref :86-88)
  * `is_available()` False  → loaded-not-kept    (ref :74-78)

Selection (J1, ref :272-294) is the 3-level fallback chain:
  requested if available → app_settings.default_extractor if available →
  first available (registry order) → None.

Executor-side, extractors initialize lazily once per Python worker process
(`get_extractor` caches — mirrors the reference's one-time eager init S4,
shifted lazy because executors fork per node, not per driver).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class Extractor:
    """Extractor plugin: the Spark analogue of the OCREngine ABC
    (ref ocr_engine_interface.py:33-99)."""

    name: str
    kind: str  # span kind it handles
    extract: Callable[[str], str]  # text-payload extractors
    config: dict[str, Any] = field(default_factory=dict)
    initialize: Callable[[dict], None] | None = None
    available: bool = True

    def is_available(self) -> bool:
        return self.available


def _html_impl() -> Callable[[str], str]:
    from ocr_spark.operators.html_extract import extract_main_text

    return extract_main_text


def _pdf_impl() -> Callable[[str], str]:
    from ocr_spark.operators.pdf_layout import extract_pdf_text

    return extract_pdf_text


def _dummy_impl() -> Callable[[str], str]:
    # T9 canned result (ref stubs/dummy_engine.py:39-48)
    return lambda text: f"Dummy OCR result from DummyExtractor for {text or 'input'}"


def _cloud_impl() -> Callable[[str], str]:
    """Cloud-engine analogue (ref google_ocr_engine.py): media_ref → resolved
    grayscale → PNG encode (K13) → fake API → flatten (K14). Scalar form for
    the registry/selection surface; the batch path is dispatch.py's
    media_engine='cloud'."""
    from ocr_spark.operators.cloud_engine import recognize_cloud_batch
    from ocr_spark.sources.media import resolve_gray_batch

    def extract(media_ref: str) -> str:
        grays, ok = resolve_gray_batch([media_ref])
        if not ok[0]:
            raise ValueError(f"unresolvable media_ref: {media_ref!r}")
        texts, _confs = recognize_cloud_batch(grays)
        return texts[0]

    return extract


# the static registry: impl name → (kind, factory). Code ships via --py-files.
KNOWN_IMPLS: dict[str, tuple[str, Callable[[], Callable[[str], str]]]] = {
    "html_density": ("html", _html_impl),
    "pdf_xycut": ("pdf", _pdf_impl),
    "dummy": ("text", _dummy_impl),
    "cloud": ("media", _cloud_impl),
}


def discover_extractors(cfg: dict[str, Any]) -> dict[str, Extractor]:
    """S5 discovery over config['extractors'], mirroring the reference's
    skip/keep decisions. Returns name → Extractor for available ones only."""
    from ocr_spark.sources.config import extractor_config

    out: dict[str, Extractor] = {}
    for name, entry in (cfg.get("extractors") or {}).items():
        if not isinstance(entry, dict) or not entry.get("enabled", False):
            continue
        impl = entry.get("impl")
        if not impl or impl not in KNOWN_IMPLS:
            continue
        kind, factory = KNOWN_IMPLS[impl]
        econf = extractor_config(cfg, name)
        try:
            fn = factory()
            init = entry.get("initialize")
            if callable(init):
                init(econf)  # may raise → skip (ref :86-88)
        except Exception:
            continue
        ext = Extractor(name=name, kind=kind, extract=fn, config=econf)
        if entry.get("available") is False:  # loaded but reports unavailable
            ext.available = False
            continue
        out[name] = ext
    return out


def select_extractor(
    extractors: dict[str, Extractor],
    requested: str | None = None,
    cfg: dict[str, Any] | None = None,
) -> Extractor | None:
    """J1 3-level fallback (ref ocr_workflow_orchestrator.py:272-294)."""
    available = [n for n, e in extractors.items() if e.is_available()]
    if requested and requested in available:
        return extractors[requested]
    default = ((cfg or {}).get("app_settings") or {}).get("default_extractor")
    if default and default in available:
        return extractors[default]
    if available:
        return extractors[available[0]]
    return None


_WORKER_CACHE: dict[str, Callable[[str], str]] = {}


def get_extractor(impl: str) -> Callable[[str], str]:
    """Executor-side lazy singleton per worker process (S4 analogue)."""
    fn = _WORKER_CACHE.get(impl)
    if fn is None:
        kind, factory = KNOWN_IMPLS[impl]
        fn = factory()
        _WORKER_CACHE[impl] = fn
    return fn
