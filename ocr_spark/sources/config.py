"""S2 — job configuration load + broadcast (ref config_loader.py:68-146).

Mirrors the reference loader's contract exactly, minus its Python-logging
side effect (a Spark job configures log4j via spark-submit instead —
SURVEY.md §2.1 S2):

  * format switch by extension: .yaml/.yml → YAML, .json → JSON
    (ref config_loader.py:92-96)
  * EVERY failure mode falls back to a usable default config carrying an
    error marker under app_settings.error, never raises
    (ref :86-90 missing file, :96-103 unsupported extension, :105-110 empty
    file, :128-136 parse error, :137-146 unexpected error)
  * engine/extractor sub-config convention: nested 'config' key, else the
    flat entry minus {enabled, module, class}
    (ref ocr_workflow_orchestrator.py:63-66)

The parsed dict is driver-side; `broadcast_config` ships it to executors
once (sc.broadcast) instead of re-reading per task.
"""

from __future__ import annotations

import json
import os
from typing import Any

DEFAULT_CONFIG: dict[str, Any] = {
    "app_settings": {"default_extractor": None},
    "extractors": {},
}


def _fallback(error: str) -> dict[str, Any]:
    cfg = json.loads(json.dumps(DEFAULT_CONFIG))  # deep copy
    cfg["app_settings"]["error"] = error
    return cfg


def load_config(config_path: str = "config.yaml") -> dict[str, Any]:
    """Load YAML/JSON job config with the reference's fallback semantics."""
    if not os.path.exists(config_path):
        return _fallback(f"Config file {config_path} not found")

    ext = os.path.splitext(config_path)[1].lower()
    try:
        with open(config_path, encoding="utf-8") as f:
            if ext in (".yaml", ".yml"):
                import yaml

                data = yaml.safe_load(f)
            elif ext == ".json":
                data = json.load(f)
            else:
                return _fallback(f"Unsupported config format: {config_path}")
    except Exception as e:  # parse errors and I/O races both fall back
        return _fallback(f"Parsing error in {config_path}: {e}")

    if not data:
        return _fallback(f"Empty config file: {config_path}")
    return data


def extractor_config(cfg: dict[str, Any], name: str) -> dict[str, Any]:
    """Per-extractor config namespace: nested 'config' key, else the flat
    entry minus the structural keys (ref ocr_workflow_orchestrator.py:63-66)."""
    entry = (cfg.get("extractors") or {}).get(name) or {}
    nested = entry.get("config")
    if nested:
        return dict(nested)
    return {k: v for k, v in entry.items() if k not in ("enabled", "module", "class", "impl")}


def broadcast_config(spark, cfg: dict[str, Any]):
    """Ship the parsed config to executors once (SURVEY.md §1.2)."""
    return spark.sparkContext.broadcast(cfg)
