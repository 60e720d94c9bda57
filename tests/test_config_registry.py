"""S2 config-loader + S5/J1/J2 registry tests, mirroring the reference's own
suites: tests/test_config_loader.py (8 cases) and the engine-selection matrix
in tests/test_ocr_workflow_orchestrator.py:352-395."""

from __future__ import annotations

import json

import pytest

from ocr_spark.operators.registry import (
    KNOWN_IMPLS,
    discover_extractors,
    get_extractor,
    select_extractor,
)
from ocr_spark.sources.config import broadcast_config, extractor_config, load_config

# --------------------------- S2 config loader --------------------------------


def test_load_valid_yaml(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("app_settings:\n  default_extractor: html\nextractors:\n  html:\n    enabled: true\n")
    cfg = load_config(str(p))
    assert cfg["app_settings"]["default_extractor"] == "html"
    assert cfg["extractors"]["html"]["enabled"] is True


def test_load_valid_json(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"app_settings": {"default_extractor": "pdf"}}))
    assert load_config(str(p))["app_settings"]["default_extractor"] == "pdf"


def test_missing_file_falls_back():
    cfg = load_config("/nonexistent/nope.yaml")
    assert "not found" in cfg["app_settings"]["error"]
    assert cfg["extractors"] == {}


def test_invalid_yaml_falls_back(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("a: [unclosed\n  b: {")
    cfg = load_config(str(p))
    assert "Parsing error" in cfg["app_settings"]["error"]


def test_invalid_json_falls_back(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text("{not json")
    assert "Parsing error" in load_config(str(p))["app_settings"]["error"]


def test_empty_file_falls_back(tmp_path):
    p = tmp_path / "empty.yaml"
    p.write_text("")
    assert "Empty config" in load_config(str(p))["app_settings"]["error"]


def test_unsupported_extension_falls_back(tmp_path):
    p = tmp_path / "c.toml"
    p.write_text("x = 1")
    assert "Unsupported config format" in load_config(str(p))["app_settings"]["error"]


def test_extractor_config_nested_and_flat():
    cfg = {
        "extractors": {
            "a": {"enabled": True, "impl": "html_density", "config": {"k": 1}},
            "b": {"enabled": True, "impl": "pdf_xycut", "thresh": 0.5},
        }
    }
    assert extractor_config(cfg, "a") == {"k": 1}
    # flat fallback filters the structural keys (ref orchestrator :63-66)
    assert extractor_config(cfg, "b") == {"thresh": 0.5}
    assert extractor_config(cfg, "missing") == {}


def test_broadcast_config(spark):
    b = broadcast_config(spark, {"app_settings": {"x": 1}})
    assert b.value["app_settings"]["x"] == 1


# ------------------- S5 discovery + J1 selection matrix ----------------------


def _cfg(**extractors):
    return {"app_settings": {}, "extractors": extractors}


def test_discovery_skips_disabled():
    cfg = _cfg(h={"enabled": False, "impl": "html_density"})
    assert discover_extractors(cfg) == {}


def test_discovery_skips_missing_impl():
    cfg = _cfg(h={"enabled": True})
    assert discover_extractors(cfg) == {}


def test_discovery_skips_unknown_impl():
    cfg = _cfg(h={"enabled": True, "impl": "no_such_engine"})
    assert discover_extractors(cfg) == {}


def test_discovery_skips_init_failure():
    def boom(conf):
        raise RuntimeError("init failed")

    cfg = _cfg(h={"enabled": True, "impl": "html_density", "initialize": boom})
    assert discover_extractors(cfg) == {}


def test_discovery_skips_unavailable():
    cfg = _cfg(h={"enabled": True, "impl": "html_density", "available": False})
    assert discover_extractors(cfg) == {}


def test_discovery_loads_available():
    cfg = _cfg(
        h={"enabled": True, "impl": "html_density"},
        p={"enabled": True, "impl": "pdf_xycut", "config": {"x": 2}},
    )
    exts = discover_extractors(cfg)
    assert set(exts) == {"h", "p"}
    assert exts["p"].config == {"x": 2}
    assert exts["h"].kind == "html"


# the reference's engine-selection matrix (test_ocr_workflow_orchestrator
# :352-395): requested-available / requested-missing→default /
# default-missing→first / nothing→None


@pytest.fixture()
def three_extractors():
    cfg = _cfg(
        a={"enabled": True, "impl": "html_density"},
        b={"enabled": True, "impl": "pdf_xycut"},
        c={"enabled": True, "impl": "dummy"},
    )
    return discover_extractors(cfg)


def test_select_requested_available(three_extractors):
    assert select_extractor(three_extractors, requested="b").name == "b"


def test_select_requested_missing_uses_default(three_extractors):
    cfg = {"app_settings": {"default_extractor": "c"}}
    assert select_extractor(three_extractors, requested="zzz", cfg=cfg).name == "c"


def test_select_no_request_uses_default(three_extractors):
    cfg = {"app_settings": {"default_extractor": "b"}}
    assert select_extractor(three_extractors, cfg=cfg).name == "b"


def test_select_default_missing_uses_first(three_extractors):
    cfg = {"app_settings": {"default_extractor": "zzz"}}
    assert select_extractor(three_extractors, requested="yyy", cfg=cfg).name == "a"


def test_select_nothing_available():
    assert select_extractor({}, requested="a", cfg={}) is None


def test_worker_cache_singleton():
    f1 = get_extractor("html_density")
    f2 = get_extractor("html_density")
    assert f1 is f2
    assert "dummy" in KNOWN_IMPLS
    assert get_extractor("dummy")("X") == "Dummy OCR result from DummyExtractor for X"
