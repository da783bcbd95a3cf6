"""Config-tree tests (model: reference tests/test_config.py, SURVEY.md 4.2)."""

import warnings

import pytest
from pydantic import ValidationError

from sskd_tpu.config import LossConfig, Settings


def test_defaults():
    s = Settings()
    assert s.student.embedding_dim == 384
    assert s.student.model_name == "intfloat/e5-small-v2"
    assert s.teacher.model_name == "BAAI/bge-reranker-large"
    assert s.loss.margin_mse_weight == 0.6
    assert s.loss.temperature_start == 4.0
    assert s.loss.temperature_end == 2.0
    assert s.mining.stage == 3
    assert s.index.metric == "cosine"
    assert s.search.default_k == 10


def test_margin_mse_only_config_valid():
    # BASELINE config 2: Margin-MSE-only training must validate
    cfg = LossConfig(
        margin_mse_weight=1.0, listwise_kd_weight=0.0, contrastive_weight=0.0
    )
    assert cfg.margin_mse_weight == 1.0


def test_bundled_yaml_presets_load():
    from pathlib import Path

    for name in ("kd.yaml", "index.yaml", "service.yaml", "kd_marginmse_cached.yaml"):
        s = Settings.from_yaml(Path("configs") / name)
        assert s.student.embedding_dim == 384


def test_loss_weights_must_sum_to_one():
    with pytest.raises(ValidationError):
        LossConfig(margin_mse_weight=0.9, listwise_kd_weight=0.9, contrastive_weight=0.9)
    ok = LossConfig(margin_mse_weight=0.5, listwise_kd_weight=0.3, contrastive_weight=0.2)
    assert ok.margin_mse_weight == 0.5


def test_bounds():
    with pytest.raises(ValidationError):
        Settings.model_validate({"service": {"port": 99999}})
    with pytest.raises(ValidationError):
        Settings.model_validate({"mining": {"stage": 4}})
    with pytest.raises(ValidationError):
        Settings.model_validate({"search": {"default_k": 0}})


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("SEMANTIC_KD_SERVICE__PORT", "9090")
    monkeypatch.setenv("SEMANTIC_KD_SEARCH__RERANK_ENABLED", "true")
    monkeypatch.setenv("SEMANTIC_KD_STUDENT__MODEL_NAME", "my/model")
    s = Settings.from_env()
    assert s.service.port == 9090
    assert s.search.rerank_enabled is True
    assert s.student.model_name == "my/model"


def test_env_override_unknown_key_ignored(monkeypatch):
    monkeypatch.setenv("SEMANTIC_KD_NOPE__NADA", "1")
    s = Settings.from_env()
    assert s.service.port == 8000


def test_yaml_roundtrip(tmp_path):
    s = Settings()
    s.service.port = 8123
    s.loss.temperature_start = 3.5
    p = tmp_path / "cfg.yaml"
    s.to_yaml(p)
    s2 = Settings.from_yaml(p)
    assert s2.service.port == 8123
    assert s2.loss.temperature_start == 3.5
    assert s2.model_dump() == s.model_dump()


def test_production_warnings():
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        Settings.model_validate({"service": {"environment": "production"}})
    messages = [str(w.message) for w in caught]
    assert any("CORS wildcard" in m for m in messages)
    assert any("auth disabled" in m for m in messages)


def test_validate_for_production_lists_problems():
    s = Settings()
    problems = s.validate_for_production()
    assert any("cors" in p for p in problems)
    assert any("auth" in p for p in problems)

    hardened = Settings.model_validate(
        {
            "cors": {"allow_origins": ["https://example.com"]},
            "auth": {"enabled": True},
            "rate_limit": {"enabled": True},
        }
    )
    assert hardened.validate_for_production() == []


def test_get_settings_honors_config_path(monkeypatch, tmp_path):
    from sskd_tpu.config import get_settings, reset_settings_cache

    p = tmp_path / "cfg.yaml"
    s = Settings()
    s.service.port = 7777
    s.to_yaml(p)
    monkeypatch.setenv("SEMANTIC_KD_CONFIG_PATH", str(p))
    reset_settings_cache()
    try:
        assert get_settings().service.port == 7777
    finally:
        reset_settings_cache()


def test_debug_flag_flagged_by_production_audit():
    from sskd_tpu.config import Settings

    s = Settings.model_validate({"debug": True})
    assert s.debug is True
    assert any("debug" in p for p in s.validate_for_production())
    assert not any(
        "debug" in p for p in Settings().validate_for_production()
    )


def test_prometheus_port_field():
    from sskd_tpu.config import Settings

    s = Settings.model_validate({"monitoring": {"prometheus_port": 9108}})
    assert s.monitoring.prometheus_port == 9108
    assert Settings().monitoring.prometheus_port == 0  # same-port default
