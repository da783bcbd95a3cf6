"""Model registry + API key manager tests
(reference surface: scripts/model_registry.py, scripts/manage_api_keys.py)."""

import json

import pytest

from sskd_tpu.exceptions import ModelNotFoundError, ValidationError_
from sskd_tpu.keys import APIKeyManager
from sskd_tpu.registry import ModelRegistry
from sskd_tpu.serve.middleware import APIKeyAuth


@pytest.fixture
def model_dir(tmp_path):
    d = tmp_path / "model"
    d.mkdir()
    (d / "params.msgpack").write_bytes(b"fake model weights " * 100)
    (d / "sskd_config.json").write_text("{}")
    return d


class TestModelRegistry:
    def test_register_and_get(self, tmp_path, model_dir):
        reg = ModelRegistry(tmp_path / "reg.json")
        card = reg.register("kd_student", model_dir, metrics={"ndcg@10": 0.88})
        assert card["version"] == "v1"
        assert card["stage"] == "dev"
        assert len(card["weights_hash"]) == 12
        assert reg.get("kd_student")["version"] == "v1"

    def test_versions_increment(self, tmp_path, model_dir):
        reg = ModelRegistry(tmp_path / "reg.json")
        reg.register("m", model_dir)
        card2 = reg.register("m", model_dir)
        assert card2["version"] == "v2"
        assert reg.get("m")["version"] == "v2"  # latest pointer

    def test_promotion_chain(self, tmp_path, model_dir):
        reg = ModelRegistry(tmp_path / "reg.json")
        reg.register("m", model_dir)
        assert reg.promote("m")["stage"] == "staging"
        assert reg.promote("m")["stage"] == "production"
        with pytest.raises(ValidationError_):
            reg.promote("m")

    def test_compare_metrics(self, tmp_path, model_dir):
        reg = ModelRegistry(tmp_path / "reg.json")
        reg.register("m", model_dir, metrics={"ndcg@10": 0.80})
        reg.register("m", model_dir, metrics={"ndcg@10": 0.88})
        cmp = reg.compare("m", "v1", "v2")
        assert cmp["ndcg@10"]["delta"] == pytest.approx(0.08)

    def test_persistence(self, tmp_path, model_dir):
        reg = ModelRegistry(tmp_path / "reg.json")
        reg.register("m", model_dir)
        reg2 = ModelRegistry(tmp_path / "reg.json")
        assert reg2.get("m")["version"] == "v1"

    def test_unknown_model(self, tmp_path):
        with pytest.raises(ModelNotFoundError):
            ModelRegistry(tmp_path / "reg.json").get("ghost")

    def test_latest_pointer_and_sync(self, tmp_path, model_dir):
        reg = ModelRegistry(tmp_path / "reg.json")
        reg.register("m", model_dir)
        reg.write_latest_pointer(tmp_path / "latest.json")
        latest = json.loads((tmp_path / "latest.json").read_text())
        assert latest["m"]["version"] == "v1"
        dest = reg.sync_to(tmp_path / "bus", "m")
        assert (dest / "model" / "params.msgpack").exists()
        assert (dest / "card.json").exists()


class TestAPIKeyManager:
    def test_generate_verify_roundtrip(self, tmp_path):
        mgr = APIKeyManager(tmp_path / "keys.json", salt="pepper")
        key = mgr.generate("ci")
        assert key.startswith("sk_live_")
        auth = APIKeyAuth(api_key_hashes=mgr.active_hashes(), salt="pepper")
        assert auth.verify(key)

    def test_plaintext_never_stored(self, tmp_path):
        mgr = APIKeyManager(tmp_path / "keys.json")
        key = mgr.generate("x")
        raw = (tmp_path / "keys.json").read_text()
        assert key not in raw

    def test_file_mode_600(self, tmp_path):
        mgr = APIKeyManager(tmp_path / "keys.json")
        mgr.generate("x")
        mode = (tmp_path / "keys.json").stat().st_mode & 0o777
        assert mode == 0o600

    def test_revoke_and_rotate(self, tmp_path):
        mgr = APIKeyManager(tmp_path / "keys.json")
        mgr.generate("a")
        assert len(mgr.active_hashes()) == 1
        mgr.revoke("a")
        assert mgr.active_hashes() == []
        new = mgr.rotate("a")
        assert new.startswith("sk_live_")
        assert len(mgr.active_hashes()) == 1
        with pytest.raises(ValidationError_):
            mgr.revoke("ghost")

    def test_export_env(self, tmp_path):
        mgr = APIKeyManager(tmp_path / "keys.json")
        mgr.generate("a")
        hashes = json.loads(mgr.export_env())
        assert len(hashes) == 1 and len(hashes[0]) == 64
