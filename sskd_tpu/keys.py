"""API key lifecycle — generate / list / revoke / rotate
(reference: scripts/manage_api_keys.py:1-294).

Keys are ``sk_live_<token_urlsafe(24)>``, stored ONLY as PBKDF2-HMAC-SHA256
hashes in a chmod-600 keys.json; the plaintext is shown once at generation.
The reference's GCP Secret Manager sync maps to exporting the hash list for
``SEMANTIC_KD_API_KEY_HASHES``.
"""

from __future__ import annotations

import json
import os
import secrets
from datetime import datetime, timezone
from pathlib import Path

from sskd_tpu.exceptions import ValidationError_
from sskd_tpu.serve.middleware import APIKeyAuth
from sskd_tpu.utils.logging import get_logger

logger = get_logger("keys")

KEY_PREFIX = "sk_live_"


class APIKeyManager:
    def __init__(self, keys_path: str | Path = "artifacts/keys.json", salt: str = ""):
        self.path = Path(keys_path)
        self.salt = salt
        self._data: dict = {"keys": {}}
        if self.path.exists():
            with open(self.path) as f:
                self._data = json.load(f)
            self.salt = self._data.get("salt", salt)
        else:
            self._data["salt"] = salt

    def _save(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(self._data, f, indent=2)
        os.chmod(self.path, 0o600)  # reference: keys.json chmod 600

    # ------------------------------------------------------------------

    def generate(self, label: str) -> str:
        """Create a key; plaintext is returned ONCE and never stored."""
        key = KEY_PREFIX + secrets.token_urlsafe(24)
        key_hash = APIKeyAuth.hash_key(key, self.salt)
        self._data["keys"][label] = {
            "hash": key_hash,
            "created_at": datetime.now(timezone.utc).isoformat(),
            "revoked": False,
        }
        self._save()
        logger.info(f"generated key {label!r}")
        return key

    def list_keys(self) -> dict:
        return {
            label: {k: v for k, v in info.items() if k != "hash"}
            for label, info in self._data["keys"].items()
        }

    def revoke(self, label: str) -> None:
        if label not in self._data["keys"]:
            raise ValidationError_(f"unknown key label {label!r}")
        self._data["keys"][label]["revoked"] = True
        self._data["keys"][label]["revoked_at"] = datetime.now(
            timezone.utc
        ).isoformat()
        self._save()

    def rotate(self, label: str) -> str:
        """Revoke + regenerate under the same label."""
        if label in self._data["keys"]:
            self.revoke(label)
        return self.generate(label)

    def active_hashes(self) -> list[str]:
        return [
            info["hash"]
            for info in self._data["keys"].values()
            if not info.get("revoked")
        ]

    def export_env(self) -> str:
        """JSON for the SEMANTIC_KD_API_KEY_HASHES env var (the Secret
        Manager analog)."""
        return json.dumps(self.active_hashes())
