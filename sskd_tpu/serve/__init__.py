from sskd_tpu.serve.app import AppState, create_app

__all__ = ["create_app", "AppState"]
