"""HUB authentication (reference ultralytics/hub/auth.py): API-key handling
with SETTINGS persistence. No network egress here, so `authenticate` validates
shape and records the key locally; the request layer is one method to swap."""

from __future__ import annotations

from ultralytics_pro_tpu.utils import LOGGER

API_KEY_URL = "https://hub.ultralytics.com/settings?tab=api+keys"


class Auth:
    id_token = api_key = model_key = False

    def __init__(self, api_key: str = "", verbose: bool = False):
        api_key = api_key.split("_")[0]
        from ultralytics_pro_tpu.utils.settings import SETTINGS

        self.api_key = api_key or str(SETTINGS.get("api_key", "") or "")
        if self.api_key:
            if self.authenticate():
                SETTINGS.update_and_save(api_key=self.api_key)
                if verbose:
                    LOGGER.info("HUB: authenticated (local ledger)")
        elif verbose:
            LOGGER.info(f"HUB: no API key; get one at {API_KEY_URL}")

    def authenticate(self) -> bool:
        """Key-shape validation (remote verification needs egress; the HTTP
        call is the only thing to add for live HUB)."""
        ok = isinstance(self.api_key, str) and len(self.api_key) >= 8
        if not ok and self.api_key:
            LOGGER.warning("HUB: invalid API key format")
        return ok

    def get_auth_header(self):
        return {"x-api-key": self.api_key} if self.api_key else None


def login(api_key: str = "", verbose: bool = True) -> bool:
    """`yolo login` verb (reference hub/__init__.py:login)."""
    return Auth(api_key, verbose=verbose).authenticate()


def logout():
    from ultralytics_pro_tpu.utils.settings import SETTINGS

    SETTINGS.update_and_save(api_key="")
    LOGGER.info("HUB: logged out")
