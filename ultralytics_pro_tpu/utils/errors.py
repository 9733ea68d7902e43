"""Custom exceptions (reference ultralytics/utils/errors.py)."""

class HUBModelError(Exception):
    """Raised when a requested hub model is not found or access fails
    (reference errors.py HUBModelError)."""

    def __init__(self, message: str = "Model not found. Please check model URL and try again."):
        super().__init__(message)
