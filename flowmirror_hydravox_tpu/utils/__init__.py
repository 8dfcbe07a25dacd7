from . import audio, masks  # noqa: F401
