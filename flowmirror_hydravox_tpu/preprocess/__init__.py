from . import vad  # noqa: F401
