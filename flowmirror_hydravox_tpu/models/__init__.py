from . import qwen2  # noqa: F401
