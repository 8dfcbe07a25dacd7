from . import attention, rope, sampling  # noqa: F401
