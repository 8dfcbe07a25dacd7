from . import text_norm, tokenizer  # noqa: F401
