from . import cfm, decoder, mas, model, text_encoder, vocoder  # noqa: F401
