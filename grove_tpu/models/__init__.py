from . import layers, llama, clip, sam_encoder, sam_decoder, grove  # noqa: F401
