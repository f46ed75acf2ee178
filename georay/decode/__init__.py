from .common import FeatureRow, DecodeResult
from .dispatch import decode_blob, decoder_for

__all__ = ["FeatureRow", "DecodeResult", "decode_blob", "decoder_for"]
