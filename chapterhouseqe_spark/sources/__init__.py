"""Multimodal column handling (binary payloads + typed metadata)."""

from chapterhouseqe_spark.sources.multimodal import (
    attach_binary_payload,
    decode_features,
)

__all__ = ["attach_binary_payload", "decode_features"]
