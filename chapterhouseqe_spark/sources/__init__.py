"""Sources: multimodal column handling + custom Python data sources."""

from chapterhouseqe_spark.sources.multimodal import (
    attach_binary_payload,
    decode_features,
)
from chapterhouseqe_spark.sources.synthetic import (
    SyntheticDataSource,
    register_synthetic_source,
)

__all__ = [
    "SyntheticDataSource",
    "attach_binary_payload",
    "decode_features",
    "register_synthetic_source",
]
