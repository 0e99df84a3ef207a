from .macros import (
    bucketize,
    cents_to_dollars,
    cents_to_dollars_decimal,
    generate_surrogate_key,
)

__all__ = [
    "cents_to_dollars",
    "cents_to_dollars_decimal",
    "generate_surrogate_key",
    "bucketize",
]
