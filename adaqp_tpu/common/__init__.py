from .types import (  # noqa: F401
    GNNType,
    Mode,
    Scheme,
    AggregatorType,
    BITS_SET,
)
