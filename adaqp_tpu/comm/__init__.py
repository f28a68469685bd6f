from .exchange import (  # noqa: F401
    exchange_fp,
    exchange_quant,
    variance_proxy,
    uniform_buckets,
)
