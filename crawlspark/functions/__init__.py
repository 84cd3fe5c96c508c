from crawlspark.functions.canon import (  # noqa: F401
    canonicalize_url,
    canonicalize_series,
    resolve_series,
    canonicalize_udf,
    resolve_udf,
    with_url_identity,
)
