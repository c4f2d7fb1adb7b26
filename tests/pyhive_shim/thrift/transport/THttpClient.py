class THttpClient:
    """Imported by pyhive.hive at module level; only the http thrift
    transport mode instantiates it — out of the shim's NOSASL scope."""

    def __init__(self, *a, **k):
        raise NotImplementedError("shim covers binary NOSASL transport only")
