class Reddit:
    def __init__(self, *a, **k): raise RuntimeError("network disabled in sandbox")
