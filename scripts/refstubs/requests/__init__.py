def get(*a, **k): raise RuntimeError("network disabled in sandbox")
def post(*a, **k): raise RuntimeError("network disabled in sandbox")
