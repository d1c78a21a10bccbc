class _Anything:
    def __call__(self, *a, **k): return _Anything()
    def __getattr__(self, n): return _Anything()
def use(*a, **k): pass
