import pandas as pd

def _frame():
    # DatetimeIndex so the reference's positional Close[-1] (pre-2.0
    # pandas idiom) falls back to positional indexing
    return pd.DataFrame({"Close": [1.0]},
                        index=pd.to_datetime(["2020-01-01"]))

def download(*a, **k):
    return _frame()

class Ticker:
    def __init__(self, *a, **k): pass
    def history(self, *a, **k):
        return _frame()
