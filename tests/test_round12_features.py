"""Round-12 session: precision + robustness fixes from round-4 ADVICE.

- exact int64 running MIN/MAX when |v| >= 2^53 (float64 kernels would
  silently round; ``misc.py`` now takes a sentinel int64 path)
- rolling (bounded-frame) MIN/MAX over such values raises loudly
  instead of corrupting
"""

import duckdb
import pandas as pd
import pytest

from datavec_ray.sql import sql
from datavec_ray.util import dataset_to_table

BIG = 1 << 60  # far above the 2^53 float64 mantissa bound


@pytest.fixture(scope="module")
def bigint_frame():
    return pd.DataFrame({
        "id": range(8),
        "g": [0, 0, 0, 0, 1, 1, 1, 1],
        "v": pd.array([BIG + 5, None, BIG + 3, BIG + 9,
                       -BIG - 2, -BIG - 7, None, -BIG - 1],
                      dtype="Int64"),
    })


def test_bigint_running_minmax_exact(ray_session, bigint_frame):
    import ray.data as rd
    t = rd.from_pandas(bigint_frame).repartition(2)
    q = ("select id, "
         "min(v) over (partition by g order by id, v "
         "rows unbounded preceding) as lo, "
         "max(v) over (partition by g order by id, v "
         "rows unbounded preceding) as hi from t")
    got = dataset_to_table(sql(q, {"t": t})).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", bigint_frame)
    want = con.sql(q).df().sort_values("id").reset_index(drop=True)
    for c in ("lo", "hi"):
        assert got[c].astype("Int64").equals(want[c].astype("Int64")), \
            (c, got[c].tolist(), want[c].tolist())
    # the float64 kernel would have collapsed BIG+3 / BIG+5 / BIG+9
    assert got["lo"].iloc[3] == BIG + 3
    assert got["hi"].iloc[3] == BIG + 9


def test_bigint_rolling_minmax_raises(ray_session, bigint_frame):
    import ray.data as rd
    t = rd.from_pandas(bigint_frame).repartition(2)
    q = ("select id, min(v) over (order by id, v "
         "rows between 2 preceding and current row) as m from t")
    with pytest.raises(Exception, match="2\\^53"):
        dataset_to_table(sql(q, {"t": t}))
