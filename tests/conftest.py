import logging

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield ray
    ray.shutdown()


def tables_equal(a: pa.Table, b: pa.Table, float_tol: float = 0.0) -> bool:
    """NaN-aware, tolerance-aware table comparison (Arrow equals treats
    NaN != NaN)."""
    if a.schema.names != b.schema.names or a.num_rows != b.num_rows:
        return False
    for name in a.schema.names:
        ca, cb = a[name], b[name]
        if pa.types.is_floating(ca.type):
            x = ca.to_numpy(zero_copy_only=False).astype(float)
            y = cb.to_numpy(zero_copy_only=False).astype(float)
            if not np.allclose(x, y, rtol=float_tol, atol=float_tol, equal_nan=True):
                return False
        else:
            if not ca.equals(cb) and ca.cast(cb.type) != cb:
                if not ca.cast(cb.type).equals(cb):
                    return False
    return True
