"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa


def dataset_to_table(ds) -> pa.Table:
    """Materialize a (small) ray.data.Dataset to one pyarrow Table.

    Driver-side materialization — only for small results (aggregates,
    dimension tables, test outputs), never the main input.
    """
    import pandas as pd
    import ray
    try:
        # one execution, zero-copy: Dataset.to_arrow_refs() would call
        # schema(fetch_if_missing=True) AFTER executing, which re-runs
        # the ENTIRE plan through a limit(1) whenever Ray lost schema
        # tracking (mixed pandas/arrow stages) — consume the ref
        # bundles directly and convert blocks ourselves instead
        refs = [r for bundle in ds.iter_internal_ref_bundles()
                for r in bundle.block_refs]
    except AttributeError:                      # Ray internals moved
        refs = ds.to_arrow_refs()
    blocks = [pa.Table.from_pandas(b, preserve_index=False)
              if isinstance(b, pd.DataFrame) else b
              for b in ray.get(list(refs))]
    tables = [t for t in blocks if t.num_rows > 0]
    if not tables:
        # an all-empty result may mix TYPED 0-row blocks (e.g. a
        # sentinel-resolved aggregate) with schema-less ones (an empty
        # groupby emits a 0-column block, and Ray skips map UDFs on
        # 0-row blocks so they pass through untyped) — prefer a block
        # that still knows its columns
        return next((b for b in blocks if b.num_columns),
                    blocks[0] if blocks else pa.table({}))
    return pa.concat_tables(tables, promote_options="permissive")


def table_from_result(obj) -> pa.Table:
    """Normalize Dataset / pandas / pyarrow to a pyarrow Table."""
    import pandas as pd
    if isinstance(obj, pa.Table):
        return obj
    if isinstance(obj, pd.DataFrame):
        return pa.Table.from_pandas(obj, preserve_index=False)
    return dataset_to_table(obj)


def round_half_away(x, digits: int = 6):
    """Round HALF AWAY FROM ZERO — SQL semantics (DuckDB round(), which
    gives 2.5→3, 3.5→4), vs numpy/pyarrow's banker's rounding (2.5→2).
    Needed whenever a rounded float column must hash-match a SQL
    oracle: tie cases (exact binary halves, e.g. k/256 fractions) flip
    the last digit between the two conventions.

    Exact-tie detection on the scaled value; non-ties take the nearest
    double either way, so only representable .5 ties are adjusted."""
    import numpy as np
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** digits
    y = x * scale
    f = np.floor(y)
    tie = (y - f) == 0.5
    r = np.where(tie, np.where(y > 0, f + 1.0, f), np.rint(y))
    return r / scale
