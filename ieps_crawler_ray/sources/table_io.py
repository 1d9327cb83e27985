"""Columnar-table IO with a gated Lance backend (BASELINE.json
input_hint: the production input is a Lance table of image+caption
pairs).

No ``lance`` wheel exists in this container, so Parquet is the stand-in
everywhere — but the integration point is REAL code, not a comment:
``read_table`` / ``write_table`` dispatch on the PATH SUFFIX (a
``.lance`` path uses the Lance backend and raises NotImplementedError
when the wheel is absent; anything else is parquet), so a corpus laid
out as ``.lance`` on a Lance host flows through the same call sites
(``sources/corpus.write_corpus`` / ``load_corpus``) unchanged.
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


def write_table(tbl: pa.Table, path: str, row_group_size: int = 1024):
    """Write a ``.lance`` dataset or a parquet file (same schema).
    Both branches OVERWRITE an existing table at ``path`` (parquet
    rewrites the file; Lance uses mode="overwrite"). ``row_group_size``
    applies to parquet only — Lance manages its own fragment layout."""
    if path.endswith(".lance"):
        if lance is None:
            raise NotImplementedError(
                "no `lance` wheel in this environment — use parquet")
        lance.write_dataset(tbl, path, mode="overwrite")
        return path
    pq.write_table(tbl, path, row_group_size=row_group_size)
    return path
