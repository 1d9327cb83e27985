"""Driver-contract check: run queries()[name](sf_dir) vs oracle_sql()[name]
via DuckDB, compare rows + sorted-column values (hash proxy)."""
import hashlib
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
ONLY = sys.argv[1:] or None

ray.init(address="local", num_cpus=int(os.environ.get("CHECK_CPUS", "8")), include_dashboard=False)
import __ray_entry__ as e  # noqa: E402

qs = e.queries()
sql = e.oracle_sql()

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(SF, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def frame_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), ignore_index=True)
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            h.update(pd.util.hash_pandas_object(col.astype(str),
                                                index=False).values.tobytes())
        else:
            h.update(pd.util.hash_pandas_object(col, index=False)
                     .values.tobytes())
    return h.hexdigest()[:16]


out = {}
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    row = {}
    try:
        sp = to_pandas(fn(SF))
        row["spark_rows"] = len(sp)
        if name in sql:
            od = con.execute(sql[name]).df()
            row["oracle_rows"] = len(od)
            row["rows_match"] = len(sp) == len(od)
            row["schema_match"] = sorted(sp.columns) == sorted(od.columns)
            row["hash_match"] = (row["rows_match"] and row["schema_match"]
                                 and frame_hash(sp) == frame_hash(od))
            if not row["hash_match"] and row["rows_match"] \
                    and row["schema_match"]:
                # diagnose: dtype or value?
                a = sp.reindex(sorted(sp.columns), axis=1) \
                    .sort_values(sorted(sp.columns), ignore_index=True)
                b = od.reindex(sorted(od.columns), axis=1) \
                    .sort_values(sorted(od.columns), ignore_index=True)
                row["dtypes"] = {c: [str(a[c].dtype), str(b[c].dtype)]
                                 for c in a.columns
                                 if str(a[c].dtype) != str(b[c].dtype)}
                try:
                    neq = int((~np.isclose(
                        a.select_dtypes("number").to_numpy(dtype=float),
                        b.select_dtypes("number").to_numpy(dtype=float),
                        equal_nan=True)).sum())
                    row["num_mismatch_cells"] = neq
                except Exception:
                    pass
        else:
            row["err"] = "no_oracle"
    except Exception as ex:
        row["err"] = f"{type(ex).__name__}: {ex}"[:300]
    out[name] = row
    print(name, json.dumps(row), flush=True)

bad = [n for n, r in out.items()
       if r.get("err") not in (None, "no_oracle") or
       (r.get("hash_match") is False)]
print("BAD:", bad)
ray.shutdown()
