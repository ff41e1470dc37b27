"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf and compare row-count + schema + sorted values against
oracle_sql() via DuckDB.  Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]

NOTE: the pages-kernel and exported-intermediate oracles (pagerank/cc/
labelprop/triangles/communities/host_communities _pages, simhash_pairs,
lsh_neardup_cosine, doc_fingerprints, approx_distinct_users) read fixed
sf0.01 artifact/export paths — the scale the driver's gate runs at.  At
any other sf those rows fail by construction; run this script at
/root/testdata/sf0.01 for the full-green result.
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res):
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if sorted(a.columns) != sorted(b.columns):
        return f"schema: {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return f"rowcount: {len(a)} vs {len(b)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(
            np.asarray(bv).dtype, np.floating
        ):
            if not np.allclose(
                av.astype(float), bv.astype(float), rtol=0, atol=1e-12, equal_nan=True
            ):
                bad = np.flatnonzero(
                    ~np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-12)
                )[:3]
                return f"values[{c}] differ at rows {bad}: {av[bad]} vs {bv[bad]}"
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                bad = np.flatnonzero(av.astype(str) != bv.astype(str))[:3]
                return f"values[{c}] differ at rows {bad}: {av[bad]} vs {bv[bad]}"
    return None


def main():
    import logging

    import ray

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_bad = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(got)} rows ({dt:.1f}s)")
            n_rows_only += 1
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised: {e}")
            n_bad += 1
            continue
        err = compare(got, want)
        if err:
            print(f"FAIL {name}: {err} ({dt:.1f}s)")
            n_bad += 1
        else:
            print(f"ok   {name}: {len(got)} rows ({dt:.1f}s)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed, {n_rows_only} rows-only")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
