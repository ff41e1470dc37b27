"""Relational stages vs pandas-computed expectations (sf0.001 tables)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/events.parquet"), pd.read_parquet(
        f"{SF}/events.parquet"
    )


def test_semi_and_anti_join(events):
    from cryptowalletcommunitydetection_ray.stages.relational import semi_join

    ds, df = events
    got = semi_join(ds, "user_id", [1, 2, 3]).to_pandas()
    want = df[df["user_id"].isin([1, 2, 3])]
    assert len(got) == len(want)
    got_n = semi_join(ds, "user_id", [1, 2, 3], negate=True).to_pandas()
    assert len(got_n) == len(df) - len(want)


def test_set_union_groupby_idempotent(events):
    from cryptowalletcommunitydetection_ray.stages.relational import (
        set_union_groupby,
    )

    ds, df = events
    got = (
        set_union_groupby(ds, "user_id", "event_type")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("user_id")["event_type"]
        .agg(lambda s: ",".join(sorted(set(s))))
        .reset_index()
    )
    assert (got["tags"].to_numpy() == want["event_type"].to_numpy()).all()
    # idempotent under re-run over doubled input (the K1 merge contract)
    doubled = ds.union(ds)
    got2 = (
        set_union_groupby(doubled, "user_id", "event_type")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got2["tags"].tolist() == got["tags"].tolist()


def test_window_bucket(events):
    from cryptowalletcommunitydetection_ray.stages.relational import window_bucket

    ds, df = events
    got = window_bucket(ds, "ts", 3600, value_col="value").to_pandas()
    sec = df["ts"].astype("int64") // 1_000_000
    want = (
        pd.DataFrame({"w": (sec // 3600) * 3600, "v": df["value"]})
        .groupby("w")
        .agg(n=("v", "size"), s=("v", "sum"))
        .reset_index()
    )
    got = got.sort_values("window_start_s").reset_index(drop=True)
    want = want.sort_values("w").reset_index(drop=True)
    assert got["window_start_s"].tolist() == want["w"].tolist()
    assert got["n_events"].tolist() == want["n"].tolist()
    assert np.allclose(got["sum_value"], want["s"].round(6), atol=1e-9)


def test_sessionize(events):
    from cryptowalletcommunitydetection_ray.stages.relational import sessionize

    ds, df = events
    got = sessionize(ds, gap_s=1800).to_pandas()
    u = df[df["user_id"] == df["user_id"].iloc[0]].sort_values("ts")
    sec = (u["ts"].astype("int64") // 1_000_000).to_numpy()
    n_sessions = 1 + int((np.diff(sec) > 1800).sum())
    assert (
        len(got[got["user_id"] == df["user_id"].iloc[0]]) == n_sessions
    )
    assert (got["start_s"] <= got["end_s"]).all()


def test_last_per_key(events):
    from cryptowalletcommunitydetection_ray.stages.relational import last_per_key

    ds, df = events
    got = (
        last_per_key(ds, "user_id", ["ts", "event_id"], ["value"])
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["ts", "event_id"])
        .drop_duplicates("user_id", keep="last")
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert np.allclose(got["value"], want["value"])


def test_grouped_distinct(events):
    from cryptowalletcommunitydetection_ray.stages.relational import (
        grouped_distinct,
    )

    ds, df = events
    got = sorted(grouped_distinct(ds, "user_id").to_pandas()["user_id"])
    assert got == sorted(df["user_id"].unique())


def test_broadcast_dim_join(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.relational import (
        broadcast_dim_join,
    )

    li = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_partkey", "l_quantity"])
    part = pd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey", "p_brand"])
    dim = part.rename(columns={"p_partkey": "l_partkey"})
    got = broadcast_dim_join(li, dim, "l_partkey", ["p_brand"]).to_pandas()
    ldf = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_partkey"])
    want = ldf.merge(dim, on="l_partkey")
    assert len(got) == len(want)
    assert set(got.columns) == {"l_partkey", "l_quantity", "p_brand"}


def test_set_union_groupby_list_and_map_union(ray_session):
    """Nested-type K1: tags as a real Arrow list<string>, protocols as a
    real map<string,int64> - exact values pinned."""
    import pyarrow as pa
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.relational import (
        explode_list,
        map_union_groupby,
        set_union_groupby_list,
    )

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "event_type": ["b", "a", "b", "c", "c"],
            "value": [10, 5, 1, 2, 3],
        }
    )
    ds = rd.from_pandas(df)

    tags = set_union_groupby_list(ds, "user_id", "event_type")
    assert tags.schema().base_schema.field("tags").type == pa.list_(pa.string())
    tdf = tags.to_pandas().set_index("user_id").sort_index()
    assert list(tdf.loc[1, "tags"]) == ["a", "b"]
    assert list(tdf.loc[2, "tags"]) == ["c"]
    assert tdf["n_distinct"].tolist() == [2, 1]

    flat = explode_list(tags, "tags", out_col="tag").to_pandas()
    got = sorted(map(tuple, flat[["user_id", "tag"]].to_numpy()))
    assert got == [(1, "a"), (1, "b"), (2, "c")]

    pm = map_union_groupby(ds, "user_id", "event_type", "value")
    assert pa.types.is_map(pm.schema().base_schema.field("protocols").type)
    pdf = pm.to_pandas().set_index("user_id").sort_index()
    assert [tuple(kv) for kv in pdf.loc[1, "protocols"]] == [
        ("a", 5),
        ("b", 11),
    ]
    assert [tuple(kv) for kv in pdf.loc[2, "protocols"]] == [("c", 5)]


def test_asof_join_two_tables(ray_session):
    """Generic two-Dataset as-of join vs pandas merge_asof (backward,
    inclusive), plus pinned tie and no-match semantics."""
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.relational import asof_join

    left = pd.DataFrame(
        {
            "oid": [1, 2, 3, 4, 5],
            "k": [1, 1, 1, 2, 2],
            "ts": [10, 20, 5, 7, 7],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 2],
            "ts": [10, 10, 15, 7, 3, 9],
            "val": [100, 101, 102, 200, 201, 202],
        }
    )
    out = (
        asof_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            by="k",
            ts_col="ts",
            value_cols=["val"],
        )
        .to_pandas()
        .sort_values("oid")
        .reset_index(drop=True)
    )
    # oid=1: ties at ts=10 -> max val 101; oid=2: last <=20 is ts15 (102);
    # oid=3: no right <=5 -> -1; oid=4/5: ts<=7 -> val 200
    assert out["asof_val"].tolist() == [101, 102, -1, 200, 200]

    strict = (
        asof_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            by="k",
            ts_col="ts",
            value_cols=["val"],
            strict=True,
        )
        .to_pandas()
        .sort_values("oid")
        .reset_index(drop=True)
    )
    # strict: oid=1 excludes ts=10 ties -> no earlier row -> -1;
    # oid=2 (ts=20): greatest ts<20 is 15 -> 102
    assert strict["asof_val"].tolist() == [-1, 102, -1, 201, 201]

    # larger cross-check vs pandas merge_asof on events-shaped data
    rng = np.random.default_rng(5)
    n = 2000
    lf = pd.DataFrame(
        {
            "oid": np.arange(n),
            "k": rng.integers(0, 20, n),
            "ts": rng.integers(0, 10_000, n),
        }
    )
    rt = pd.DataFrame(
        {
            "k": rng.integers(0, 20, 3000),
            "ts": rng.integers(0, 10_000, 3000),
            "val": np.arange(3000),
        }
    ).sort_values(["ts", "val"], kind="stable")
    got = (
        asof_join(
            rd.from_pandas(lf),
            rd.from_pandas(rt),
            by="k",
            ts_col="ts",
            value_cols=["val"],
        )
        .to_pandas()
        .sort_values("oid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        lf.sort_values("ts", kind="stable"),
        rt,
        on="ts",
        by="k",
        direction="backward",
    ).sort_values("oid").reset_index(drop=True)
    want_vals = want["val"].fillna(-1).astype(np.int64)
    assert got["asof_val"].astype(np.int64).tolist() == want_vals.tolist()


def test_range_join_count_overlapping(ray_session):
    """Overlapping intervals: each point counts toward every covering
    interval (two searchsorted passes, no per-point scan)."""
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.relational import (
        range_join_count,
    )

    iv = pd.DataFrame(
        {
            "k": [1, 1, 1, 2],
            "iid": [0, 1, 2, 3],
            "lo": [0, 5, 20, 0],
            "hi": [10, 15, 30, 100],
        }
    )
    pts = pd.DataFrame(
        {"k": [1, 1, 1, 1, 2, 3], "sec": [5, 10, 12, 25, 50, 1]}
    )
    out = (
        range_join_count(
            rd.from_pandas(iv), rd.from_pandas(pts),
            by="k", lo_col="lo", hi_col="hi", ts_col="sec",
        )
        .to_pandas()
        .sort_values("iid")
        .reset_index(drop=True)
    )
    # iid0 [0,10]: pts 5,10 -> 2; iid1 [5,15]: 5,10,12 -> 3 (overlap!);
    # iid2 [20,30]: 25 -> 1; iid3 k=2: 50 -> 1
    assert out["n_points"].tolist() == [2, 3, 1, 1]


def test_asof_join_empty_right_key_and_float_value(ray_session):
    """Regression (round-3 advice): (a) a by-key with left rows but ZERO
    right rows must emit defaults, not IndexError into an empty array;
    (b) a float64 right value column must keep float64 through the tagged
    union (dtype-matched fills, not int64)."""
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.relational import asof_join

    left = pd.DataFrame(
        {"oid": [1, 2, 3], "k": [1, 1, 9], "ts": [10, 20, 10]}
    )
    # key 9 has left rows but no right rows at all
    right = pd.DataFrame(
        {"k": [1, 1], "ts": [5, 15], "val": [1.5, 2.5]}
    )
    out = (
        asof_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            by="k",
            ts_col="ts",
            value_cols=["val"],
        )
        .to_pandas()
        .sort_values("oid")
        .reset_index(drop=True)
    )
    assert out["asof_val"].tolist() == [1.5, 2.5, -1.0]
    assert out["asof_val"].dtype == np.float64

    # string left extra column survives the union fills too
    left2 = left.assign(tag=["a", "b", "c"])
    out2 = (
        asof_join(
            rd.from_pandas(left2),
            rd.from_pandas(right),
            by="k",
            ts_col="ts",
            value_cols=["val"],
        )
        .to_pandas()
        .sort_values("oid")
        .reset_index(drop=True)
    )
    assert out2["tag"].tolist() == ["a", "b", "c"]


def test_range_join_count_float_interval_cols(ray_session):
    """Regression (round-3 advice): float / string interval columns must
    survive the tagged union (dtype-matched pads, not int64 zeros)."""
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.relational import (
        range_join_count,
    )

    iv = pd.DataFrame(
        {
            "k": [1, 2],
            "iid": [0, 1],
            "w": [0.25, 0.75],
            "name": ["x", "y"],
            "lo": [0, 0],
            "hi": [10, 10],
        }
    )
    pts = pd.DataFrame({"k": [1, 1, 2], "sec": [5, 11, 3]})
    out = (
        range_join_count(
            rd.from_pandas(iv), rd.from_pandas(pts),
            by="k", lo_col="lo", hi_col="hi", ts_col="sec",
        )
        .to_pandas()
        .sort_values("iid")
        .reset_index(drop=True)
    )
    assert out["n_points"].tolist() == [1, 1]
    assert out["w"].tolist() == [0.25, 0.75]
    assert out["name"].tolist() == ["x", "y"]
