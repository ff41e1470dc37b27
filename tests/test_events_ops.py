"""Event-stream operators: carry-forward merge, as-of lookup, compaction,
type profile — vs pandas-computed expectations (sf0.001 events)."""

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


def test_carry_forward_merge(events):
    from cryptowalletcommunitydetection_ray.stages.relational import (
        carry_forward_merge,
    )

    ds, df = events
    got = carry_forward_merge(ds).to_pandas()
    sub = df[df["event_type"].isin(["click", "view"])].sort_values(
        ["ts", "event_id"]
    )
    one = sub[sub["user_id"] == sub["user_id"].iloc[0]]
    a = one["value"].where(one["event_type"] == "click").ffill().fillna(0)
    b = one["value"].where(one["event_type"] == "view").ffill().fillna(0)
    want = np.round((a + b).to_numpy() * 100).astype(np.int64)
    g = got[got["user_id"] == sub["user_id"].iloc[0]].sort_values("sec")
    assert sorted(g["merged_e2"].tolist()) == sorted(want.tolist())
    assert len(got) == len(sub)


def test_carry_forward_merge_nary_handler(events):
    """3 series + a pluggable reducer (the reference's variadic
    combined_logs(*logs, handler_func) shape)."""
    from cryptowalletcommunitydetection_ray.stages.relational import (
        carry_forward_merge,
    )

    ds, df = events
    types = ("click", "view", "purchase")
    got = carry_forward_merge(
        ds, types=types, handler_func=lambda m: m.max(axis=0)
    ).to_pandas()
    sub = df[df["event_type"].isin(types)].sort_values(["ts", "event_id"])
    assert len(got) == len(sub)
    uid = sub["user_id"].iloc[0]
    one = sub[sub["user_id"] == uid]
    filled = np.stack(
        [
            one["value"].where(one["event_type"] == t).ffill().fillna(0).to_numpy()
            for t in types
        ]
    )
    want = np.round(filled.max(axis=0) * 100).astype(np.int64)
    g = got[got["user_id"] == uid].sort_values("sec")
    assert sorted(g["merged_e2"].tolist()) == sorted(want.tolist())


def test_asof_last_click(events):
    from cryptowalletcommunitydetection_ray.stages.relational import (
        asof_last_before,
    )

    ds, df = events
    got = (
        asof_last_before(ds)
        .to_pandas()
        .set_index("event_id")["asof_event_id"]
    )
    sub = df.sort_values(["ts", "event_id"])
    for uid, g in sub.groupby("user_id"):
        last_click = None
        for _, row in g.iterrows():
            if row["event_type"] == "purchase":
                want = last_click
                have = got.get(row["event_id"], None)
                if want is None:
                    # "no prior click" is the -1 sentinel (plain int64,
                    # never NULL — see asof_last_before docstring)
                    assert have == -1
                else:
                    assert have == want
            if row["event_type"] == "click":
                last_click = row["event_id"]
        break  # one user is enough for the exhaustive walk


def test_keep_first_per_bucket(events):
    from cryptowalletcommunitydetection_ray.stages.relational import (
        keep_first_per_bucket,
    )

    ds, df = events
    got = keep_first_per_bucket(ds).to_pandas()
    sec = df["ts"].astype("int64") // 1_000_000
    df2 = df.assign(bucket=(sec // 86400 * 86400))
    want = (
        df2.sort_values(["ts", "event_id"])
        .drop_duplicates(subset=["user_id", "bucket"])
    )
    assert len(got) == len(want)
    m = got.merge(
        want[["user_id", "bucket", "event_id"]],
        left_on=["user_id", "bucket_start_s"],
        right_on=["user_id", "bucket"],
    )
    assert (m["first_event_id"] == m["event_id"]).all()


def test_type_profile(events):
    from cryptowalletcommunitydetection_ray.stages.relational import type_profile

    ds, df = events
    got = type_profile(ds).to_pandas().set_index("event_type")
    want = df.groupby("event_type").agg(
        n_events=("event_id", "size"), n_users=("user_id", "nunique")
    )
    for t, row in want.iterrows():
        assert got.loc[t, "n_events"] == row["n_events"]
        assert got.loc[t, "n_users"] == row["n_users"]


def test_community_sizes_matches_members(pairs_graph):
    from cryptowalletcommunitydetection_ray.pipelines.communities import (
        community_sizes,
        detect_communities,
    )

    d, _ = pairs_graph
    members, _ = detect_communities(d)
    mdf = members.to_pandas().set_index("_id")
    sizes = community_sizes(d).to_pandas().set_index("_id")
    assert sorted(sizes.index) == sorted(mdf.index)
    for cid in mdf.index:
        assert sizes.loc[cid, "num_user"] == mdf.loc[cid, "num_user"]
        assert sizes.loc[cid, "num_depo"] == mdf.loc[cid, "num_depo"]
