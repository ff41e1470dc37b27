"""Incremental window runner: cursor resume, catch-up, idempotent re-runs."""

import os

import pandas as pd
import pyarrow.dataset as pads
import pytest

from cryptowalletcommunitydetection_ray.pipelines.incremental import (
    init_cursor,
    read_cursor,
    run_incremental,
)

SF = "/root/testdata/sf0.001"
DAY = 86400


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def test_catch_up_then_resume(ray_session, tmp_path):
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    df = _events()
    lo = int(df["ts"].astype("int64").min() // 1_000_000) // DAY * DAY

    # phase 1: stop after 3 days
    m1 = run_incremental(
        f"{SF}/events.parquet", out, state, window_s=DAY, end_s=lo + 3 * DAY
    )
    assert m1["windows_processed"] == 3
    assert read_cursor(state) == lo + 3 * DAY

    # phase 2: catch up the rest; already-done windows are NOT reprocessed
    m2 = run_incremental(f"{SF}/events.parquet", out, state, window_s=DAY)
    assert m2["window_starts"][0] == lo + 3 * DAY
    total = m1["windows_processed"] + m2["windows_processed"]

    # every complete day window materialized exactly once
    windows = sorted(
        int(d.split("=")[1]) for d in os.listdir(out) if d.startswith("window=")
    )
    assert len(windows) == total
    assert windows[0] == lo

    # per-window contents match a pandas recomputation
    sec = df["ts"].astype("int64") // 1_000_000
    w0 = df[(sec >= lo) & (sec < lo + DAY)]
    got = (
        pads.dataset(f"{out}/window={lo}").to_table().to_pandas().sort_values(
            "user_id"
        )
    )
    want = (
        w0.groupby("user_id")
        .agg(n_events=("event_id", "size"), s=("value", "sum"))
        .reset_index()
        .sort_values("user_id")
    )
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert got["sum_value_e2"].tolist() == [
        round(v * 100) for v in want["s"]
    ]


def test_rerun_window_idempotent(ray_session, tmp_path):
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    df = _events()
    lo = int(df["ts"].astype("int64").min() // 1_000_000) // DAY * DAY
    run_incremental(
        f"{SF}/events.parquet", out, state, window_s=DAY, end_s=lo + DAY
    )
    first = pads.dataset(f"{out}/window={lo}").to_table().to_pandas()
    # simulate a crash AFTER the write but BEFORE the cursor advanced:
    # rewind the cursor and re-run — output must be identical
    os.remove(os.path.join(state, "last_synced.json"))
    init_cursor(state, lo)
    run_incremental(
        f"{SF}/events.parquet", out, state, window_s=DAY, end_s=lo + DAY
    )
    again = pads.dataset(f"{out}/window={lo}").to_table().to_pandas()
    key = ["user_id"]
    assert first.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True)
    )


def test_cursor_refuses_clobber(tmp_path):
    state = str(tmp_path / "state")
    init_cursor(state, 100)
    with pytest.raises(FileExistsError):
        init_cursor(state, 200)
