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


def test_empty_events_noop(ray_session, tmp_path):
    """Empty input: clean no-op, no crash, cursor untouched (ADVICE fix)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cryptowalletcommunitydetection_ray.pipelines.incremental import (
        run_incremental,
    )

    src = str(tmp_path / "empty.parquet")
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "value": pa.array([], pa.float64()),
            }
        ),
        src,
    )
    m = run_incremental(
        src, str(tmp_path / "out"), str(tmp_path / "state"), window_s=3600
    )
    assert m["windows_processed"] == 0
    assert m["cursor"] is None


def test_catchup_feeds_each_row_exactly_once(ray_session, tmp_path):
    """With the window predicate pushed into the read, a catch-up over W
    windows must deliver every input row to process_window exactly once
    (no duplication, no loss) - the observable contract of row-group
    pruned per-window reads."""
    import numpy as np
    import pandas as pd

    from cryptowalletcommunitydetection_ray.pipelines.incremental import (
        run_incremental,
    )

    n = 5000
    base = 1_700_000_000
    df = pd.DataFrame(
        {
            "user_id": np.arange(n) % 17,
            "ts": pd.to_datetime(
                (base + np.arange(n) * 40) * 1_000_000_000
            ),
            "value": np.ones(n),
        }
    )
    src = str(tmp_path / "ev.parquet")
    df.to_parquet(src, row_group_size=500)

    seen = []

    def counting(window_ds):
        t = window_ds.to_pandas()
        seen.append(len(t))
        import ray.data as rd

        return rd.from_pandas(t[["user_id"]].drop_duplicates())

    m = run_incremental(
        src,
        str(tmp_path / "out"),
        str(tmp_path / "state"),
        window_s=3600,
        process_window=counting,
    )
    assert m["windows_processed"] >= 2
    # complete windows cover [first window start, end_s) - every row in a
    # complete window is delivered exactly once
    s = df["ts"].astype("int64").to_numpy() // 1_000_000_000
    in_complete = s < m["cursor"]
    assert sum(seen) == int(in_complete.sum())


def test_int64_ts_column(ray_session, tmp_path):
    """Regression (round-3 advice): an events file whose ts column is
    int64 epoch-microseconds (not timestamp) must window correctly — the
    pushed-down read filter builds its scalars with the file's real type."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cryptowalletcommunitydetection_ray.pipelines.incremental import (
        run_incremental,
    )

    day = 86400
    rows = pa.table(
        {
            "ts": pa.array(
                [1 * 10**6, (day + 5) * 10**6, (2 * day + 1) * 10**6],
                pa.int64(),
            ),
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    src = tmp_path / "events_int.parquet"
    pq.write_table(rows, str(src))
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    m = run_incremental(str(src), out, state, window_s=day)
    assert m["windows_processed"] == 2  # days 0 and 1 complete
    import ray.data as rd

    got = rd.read_parquet(out).to_pandas()
    assert sorted(got["n_events"].tolist()) == [1, 1]
