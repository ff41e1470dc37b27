"""Incremental window runner — the reference's scheduler/cursor contract.

Re-expresses SURVEY §2.10: the interval loop with catch-up
(``jobs/cli_job.py:24-94``), the last-synced resume cursor advanced only
after a window completes (``utils/file_utils.py:51-65``,
``cli/exchange_deposit_wallets.py:121-123``), and idempotent re-runs
(keyed-merge writes, K1): each tumbling window of the event stream is
processed into its own atomically-written partition directory
(``out_dir/window=<start>/``), and the cursor file advances only after the
write landed — so a killed run resumes at the first unfinished window and
re-running a finished window rewrites byte-identical output.

``process_window`` is the user hook (§2.11): Dataset-in → Dataset-out for
one window's rows.  Default: per-user count + value-sum aggregation (the
deposit-wallet accumulate analog).
"""

from __future__ import annotations

import json
import os
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def read_cursor(state_dir: str) -> int | None:
    p = os.path.join(state_dir, "last_synced.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["last_synced_window_start_s"]


def init_cursor(state_dir: str, value: int) -> None:
    """Create the cursor; REFUSES to clobber an existing one (the
    reference's init guard, ``utils/file_utils.py:51-56``)."""
    os.makedirs(state_dir, exist_ok=True)
    p = os.path.join(state_dir, "last_synced.json")
    if os.path.exists(p):
        raise FileExistsError(f"cursor already exists: {p}")
    _write_cursor(state_dir, value)


def _write_cursor(state_dir: str, value: int) -> None:
    p = os.path.join(state_dir, "last_synced.json")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"last_synced_window_start_s": value}, f)
    os.replace(tmp, p)


def _parquet_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return [path]


def _ts_us(v) -> int:
    """Row-group stat → epoch microseconds (pyarrow yields datetime)."""
    import datetime

    if isinstance(v, datetime.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    return int(v)


def _default_process(window_ds: rd.Dataset) -> rd.Dataset:
    from ray.data.aggregate import Count, Sum

    def scale(t: pa.Table) -> pa.Table:
        idx = t.schema.get_field_index("sum_value")
        return t.set_column(
            idx,
            "sum_value_e2",
            pc.cast(pc.round(pc.multiply(t["sum_value"], 100.0)), pa.int64()),
        )

    return (
        window_ds.groupby("user_id")
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .map_batches(scale, batch_format="pyarrow")
    )


def run_incremental(
    events_path: str,
    out_dir: str,
    state_dir: str,
    *,
    window_s: int = 86400,
    end_s: int | None = None,
    process_window: Callable[[rd.Dataset], rd.Dataset] | None = None,
) -> dict:
    """Process all complete windows after the cursor; returns run metrics.

    Windows are [w, w+window_s) in epoch seconds; only windows whose END is
    ≤ ``end_s`` (default: max event time + 1) are processed — the
    round-to-interval rule of ``_get_next_synced_timestamp``
    (``jobs/cli_job.py:56-58``).
    """
    process_window = process_window or _default_process
    # window bounds from parquet row-group statistics only — no data scan
    # (the reference reads its cursor + collection max timestamp, not the
    # stream; ``jobs/cli_job.py:56-58``)
    import pyarrow.parquet as pq

    lo_us = hi_us = None
    ts_type = None  # the ts field's REAL arrow type (timestamp or int64)
    for path in _parquet_files(events_path):
        md = pq.ParquetFile(path).metadata
        arrow_schema = md.schema.to_arrow_schema()
        ts_idx = arrow_schema.get_field_index("ts")
        ts_type = arrow_schema.field(ts_idx).type
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(ts_idx)
            st = col.statistics
            if st is None or not st.has_min_max or col.num_values == 0:
                continue
            mn, mx = _ts_us(st.min), _ts_us(st.max)
            lo_us = mn if lo_us is None else min(lo_us, mn)
            hi_us = mx if hi_us is None else max(hi_us, mx)
    if lo_us is None:
        # empty input (or all-null ts): clean no-op, cursor untouched
        return {
            "windows_processed": 0,
            "window_starts": [],
            "cursor": read_cursor(state_dir),
            "window_s": window_s,
        }
    lo_s = lo_us // 1_000_000
    hi_s = hi_us // 1_000_000 + 1
    end_s = min(end_s, hi_s) if end_s is not None else hi_s

    cursor = read_cursor(state_dir)
    if cursor is None:
        cursor = lo_s // window_s * window_s
        init_cursor(state_dir, cursor)

    done = []
    w = cursor
    while w + window_s <= end_s:
        lo_w = w * 1_000_000
        hi_w = (w + window_s) * 1_000_000
        # the window predicate is pushed into the READ: parquet row-group
        # stats on ts prune non-overlapping groups, so a catch-up over W
        # windows reads each row group O(1) times (plus stats, not W).
        # The comparison scalars are built with the file's REAL ts type
        # (timestamp('us') or int64 microseconds — the stats pass supports
        # both) so an int64-ts stream doesn't fail with an Arrow type error
        if pa.types.is_timestamp(ts_type):
            # pure-integer unit conversion: a float multiplier (lo_w * 1e3)
            # exceeds float64's 2^53 exact-integer range for ns-unit
            # columns, drifting the pushed-down boundary by up to ~256 ns
            # and misclassifying events at exact window edges
            conv = {
                "s": lambda v: v // 1_000_000,
                "ms": lambda v: v // 1_000,
                "us": lambda v: v,
                "ns": lambda v: v * 1_000,
            }[ts_type.unit]
            lo_v = pa.scalar(conv(lo_w), pa.timestamp(ts_type.unit))
            hi_v = pa.scalar(conv(hi_w), pa.timestamp(ts_type.unit))
        else:
            lo_v = pa.scalar(lo_w, pa.int64())
            hi_v = pa.scalar(hi_w, pa.int64())
        wds = rd.read_parquet(
            events_path,
            filter=((pc.field("ts") >= lo_v) & (pc.field("ts") < hi_v)),
        )
        result = process_window(wds)
        part_dir = os.path.join(out_dir, f"window={w}")
        tmp_dir = part_dir + ".tmp"
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
        result.write_parquet(tmp_dir)
        shutil.rmtree(part_dir, ignore_errors=True)
        os.replace(tmp_dir, part_dir)
        w += window_s
        _write_cursor(state_dir, w)  # advance ONLY after the window landed
        done.append(w - window_s)

    return {
        "windows_processed": len(done),
        "window_starts": done,
        "cursor": read_cursor(state_dir),
        "window_s": window_s,
    }
