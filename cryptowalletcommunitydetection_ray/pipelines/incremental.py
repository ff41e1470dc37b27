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
    ev = rd.read_parquet(events_path)
    stats = ev.map_batches(
        lambda t: pa.table(
            {
                "lo": [pc.min(pc.cast(t["ts"], pa.int64())).as_py()],
                "hi": [pc.max(pc.cast(t["ts"], pa.int64())).as_py()],
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    lo_s = int(stats["lo"].min() // 1_000_000)
    hi_s = int(stats["hi"].max() // 1_000_000) + 1
    end_s = min(end_s, hi_s) if end_s is not None else hi_s

    cursor = read_cursor(state_dir)
    if cursor is None:
        cursor = lo_s // window_s * window_s
        init_cursor(state_dir, cursor)

    done = []
    w = cursor
    while w + window_s <= end_s:
        lo_us = w * 1_000_000
        hi_us = (w + window_s) * 1_000_000
        wds = ev.map_batches(
            lambda t, lo=lo_us, hi=hi_us: t.filter(
                pc.and_(
                    pc.greater_equal(pc.cast(t["ts"], pa.int64()), lo),
                    pc.less(pc.cast(t["ts"], pa.int64()), hi),
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
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
