"""Per-superstep, per-partition checkpointing with lineage + metrics.

Re-expresses the reference's resume-cursor contract
(``utils/file_utils.py:51-65``: last-synced scalar advanced after each
completed window; init refuses to clobber) for iterative graph kernels:

    ckpt_dir/
      manifest.json                  # atomic (tmp + rename)
      iter_00007/part=3.parquet      # one rank/label slice per partition

``manifest.json``::

    {"algorithm": ..., "graph_dir": ..., "P": ...,
     "lineage": {...},              # graph meta at job start
     "iterations": [{"iteration": k, "dir": ..., "metrics": {...},
                     "complete": true}, ...]}

An iteration is only marked ``complete`` after every slice write returned,
so a crashed run resumes from the last *complete* superstep — the same
"advance the cursor only after the window finished" rule as the reference
(``cli/exchange_deposit_wallets.py:121-123``).
"""

from __future__ import annotations

import json
import os


def slice_path(ckpt_dir: str, iteration: int, part: int) -> str:
    return os.path.join(ckpt_dir, f"iter_{iteration:05d}", f"part={part}.parquet")


def manifest_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "manifest.json")


def read_manifest(ckpt_dir: str) -> dict | None:
    p = manifest_path(ckpt_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def write_manifest(ckpt_dir: str, manifest: dict) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    tmp = manifest_path(ckpt_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, manifest_path(ckpt_dir))


def init_manifest(
    ckpt_dir: str, algorithm: str, graph_dir: str, P: int, lineage: dict
) -> dict:
    m = read_manifest(ckpt_dir)
    if m is not None:
        if (
            m["algorithm"] != algorithm
            or m["P"] != P
            or m.get("graph_dir") != graph_dir
        ):
            raise ValueError(
                f"checkpoint dir {ckpt_dir} holds a different job "
                f"({m['algorithm']}, P={m['P']}, "
                f"graph={m.get('graph_dir')}); refusing to clobber"
            )
        return m
    m = {
        "algorithm": algorithm,
        "graph_dir": graph_dir,
        "P": P,
        "lineage": lineage,
        "iterations": [],
    }
    write_manifest(ckpt_dir, m)
    return m


def latest_complete(manifest: dict | None) -> dict | None:
    if not manifest:
        return None
    done = [it for it in manifest["iterations"] if it.get("complete")]
    return done[-1] if done else None


def record_iteration(
    ckpt_dir: str, manifest: dict, iteration: int, metrics: dict
) -> None:
    manifest["iterations"].append(
        {
            "iteration": iteration,
            "dir": os.path.join(ckpt_dir, f"iter_{iteration:05d}"),
            "metrics": metrics,
            "complete": True,
        }
    )
    write_manifest(ckpt_dir, manifest)
