"""Checkpoint/resume: resumed runs converge to bit-identical vectors."""

import numpy as np
import pytest

from cryptowalletcommunitydetection_ray.pipelines.components import (
    connected_components,
)
from cryptowalletcommunitydetection_ray.pipelines.pagerank import pagerank
from cryptowalletcommunitydetection_ray.state import checkpoint as ck


def test_pagerank_resume_bit_identical(graph300, tmp_path):
    # depth 1: the bit-identity contract is defined for synchronous
    # execution (checkpointed runs force depth 1; the baseline must match)
    full, _ = pagerank(graph300, tol=1e-12, pipeline_depth=1)
    want = full.to_pandas().sort_values("vid").reset_index(drop=True)

    ckpt = str(tmp_path / "ck")
    # phase 1: stop after 3 supersteps (checkpoint every superstep)
    partial, m1 = pagerank(
        graph300, tol=1e-12, max_iter=3, checkpoint_dir=ckpt, checkpoint_every=1
    )
    partial.materialize()
    assert m1["supersteps_run"] == 3
    # phase 2: resume and run to convergence
    resumed, m2 = pagerank(
        graph300,
        tol=1e-12,
        checkpoint_dir=ckpt,
        checkpoint_every=1,
        resume=True,
    )
    got = resumed.to_pandas().sort_values("vid").reset_index(drop=True)
    assert m2["history"][0]["iteration"] == 3  # picked up after the last ckpt
    assert (got["vid"] == want["vid"]).all()
    # bit-identical: fixed-order reduction + exact parquet roundtrip
    assert np.array_equal(
        got["rank"].to_numpy(), want["rank"].to_numpy()
    ), np.abs(got["rank"].to_numpy() - want["rank"].to_numpy()).max()


def test_cc_resume_exact(graph300, tmp_path):
    full, _ = connected_components(graph300)
    want = full.to_pandas().sort_values("vid").reset_index(drop=True)
    ckpt = str(tmp_path / "ck")
    partial, _ = connected_components(
        graph300, max_iter=2, checkpoint_dir=ckpt, checkpoint_every=1
    )
    partial.materialize()
    resumed, _ = connected_components(
        graph300, checkpoint_dir=ckpt, checkpoint_every=1, resume=True
    )
    got = resumed.to_pandas().sort_values("vid").reset_index(drop=True)
    assert got.equals(want)


def test_pagerank_survives_shard_kill(graph300, tmp_path):
    """Kill one KernelShard actor mid-run: Ray restarts it (artifacts
    reload in __init__, kernel state empty), the superstep driver detects
    the dead/imposter state, rewinds every shard to the latest complete
    checkpoint, and still converges to the bit-identical vector."""
    import threading
    import time as _time

    import ray

    from cryptowalletcommunitydetection_ray.state import checkpoint as ck
    from cryptowalletcommunitydetection_ray.state.pool import get_pool

    full, _ = pagerank(graph300, tol=1e-14, pipeline_depth=1)
    want = full.to_pandas().sort_values("vid").reset_index(drop=True)

    ckpt = str(tmp_path / "ck_kill")
    shards, _p = get_pool(graph300)

    def killer():
        # wait until at least 2 complete checkpoints exist, then kill
        for _ in range(500):
            m = ck.read_manifest(ckpt)
            if m and len([i for i in m["iterations"] if i["complete"]]) >= 2:
                ray.kill(shards[1], no_restart=False)
                return
            _time.sleep(0.01)

    t = threading.Thread(target=killer)
    t.start()
    got_ds, metrics = pagerank(
        graph300, tol=1e-14, checkpoint_dir=ckpt, checkpoint_every=1
    )
    t.join()
    got = got_ds.to_pandas().sort_values("vid").reset_index(drop=True)
    assert metrics["restarts"] >= 1, "kill landed after convergence; flaky"
    assert np.array_equal(got["rank"].to_numpy(), want["rank"].to_numpy())


def test_manifest_refuses_other_job(graph300, tmp_path):
    ckpt = str(tmp_path / "ck")
    pagerank(graph300, max_iter=1, checkpoint_dir=ckpt)
    with pytest.raises(ValueError, match="refusing to clobber"):
        connected_components(graph300, max_iter=1, checkpoint_dir=ckpt)


def test_manifest_metrics_and_lineage(graph300, tmp_path):
    ckpt = str(tmp_path / "ck")
    pagerank(graph300, max_iter=2, checkpoint_dir=ckpt, checkpoint_every=1)
    m = ck.read_manifest(ckpt)
    assert m["algorithm"] == "pagerank"
    assert m["lineage"]["num_vertices"] > 0
    its = [it for it in m["iterations"] if it["complete"]]
    assert len(its) == 2
    assert "l1_delta" in its[0]["metrics"]
