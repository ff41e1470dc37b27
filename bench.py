"""Benchmark harness: headline link-graph pipeline + operator timings.

Prints ONE JSON line:
    {"metric": ..., "value": <headline seconds>, "unit": "sec",
     "queries": {stage/query: sec, ...}, "sf": ..., "num_cpus": N,
     "pagerank_edges_per_sec": ..., "supersteps": ...}

Headline = the flagship pipeline on a deterministic synthetic pages corpus
(parquet on disk, written untimed): read → pinned extraction → dedup edge
table → partitioned CSR artifacts → PageRank to convergence → connected
components → community collection → triangle counts.

``--scaling``: runs the same benchmark in FRESH taskset-pinned processes
at two CPU levels (default ``GRAFT_SCALING_LEVELS=4,16`` — the sandbox
stand-in for N- vs 4N-node clusters; the 4→16 pairing has the highest
measured pure-CPU ceiling on this host AND leaves 16 idle cores to absorb
external noise) and reports both throughputs plus scaling efficiency
``(t_lo/t_hi)/(hi/lo)``.  Each level is sampled ``GRAFT_SCALING_MINOF``
times (default 2) in ABBA order and the per-level MIN is used — a noise
spike must then hit every sample of the same level to corrupt the ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    import logging

    import ray

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32") or 32)
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # FIXED object store size (GRAFT_OBJ_STORE_GB, default 48 on this
        # 128 GiB box).  Ray's default sizes the store at 30% of the RAM
        # available AT INIT, which varies run to run — at the ≥8 M-page
        # corpus the build shuffle's working set (~30 GB of tagged
        # edge+url rows) then SEMI-RANDOMLY exceeds the store and ~26 GB
        # spills to DISK, corrupting the CPU-scaling ratio in either
        # direction (measured: batch r5k rep 1).  A constant store gives
        # every child identical memory resources so only the pinned CPU
        # count varies between scaling levels; per-child spill bytes are
        # still measured and dirty the sample (see _spilled_mib).
        object_store_memory=int(
            float(os.environ.get("GRAFT_OBJ_STORE_GB", "48") or 48) * 1e9
        ),
    )
    from cryptowalletcommunitydetection_ray.context import quiet_data_context

    quiet_data_context()

    import ray.data as rd

    from cryptowalletcommunitydetection_ray.pipelines.communities import (
        community_sizes,
    )
    from cryptowalletcommunitydetection_ray.pipelines.components import (
        connected_components,
    )
    from cryptowalletcommunitydetection_ray.pipelines.edges import build_graph
    from cryptowalletcommunitydetection_ray.pipelines.pagerank import pagerank
    from cryptowalletcommunitydetection_ray.pipelines.triangles import (
        triangle_counts,
    )
    from cryptowalletcommunitydetection_ray.sources.pages import write_pages

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    n_pages = {"sf0.001": 1000, "sf0.01": 10000, "sf0.1": 100000}.get(sf_tag, 100000)
    n_pages = int(os.environ.get("GRAFT_BENCH_PAGES") or 0) or n_pages
    # Storage subpartitions: fixed at build time, sized for reduce-stage
    # parallelism and per-task memory — NOT for the cluster.  Kernel pools
    # pick their own size (a divisor of SP matched to the cluster).
    P = 128

    # corpus on disk (untimed, cached across runs); also warms the page cache
    corpus = f"/dev/shm/cwcd_bench/pages_{n_pages}"
    if not os.path.exists(f"{corpus}/_DONE"):
        shutil.rmtree(corpus, ignore_errors=True)
        # fixed file count: the corpus is cached in /dev/shm and shared by
        # every child of a --scaling run — its layout must not depend on
        # which CPU level happened to build it first
        write_pages(corpus, n_pages, override_num_blocks=32)
        open(f"{corpus}/_DONE", "w").write("ok")
    rd.read_parquet(corpus).count()  # warm cache, untimed
    calib_pre = _calibrate(ray)  # host-noise probe before the timed work

    graph_dir = f"/dev/shm/cwcd_bench/graph_{n_pages}_{num_cpus}_{os.getpid()}"
    shutil.rmtree(graph_dir, ignore_errors=True)

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    pages = rd.read_parquet(corpus)
    meta = timed("build_graph", lambda: build_graph(pages, graph_dir, P))

    # per-kernel pool sizing.  The HEADLINE config is PINNED at KP=8
    # regardless of num_cpus: at sf0.1's small graph (~800 k edges,
    # single-digit-ms shard compute) a bigger pool only adds KP² message
    # slots of pure superstep latency, which confounded the r2→r3 BENCH
    # comparison (pagerank 1.4 s → 6.1 s with zero engine change).  The
    # --scaling children instead SCALE the pool with the cpu level
    # (GRAFT_SCALE_POOL=1) — exactly what a 4×-bigger real cluster does —
    # clamped to a power-of-two divisor of SP=128 in [4, 16].  Override:
    # GRAFT_KERNEL_POOL.
    if os.environ.get("GRAFT_SCALE_POOL"):
        default_kp = max(4, min(16, 1 << (num_cpus.bit_length() - 1)))
    else:
        default_kp = 8
    KP = int(os.environ.get("GRAFT_KERNEL_POOL") or 0) or default_kp
    pr_result = {}

    def run_pr():
        ranks, m = pagerank(graph_dir, tol=1e-10, pool_size=KP)
        ranks.materialize()
        pr_result.update(m)

    timed("pagerank", run_pr)

    def run_cc():
        labels, _ = connected_components(graph_dir, pool_size=KP)
        labels.materialize()

    timed("connected_components", run_cc)
    timed(
        "communities",
        lambda: community_sizes(graph_dir, pool_size=KP).materialize(),
    )
    timed(
        "triangles",
        lambda: triangle_counts(graph_dir, pool_size=KP)[0].materialize(),
    )

    # operator benchmarks over the sf tables
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    for name in [
        "q1_pricing",
        "hourly_windows",
        "user_event_tags",
        "sessionize_users",
        "minhash_dedup",
        "ann_topk",
        "embed_neardup",
        "doc_quality",
    ]:
        def run_q(name=name):
            res = qs[name](sf_dir)
            if isinstance(res, rd.Dataset):
                res.materialize()

        timed(name, run_q)

    headline = round(
        sum(
            timings[k]
            for k in [
                "build_graph",
                "pagerank",
                "connected_components",
                "communities",
                "triangles",
            ]
        ),
        3,
    )
    supersteps = pr_result.get("supersteps_run", 0)
    # edges/sec over the superstep loop (setup = pool spawn + artifact load
    # is reported separately via the pagerank stage timing)
    loop_sec = pr_result.get("loop_seconds") or timings.get("pagerank") or 1
    pr_edges_per_sec = round(meta["num_edges"] * supersteps / loop_sec, 1)
    # machine-calibration: perfectly parallel pure-CPU fan-out; its speedup
    # between the two levels is the box's real scaling ceiling (all-core
    # frequency / virtualization effects make it < 4 on this host).  TWO
    # probes bracket the timed work — their ratio (calib_drift) detects
    # host-noise shifts DURING the run, so --scaling can flag dirty samples.
    calib_sec = _calibrate(ray)
    calib_drift = round(calib_sec / calib_pre, 3) if calib_pre else 1.0
    spilled_mib = _spilled_mib(ray)

    out = {
        "metric": "flagship link-graph pipeline e2e (pages→edges→PageRank+CC+communities+triangles)",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": sf_tag,
        "num_cpus": num_cpus,
        "n_pages": n_pages,
        "num_edges": meta["num_edges"],
        "num_vertices": meta["num_vertices"],
        "supersteps": supersteps,
        "pagerank_edges_per_sec": pr_edges_per_sec,
        # decomposed pagerank stage: pool spawn + artifact load vs the
        # superstep loop — makes cross-round comparison insensitive to
        # pool-spawn latency swings on the virtualized host
        "pagerank_setup_sec": pr_result.get("setup_seconds"),
        "pagerank_loop_sec": pr_result.get("loop_seconds"),
        "P": P,
        "kernel_pool": KP,
        "calib_sec": calib_sec,
        "calib_pre": calib_pre,
        "calib_drift": calib_drift,
        # objects spilled to DISK by this run (0 = the whole pipeline fit
        # the store).  Any spill makes the sample scaling-dirty: disk
        # bandwidth, not CPU count, then bounds the spilled stages.
        "spilled_mib": spilled_mib,
    }
    shutil.rmtree(graph_dir, ignore_errors=True)
    ray.shutdown()
    return out


def _spilled_mib(ray) -> int:
    """MiB of objects this session spilled to disk, parsed from the
    raylet's own accounting (the last cumulative 'Spilled N MiB' line).
    0 when the store never overflowed; -1 if the log is unreadable."""
    import re as _re

    try:
        session = ray._private.worker._global_node.get_session_dir_path()
        with open(f"{session}/logs/raylet.out", "rb") as f:
            tail = f.read()[-200_000:].decode("utf-8", "replace")
        hits = _re.findall(r"Spilled (\d+) MiB", tail)
        return int(hits[-1]) if hits else 0
    except Exception:
        return -1


def _calibrate(ray) -> float:
    """Speedup ceiling probe: perfectly parallel pure-CPU fan-out; its
    runtime ratio between two pinned-CPU levels is the box's real scaling
    ceiling (virtualization/frequency effects make it < ideal)."""
    import re as _re
    import time as _time

    @ray.remote
    def _calib(seed):
        rx = _re.compile(rb"<a\b[^>]*?href=\"([^\"]*)\"")
        data = (b'<a href="http://h%d.example/p%d">x</a> pad ' % (seed, seed)) * 2000
        n = 0
        for _ in range(120):
            n += len(rx.findall(data))
        return n

    ray.get([_calib.remote(i) for i in range(64)])  # warm worker pool
    t0 = _time.time()
    ray.get([_calib.remote(i) for i in range(512)])
    return round(_time.time() - t0, 3)


def _calibrate_bw(ray) -> float:
    """Memory-BANDWIDTH ceiling probe: perfectly parallel random-gather
    fan-out (the PageRank compute/apply access pattern — 64MB arrays >>
    LLC).  On one box DRAM bandwidth saturates far below the core count,
    so this ratio — not the CPU ceiling — bounds gather-bound kernels;
    on a real N→4N-node cluster each node brings its own memory
    controllers and this ceiling scales with nodes."""
    import time as _time

    import numpy as _np

    @ray.remote
    def _bw(seed):
        rng = _np.random.default_rng(seed)
        a = rng.random(8_000_000)
        idx = rng.integers(0, len(a), len(a))
        s = 0.0
        for _ in range(4):
            s += a[idx].sum()
        return s

    ray.get([_bw.remote(i) for i in range(32)])  # warm
    t0 = _time.time()
    ray.get([_bw.remote(i) for i in range(64)])
    return round(_time.time() - t0, 3)


def _kernel_graph_dir(V: int, E: int, SP: int) -> str:
    return f"/dev/shm/cwcd_bench/kgraph_{V}_{E}_P{SP}"


def _build_kernel_graph(V: int, E: int, SP: int) -> str:
    """Deterministic uniform random graph synthesized directly as an edge
    table (no extraction) — sized so kernel compute dominates superstep
    message latency (the VERDICT's >=50M-edge requirement)."""
    import numpy as np
    import pandas as pd

    import ray.data as rd

    from cryptowalletcommunitydetection_ray.pipelines.edges import (
        build_graph_from_edges,
        edges_from_vid_pairs,
    )

    d = _kernel_graph_dir(V, E, SP)
    if os.path.exists(f"{d}/meta.json"):
        return d

    M1 = np.uint64(0xBF58476D1CE4E5B9)
    M2 = np.uint64(0x94D049BB133111EB)

    def mix(x):
        with np.errstate(over="ignore"):
            x = (x ^ (x >> np.uint64(30))) * M1
            x = (x ^ (x >> np.uint64(27))) * M2
            return x ^ (x >> np.uint64(31))

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        i = df["id"].to_numpy().astype(np.uint64)
        s = mix(i) % np.uint64(V)
        dd = mix(i + np.uint64(0x9E3779B97F4A7C15)) % np.uint64(V - 1)
        dst = (s + np.uint64(1) + dd) % np.uint64(V)  # no self-loops
        return pd.DataFrame({"s": s.astype(np.int64), "d": dst.astype(np.int64)})

    pairs = rd.range(E, override_num_blocks=256).map_batches(
        gen, batch_format="pandas"
    )
    build_graph_from_edges(
        edges_from_vid_pairs(pairs, "s", "d"), d, SP,
        lineage={"source": "uniform synthetic", "V": V, "E": E},
    )
    return d


def run_kernel_bench() -> dict:
    """Child-process body for --kernel-scaling: iterative kernels on a
    pre-built big graph, pool size scaled WITH the cpu level (unlike the
    headline bench, whose small graphs pin a fixed latency-bound pool)."""
    import logging

    import ray

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32") or 32)
    V = int(os.environ.get("GRAFT_KERNEL_VERTICES") or 5_000_000)
    E = int(os.environ.get("GRAFT_KERNEL_EDGES") or 50_000_000)
    SP = 128
    ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from cryptowalletcommunitydetection_ray.context import quiet_data_context
    from cryptowalletcommunitydetection_ray.pipelines.components import (
        connected_components,
    )
    from cryptowalletcommunitydetection_ray.pipelines.pagerank import pagerank

    quiet_data_context()
    graph_dir = _build_kernel_graph(V, E, SP)
    pool = num_cpus  # must divide SP; 8 and 32 both divide 128

    # fixed superstep count (tol=0 never converges) → both cpu levels run
    # IDENTICAL work; loop_seconds is the clean scaling observable
    ranks, mpr = pagerank(graph_dir, tol=0.0, max_iter=12, pool_size=pool)
    ranks.materialize()
    labels, mcc = connected_components(graph_dir, max_iter=8, pool_size=pool)
    labels.materialize()

    out = {
        "num_cpus": num_cpus,
        "V": V,
        "E": E,
        "pool": pool,
        "pagerank_loop_sec": mpr["loop_seconds"],
        "pagerank_supersteps": mpr["supersteps_run"],
        "pagerank_edges_per_sec": round(
            mpr["num_edges"] * mpr["supersteps_run"] / mpr["loop_seconds"], 1
        ),
        "cc_loop_sec": mcc["loop_seconds"],
        "cc_supersteps": mcc["supersteps_run"],
        "calib_sec": _calibrate(ray),
        "bw_calib_sec": _calibrate_bw(ray),
    }
    ray.shutdown()
    return out


def run_kernel_scaling() -> None:
    """Kernel-compute scaling evidence: same big graph, fresh pinned
    processes at 8 and 32 cpus, pool scaled with the level."""
    import ray

    V = int(os.environ.get("GRAFT_KERNEL_VERTICES") or 5_000_000)
    E = int(os.environ.get("GRAFT_KERNEL_EDGES") or 50_000_000)
    # build once, unpinned, before the measured children
    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from cryptowalletcommunitydetection_ray.context import quiet_data_context

    quiet_data_context()
    _build_kernel_graph(V, E, 128)
    ray.shutdown()

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_KERNEL_BENCH="1")
        res = subprocess.run(
            ["taskset", "-c", f"0-{ncpu - 1}", sys.executable,
             os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        )
        return json.loads(res.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    ceiling = r_lo["calib_sec"] / r_hi["calib_sec"]
    bw_ceiling = r_lo["bw_calib_sec"] / r_hi["bw_calib_sec"]
    out = {
        "metric": "kernel scaling (N=8 → 4N=32 pinned CPUs, pool scaled, "
                  f"{r_lo['E']} edges)",
        "V": r_lo["V"],
        "E": r_lo["E"],
        "machine_cpu_ceiling_speedup": round(ceiling, 3),
        "machine_bandwidth_ceiling_speedup": round(bw_ceiling, 3),
    }
    for k in ("pagerank", "cc"):
        sp = r_lo[f"{k}_loop_sec"] / r_hi[f"{k}_loop_sec"]
        out[f"{k}_loop_sec_8"] = r_lo[f"{k}_loop_sec"]
        out[f"{k}_loop_sec_32"] = r_hi[f"{k}_loop_sec"]
        out[f"{k}_speedup"] = round(sp, 3)
        out[f"{k}_efficiency"] = round(sp / (hi / lo), 3)
        out[f"{k}_efficiency_vs_bandwidth_ceiling"] = round(sp / bw_ceiling, 3)
    out["pagerank_edges_per_sec_8"] = r_lo["pagerank_edges_per_sec"]
    out["pagerank_edges_per_sec_32"] = r_hi["pagerank_edges_per_sec"]
    print(json.dumps(out))


def run_scaling() -> None:
    def one(ncpu: int) -> dict:
        # Fresh process at each parallelism level.  ``taskset`` pins the
        # process tree to ncpu PHYSICAL cores — the honest single-box
        # emulation of an N-node vs 4N-node cluster (ray's num_cpus only
        # throttles task scheduling, not actors' actual CPU use).  Bigger
        # corpus so per-stage compute dominates fixed scheduling overhead.
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_PAGES=os.environ.get("GRAFT_SCALING_PAGES", "800000"),
            GRAFT_SCALE_POOL="1",  # pools scale with the level (headline pins KP=8)
        )
        for attempt in (1, 2):
            res = subprocess.run(
                ["taskset", "-c", f"0-{ncpu - 1}", sys.executable,
                 os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
            )
            if res.returncode == 0:
                return json.loads(res.stdout.strip().splitlines()[-1])
            sys.stderr.write(
                f"scaling child (ncpu={ncpu}, attempt {attempt}) failed:\n"
                f"{res.stderr[-2000:]}\n"
            )
        raise RuntimeError(f"scaling child at ncpu={ncpu} failed twice")

    levels = os.environ.get("GRAFT_SCALING_LEVELS", "4,16")
    lo, hi = (int(x) for x in levels.split(","))
    min_of = int(os.environ.get("GRAFT_SCALING_MINOF", "2") or 2)

    def pair() -> dict:
        # ABBA order: lo, hi, [hi, lo, ...] — min per level.  A host-noise
        # spike corrupts the ratio only if it hits EVERY sample of one
        # level; with alternation the spike usually lands on one sample of
        # each, and the mins discard it.
        order = ([lo, hi] + [hi, lo] * min_of)[: 2 * min_of]
        runs: dict[int, list[dict]] = {lo: [], hi: []}
        for n in order:
            runs[n].append(one(n))
        r_lo = min(runs[lo], key=lambda r: r["value"])
        r_hi = min(runs[hi], key=lambda r: r["value"])
        speedup = r_lo["value"] / r_hi["value"]
        eff = speedup / (hi / lo)
        # the measured ceiling: speedup of a PERFECTLY parallel pure-CPU
        # fan-out between the same two pinned-CPU levels on this box —
        # bracketing probes of the chosen (fastest) child at each level
        c_lo = (r_lo["calib_sec"] + r_lo.get("calib_pre", r_lo["calib_sec"])) / 2
        c_hi = (r_hi["calib_sec"] + r_hi.get("calib_pre", r_hi["calib_sec"])) / 2
        ceiling = c_lo / c_hi
        # a sample is CLEAN when the host's throughput (probed by the
        # perfectly-parallel calibration) stayed within 20% across each
        # chosen child's run — host-noise shifts mid-run corrupt the ratio
        drift = max(
            abs(r_lo.get("calib_drift", 1.0) - 1.0),
            abs(r_hi.get("calib_drift", 1.0) - 1.0),
        )
        # disk spill in a chosen child also dirties the sample: the
        # spilled stages were bounded by disk bandwidth, not CPU count
        spilled = max(r_lo.get("spilled_mib") or 0, r_hi.get("spilled_mib") or 0)
        q_lo = {
            k: min(r["queries"][k] for r in runs[lo]) for k in r_lo["queries"]
        }
        q_hi = {
            k: min(r["queries"][k] for r in runs[hi]) for k in r_hi["queries"]
        }
        stage_eff = {
            k: round((q_lo[k] / q_hi[k]) / (hi / lo), 3)
            for k in q_lo
            if q_hi.get(k)
        }
        return {
            "metric": (
                f"scaling efficiency (N={lo} → {hi // lo}N={hi} pinned "
                f"CPUs, same input, min-of-{min_of} ABBA samples/level)"
            ),
            f"sec_{lo}": r_lo["value"],
            f"sec_{hi}": r_hi["value"],
            f"edges_per_sec_{lo}": r_lo["pagerank_edges_per_sec"],
            f"edges_per_sec_{hi}": r_hi["pagerank_edges_per_sec"],
            "speedup": round(speedup, 3),
            "scaling_efficiency": round(eff, 3),
            "machine_ceiling_speedup": round(ceiling, 3),
            "scaling_efficiency_vs_machine_ceiling": round(
                speedup / ceiling, 3
            ),
            "calib_drift_max": round(drift, 3),
            "spilled_mib_max": spilled,
            "sample_clean": drift <= 0.2 and spilled <= 512,
            "stage_efficiency": stage_eff,
            f"queries_{lo}": q_lo,
            f"queries_{hi}": q_hi,
        }

    reps = 1
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    if reps == 1:
        print(json.dumps(pair()))
        return
    # print each rep AS IT COMPLETES — a killed batch keeps its finished
    # reps (reps are ~7 min each; losing N-1 done reps to a kill hurts)
    rows = []
    for _ in range(reps):
        r = pair()
        print(json.dumps(r), flush=True)
        rows.append(r)

    def med_iqr(vals):
        import statistics

        vals = sorted(vals)
        n = len(vals)
        q1 = vals[max(0, (n - 1) // 4)]
        q3 = vals[min(n - 1, (3 * (n - 1) + 3) // 4)]
        return round(statistics.median(vals), 3), round(q3 - q1, 3)

    raw = [r["scaling_efficiency"] for r in rows]
    vsc = [r["scaling_efficiency_vs_machine_ceiling"] for r in rows]
    clean = [r for r in rows if r["sample_clean"]]
    summary = {
        "metric": "scaling efficiency summary over repeated clean-protocol runs",
        "reps": reps,
        "n_clean": len(clean),
        "raw_median": med_iqr(raw)[0],
        "raw_iqr": med_iqr(raw)[1],
        "vs_ceiling_median": med_iqr(vsc)[0],
        "vs_ceiling_iqr": med_iqr(vsc)[1],
        "raw_median_clean": med_iqr(
            [r["scaling_efficiency"] for r in clean]
        )[0]
        if clean
        else None,
        "vs_ceiling_median_clean": med_iqr(
            [r["scaling_efficiency_vs_machine_ceiling"] for r in clean]
        )[0]
        if clean
        else None,
        "raw_all": raw,
        "vs_ceiling_all": vsc,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--kernel-scaling" in sys.argv:
        run_kernel_scaling()
    elif os.environ.get("GRAFT_KERNEL_BENCH"):
        print(json.dumps(run_kernel_bench()))
    else:
        print(json.dumps(run_bench()))
