"""HyperLogLog approximate distinct: accuracy, determinism, mergeability."""

import numpy as np
import pandas as pd


def test_registers_merge_equals_union():
    from cryptowalletcommunitydetection_ray.stages.sketches import (
        _registers,
        hll_estimate,
    )

    a = np.array([f"x{i}" for i in range(5000)], dtype=object)
    b = np.array([f"x{i}" for i in range(2500, 7500)], dtype=object)
    ra, rb = _registers(a, 12), _registers(b, 12)
    runion = _registers(np.concatenate([a, b]), 12)
    assert np.array_equal(np.maximum(ra, rb), runion)  # mergeable
    est = hll_estimate(runion)
    assert abs(est - 7500) / 7500 < 0.05


def test_approx_distinct_accuracy_and_determinism(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.sketches import (
        approx_distinct,
    )

    rng = np.random.default_rng(1)
    vals = rng.integers(0, 20_000, 100_000)  # ~19.9k distinct
    ds = rd.from_pandas(pd.DataFrame({"v": vals}))
    true = len(np.unique(vals))
    est1 = approx_distinct(ds, "v")
    est2 = approx_distinct(ds.repartition(7), "v")  # partition-invariant
    assert est1 == est2
    assert abs(est1 - true) / true < 0.05


def test_approx_distinct_by_matches_per_group(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.sketches import (
        _registers,
        approx_distinct_by,
        hll_estimate,
    )

    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 30_000),
            "v": rng.integers(0, 3_000, 30_000),
        }
    )
    got = (
        approx_distinct_by(rd.from_pandas(df), "k", "v")
        .to_pandas()
        .set_index("k")["approx_nd"]
    )
    for k, g in df.groupby("k"):
        # half-UP rounding: the repo-wide cross-engine fixed-point rule
        want = int(np.floor(hll_estimate(_registers(g["v"].to_numpy(), 12)) + 0.5))
        assert got[k] == want  # engine == single-pass oracle, exactly
        true = g["v"].nunique()
        assert abs(got[k] - true) / true < 0.06


def test_approx_distinct_registers_export(ray_session, tmp_path):
    """The export_registers path: (a) estimate identical to the direct
    AggregateFn path, (b) the exported register table reproduces the
    estimate when the PINNED estimator is folded over it externally
    (DuckDB — exactly what the driver oracle runs)."""
    import duckdb
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.sketches import (
        approx_distinct_by,
    )

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 20_000),
            "v": rng.integers(0, 2_000, 20_000),
        }
    )
    ds = rd.from_pandas(df)
    direct = (
        approx_distinct_by(ds, "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = str(tmp_path / "regs")
    via_regs = (
        approx_distinct_by(ds, "k", "v", export_registers=exp)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert (direct["approx_nd"] == via_regs["approx_nd"]).all()

    sql = f"""
        WITH reg AS (
            SELECT k, unnest(regs) AS r
            FROM read_parquet('{exp}/*.parquet')
        ), agg AS (
            SELECT k, count(*) AS m,
                   sum(pow(2.0, -CAST(r AS DOUBLE))) AS s,
                   sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS z
            FROM reg GROUP BY k
        ), est AS (
            SELECT k, m, z, (0.7213 / (1 + 1.079 / m)) * m * m / s AS e
            FROM agg
        )
        SELECT k,
               CAST(floor(CASE WHEN e <= 2.5 * m AND z > 0
                               THEN m * ln(m / z) ELSE e END + 0.5)
                    AS BIGINT) AS approx_nd
        FROM est ORDER BY k
    """
    ora = duckdb.sql(sql).df()
    assert (ora["approx_nd"].to_numpy() == direct["approx_nd"].to_numpy()).all()


def test_histogram_quantiles(ray_session):
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.sketches import (
        histogram_quantiles,
    )

    rng = np.random.default_rng(0)
    v = rng.random(100_000) * 50
    ds = rd.from_pandas(pd.DataFrame({"v": v}))
    qs = [0.1, 0.5, 0.9, 0.99]
    got = histogram_quantiles(ds, "v", qs, bins=1024)
    true = np.quantile(v, qs)
    w = (v.max() - v.min()) / 1024
    assert np.all(np.abs(got["est"].to_numpy() - true) <= 2 * w + 1e-9)
    # partition-invariant (deterministic sketch)
    got2 = histogram_quantiles(ds.repartition(9), "v", qs, bins=1024)
    assert got["est"].tolist() == got2["est"].tolist()
    # constant column edge: every quantile is the constant
    const = rd.from_pandas(pd.DataFrame({"v": np.full(100, 7.5)}))
    g = histogram_quantiles(const, "v", [0.5])
    assert g["est"].tolist() == [7.5]
