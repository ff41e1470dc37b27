"""Pin the driver's pages-corpus DuckDB oracle GENERATORS against the
engine on the 300-page fixture.

The correctness gate runs these SQL strings at sf0.01 (3 000 pages); this
test runs the same generators (``__ray_entry__._pages_*_sql``) pointed at
the tiny test graph and asserts the engine kernels reproduce them exactly,
so a generator regression is caught by pytest before the driver sees it.
"""

import duckdb
import numpy as np
import pandas as pd


def _sql(q: str) -> pd.DataFrame:
    return duckdb.sql(q).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_equal(eng: pd.DataFrame, ora: pd.DataFrame):
    eng, ora = _canon(eng), _canon(ora)
    assert len(eng) == len(ora)
    for c in eng.columns:
        assert (
            eng[c].to_numpy().astype(np.int64)
            == ora[c].to_numpy().astype(np.int64)
        ).all(), c


def test_cc_sql_matches_engine(graph300):
    import __ray_entry__ as em

    from cryptowalletcommunitydetection_ray.pipelines.components import (
        connected_components,
    )

    labels, _ = connected_components(graph300)
    # 2·log2(300) ≈ 17 — 20 hop+shortcut rounds is past the fixpoint
    _assert_equal(labels.to_pandas(), _sql(em._pages_cc_sql(graph300, 20)))


def test_communities_sql_matches_engine(graph300):
    import __ray_entry__ as em

    from cryptowalletcommunitydetection_ray.pipelines.communities import (
        detect_communities,
    )

    comms, _ = detect_communities(graph300, chain="web")
    eng = comms.to_pandas()[["_id", "num_user", "num_depo"]]
    _assert_equal(eng, _sql(em._pages_comm_sql(graph300, 20)))


def test_lpa_sql_matches_engine(graph300):
    import __ray_entry__ as em

    from cryptowalletcommunitydetection_ray.pipelines.labelprop import (
        label_propagation,
    )

    labels, _ = label_propagation(graph300, max_iter=10)
    _assert_equal(
        labels.to_pandas(), _sql(em._pages_lpa_sql(graph300, iters=10))
    )


def test_pagerank_sql_matches_engine(graph300):
    import __ray_entry__ as em

    from cryptowalletcommunitydetection_ray.pipelines.edges import read_meta
    from cryptowalletcommunitydetection_ray.pipelines.pagerank import pagerank

    n = read_meta(graph300)["num_vertices"]
    ranks, _ = pagerank(graph300, tol=1e-15, max_iter=400)
    eng = ranks.to_pandas()
    eng = pd.DataFrame(
        {
            "vid": eng["vid"].to_numpy(),
            "rank_n_e4": np.floor(
                eng["rank"].to_numpy() * float(n) * 1e4 + 0.5
            ).astype(np.int64),
        }
    )
    _assert_equal(eng, _sql(em._pages_pagerank_sql(graph300, iters=160)))


def test_triangles_sql_matches_engine(graph300):
    import __ray_entry__ as em

    from cryptowalletcommunitydetection_ray.pipelines.triangles import (
        triangle_counts,
    )

    tri, _ = triangle_counts(graph300)
    _assert_equal(tri.to_pandas(), _sql(em._pages_tri_sql(graph300)))
