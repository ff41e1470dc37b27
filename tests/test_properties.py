"""Property tests (SURVEY §5.5): permutation invariance, idempotent
rebuild, extractor fuzzing."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cryptowalletcommunitydetection_ray.functions.extract import (
    extract_links,
    extract_text,
)


@given(st.binary(max_size=400))
@settings(max_examples=200, deadline=None)
def test_extractor_total_and_deterministic(blob):
    """The pinned extractor never raises and is a pure function of bytes."""
    assert extract_text(blob) == extract_text(blob)
    links = extract_links(blob, "http://base.example/a/b")
    assert links == extract_links(blob, "http://base.example/a/b")
    for u in links:
        assert u.startswith(("http://", "https://"))


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=60
    )
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dedup_first_matches_pandas(ray_session, pairs):
    import pandas as pd
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.stages.dedup import exact_dedup

    df = pd.DataFrame(pairs, columns=["k", "v"])
    df["ord"] = np.arange(len(df))
    got = (
        exact_dedup(rd.from_pandas(df), ["k"], num_partitions=4,
                    keep_order_col="ord")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.sort_values("ord")
        .drop_duplicates("k", keep="first")
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got[["k", "v", "ord"]].equals(want[["k", "v", "ord"]])


def test_pagerank_permutation_invariant(ray_session, tmp_path):
    """Shuffled input pages ⇒ identical artifacts ⇒ identical scores."""
    import ray.data as rd

    from cryptowalletcommunitydetection_ray.pipelines.edges import build_graph
    from cryptowalletcommunitydetection_ray.pipelines.pagerank import pagerank
    from cryptowalletcommunitydetection_ray.sources.pages import synth_pages

    base = synth_pages(150, seed=11)
    # (materialize first: Ray 2.49's random_shuffle trips over lazy
    # ReadRange inputs — "Not a block type: ReadTask")
    shuffled = synth_pages(150, seed=11).materialize().random_shuffle(seed=3)
    g1, g2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    m1 = build_graph(base, g1, 4)
    m2 = build_graph(shuffled, g2, 4)
    assert m1["num_edges"] == m2["num_edges"]
    r1 = pagerank(g1, tol=1e-12)[0].to_pandas().sort_values("vid")
    r2 = pagerank(g2, tol=1e-12)[0].to_pandas().sort_values("vid")
    assert (r1["vid"].to_numpy() == r2["vid"].to_numpy()).all()
    assert np.allclose(
        r1["rank"].to_numpy(), r2["rank"].to_numpy(), atol=1e-12, rtol=0
    )


def test_rebuild_is_idempotent(ray_session, tmp_path):
    """Re-running the build into the same dir reproduces identical artifacts
    (the idempotent-upsert re-run contract, SURVEY §2.10)."""
    from cryptowalletcommunitydetection_ray.pipelines.components import (
        connected_components,
    )
    from cryptowalletcommunitydetection_ray.pipelines.edges import build_graph
    from cryptowalletcommunitydetection_ray.sources.pages import synth_pages

    g = str(tmp_path / "g")
    m1 = build_graph(synth_pages(120, seed=5), g, 4)
    l1 = connected_components(g)[0].to_pandas().sort_values("vid")
    m2 = build_graph(synth_pages(120, seed=5), g, 4)  # rebuild in place
    assert m1 == m2
    l2 = connected_components(g)[0].to_pandas().sort_values("vid")
    assert l1.reset_index(drop=True).equals(l2.reset_index(drop=True))


@given(
    st.lists(st.integers(1, 500), min_size=1, max_size=200),
    st.integers(64, 1024),
)
@settings(max_examples=50, deadline=None)
def test_pack_sequences_kernel_invariants(toks, budget):
    """Pure-python re-statement of the packing rule: sequences never
    exceed the budget (with per-doc capping), ids are contiguous from 0,
    and every doc is assigned exactly once."""
    import numpy as np

    capped = np.minimum(np.array(toks, dtype=np.int64), budget)
    seq = np.empty(len(capped), dtype=np.int64)
    cur, cur_sum = 0, 0
    for i, t in enumerate(capped):
        if cur_sum + t > budget and cur_sum > 0:
            cur += 1
            cur_sum = 0
        seq[i] = cur
        cur_sum += int(t)
    sums = np.bincount(seq, weights=capped)
    assert (sums <= budget).all()
    assert set(seq) == set(range(seq.max() + 1))
    # greedy tightness: a new sequence only opens when the doc would
    # not have fit in the previous one
    for s in range(1, seq.max() + 1):
        first = int(np.argmax(seq == s))
        assert sums[s - 1] + capped[first] > budget


@given(st.lists(st.text(min_size=0, max_size=12), min_size=0, max_size=300))
@settings(max_examples=50, deadline=None)
def test_hll_registers_set_semantics(vals):
    """HLL registers are a pure function of the SET of values: duplicates
    and order never change the sketch, and merge == union."""
    import numpy as np

    from cryptowalletcommunitydetection_ray.stages.sketches import _registers

    a = np.array(vals, dtype=object)
    if len(a) == 0:
        return
    shuffled = a[np.random.default_rng(0).permutation(len(a))]
    doubled = np.concatenate([a, a])
    r = _registers(a, 8)
    assert np.array_equal(r, _registers(shuffled, 8))
    assert np.array_equal(r, _registers(doubled, 8))
    half = len(a) // 2
    if half:
        ra, rb = _registers(a[:half], 8), _registers(a[half:], 8)
        assert np.array_equal(np.maximum(ra, rb), r)


@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=300, unique=True),
    st.floats(0.05, 0.95),
    st.floats(0.05, 0.95),
)
@settings(max_examples=50, deadline=None)
def test_consistent_sample_nesting(ids, r1, r2):
    """Membership at rate min(r1,r2) is always a subset of membership at
    max(r1,r2) — the nested-sample law scaling runs rely on."""
    import numpy as np

    from cryptowalletcommunitydetection_ray.stages.sampling import _keep_mask

    ids = np.array(ids, dtype=np.int64)
    lo, hi = sorted([r1, r2])
    keep_lo = _keep_mask(ids, lo, "s")
    keep_hi = _keep_mask(ids, hi, "s")
    assert not np.any(keep_lo & ~keep_hi)
