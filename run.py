"""CLI for the link-graph engine (the reference's ``run.py`` analog,
``ray job submit``-able).

    python run.py synth      --out /tmp/pages --pages 10000
    python run.py build      --pages-dir /tmp/pages --graph /tmp/g --partitions 8
    python run.py pagerank   --graph /tmp/g [--checkpoint /tmp/ck --resume] [--out DIR]
    python run.py cc         --graph /tmp/g [--checkpoint /tmp/ck --resume] [--out DIR]
    python run.py lpa        --graph /tmp/g [--out DIR]
    python run.py communities --graph /tmp/g [--min-user N --top K] [--out DIR]
    python run.py triangles  --graph /tmp/g [--out DIR]
    python run.py dedup      --docs DOCS.parquet [--threshold T] [--out DIR]
                             [--groups-graph /tmp/dupg]
    python run.py screen     --docs DOCS.parquet [--cap-per-domain K]
                             [--seen SEEN.parquet [--seen-key COL]] [--out DIR]
    python run.py tokens     --docs DOCS.parquet [--topk K] [--out DIR]
    python run.py contamination --docs DOCS.parquet --bench BENCH.parquet
                             [--ngram N] [--out DIR]

Owns its Ray session (scripts and CLIs only — library code never calls
``ray.init``).
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser(prog="run.py")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("synth")
    p.add_argument("--out", required=True)
    p.add_argument("--pages", type=int, default=10000)
    p.add_argument("--seed", type=int, default=42)

    p = sub.add_parser("build")
    p.add_argument("--pages-dir", required=True)
    p.add_argument("--graph", required=True)
    p.add_argument("--partitions", type=int, default=0)

    for name in ("pagerank", "cc", "lpa", "communities", "triangles"):
        p = sub.add_parser(name)
        p.add_argument("--graph", required=True)
        p.add_argument("--out", default=None, help="write result parquet here")
        if name in ("pagerank", "cc"):
            p.add_argument("--checkpoint", default=None)
            p.add_argument("--resume", action="store_true")
            p.add_argument("--max-supersteps", type=int, default=200,
                           help="cap the superstep loop (with --checkpoint "
                                "+ --resume, a capped run continues at "
                                "iteration k+1)")
        if name == "pagerank":
            p.add_argument("--alpha", type=float, default=0.85)
            p.add_argument("--tol", type=float, default=1e-10)
        if name == "communities":
            p.add_argument("--min-user", type=int, default=0)
            p.add_argument("--top", type=int, default=0)

    p = sub.add_parser("dedup", help="near-dup pairs + groups over a docs parquet")
    p.add_argument("--docs", required=True, help="parquet with doc_id, text")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--out", default=None, help="write pairs parquet here")
    p.add_argument("--groups-graph", default=None,
                   help="scratch dir: also compute dup groups via the CC kernel")

    p = sub.add_parser(
        "screen",
        help="corpus curation screen: per-domain cap + Bloom drop-vs-seen",
    )
    p.add_argument("--docs", required=True, help="parquet with doc_id, source, text")
    p.add_argument("--key-col", default="doc_id")
    p.add_argument("--domain-col", default="source")
    p.add_argument("--cap-per-domain", type=int, default=0,
                   help="keep at most K docs per domain (salted-hash order)")
    p.add_argument("--seen", default=None,
                   help="parquet of already-seen keys: drop matching docs "
                        "(Bloom broadcast — no false negatives)")
    p.add_argument("--seen-key", default=None,
                   help="key column in --seen (default: --key-col)")
    p.add_argument("--out", default=None, help="write survivors parquet here")

    p = sub.add_parser("tokens", help="exact corpus-wide top-k tokens")
    p.add_argument("--docs", required=True, help="parquet with a text column")
    p.add_argument("--text-col", default="text")
    p.add_argument("--topk", type=int, default=20)
    p.add_argument("--out", default=None, help="write (token, n) parquet here")

    p = sub.add_parser(
        "contamination",
        help="benchmark-contamination screen: distinct shared n-grams per doc",
    )
    p.add_argument("--docs", required=True, help="parquet with doc_id, text")
    p.add_argument("--bench", required=True,
                   help="small benchmark parquet with a text column")
    p.add_argument("--ngram", type=int, default=8)
    p.add_argument(
        "--hashed",
        action="store_true",
        help="int64-hashed gram membership (8 B/gram broadcast, "
        "searchsorted probe) instead of string is_in",
    )
    p.add_argument("--out", default=None, help="write (doc_id, n_hits) here")

    args = ap.parse_args(argv)

    import logging

    import ray

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS") or 0) or os.cpu_count(),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from cryptowalletcommunitydetection_ray.context import (
        default_num_partitions,
        quiet_data_context,
    )

    quiet_data_context()

    result_ds, metrics = None, {}
    if args.cmd == "synth":
        from cryptowalletcommunitydetection_ray.sources.pages import write_pages

        write_pages(args.out, args.pages, seed=args.seed)
        metrics = {"written": args.out, "pages": args.pages}
    elif args.cmd == "build":
        import ray.data as rd

        from cryptowalletcommunitydetection_ray.pipelines.edges import build_graph

        P = args.partitions or default_num_partitions()
        metrics = build_graph(
            rd.read_parquet(args.pages_dir),
            args.graph,
            P,
            lineage={"pages_dir": args.pages_dir},
        )
    elif args.cmd == "pagerank":
        from cryptowalletcommunitydetection_ray.pipelines.pagerank import pagerank

        result_ds, metrics = pagerank(
            args.graph,
            alpha=args.alpha,
            tol=args.tol,
            max_iter=args.max_supersteps,
            checkpoint_dir=args.checkpoint,
            resume=args.resume,
        )
    elif args.cmd == "cc":
        from cryptowalletcommunitydetection_ray.pipelines.components import (
            connected_components,
        )

        result_ds, metrics = connected_components(
            args.graph,
            max_iter=args.max_supersteps,
            checkpoint_dir=args.checkpoint,
            resume=args.resume,
        )
    elif args.cmd == "lpa":
        from cryptowalletcommunitydetection_ray.pipelines.labelprop import (
            label_propagation,
        )

        result_ds, metrics = label_propagation(args.graph)
    elif args.cmd == "communities":
        from cryptowalletcommunitydetection_ray.pipelines.communities import (
            detect_communities,
            top_communities,
        )

        result_ds, metrics = detect_communities(args.graph)
        if args.min_user or args.top:
            result_ds = top_communities(
                result_ds, min_user=args.min_user, k=args.top or None
            )
    elif args.cmd == "triangles":
        from cryptowalletcommunitydetection_ray.pipelines.triangles import (
            triangle_counts,
        )

        result_ds, metrics = triangle_counts(args.graph)
    elif args.cmd == "dedup":
        import ray.data as rd

        from cryptowalletcommunitydetection_ray.stages.dedup import (
            dup_groups_distributed,
            minhash_dedup_pairs,
        )

        docs = rd.read_parquet(args.docs, columns=["doc_id", "text"])
        result_ds = minhash_dedup_pairs(docs, threshold=args.threshold)
        metrics = {"algorithm": "minhash_dedup", "threshold": args.threshold}
        if args.groups_graph:
            pairs = result_ds.materialize()
            groups = dup_groups_distributed(pairs, args.groups_graph)
            metrics["num_grouped_docs"] = groups.count()
            result_ds = pairs

    elif args.cmd == "screen":
        import ray.data as rd

        from cryptowalletcommunitydetection_ray.stages.bloom import (
            bloom_screen,
            build_bloom_distributed,
        )
        from cryptowalletcommunitydetection_ray.stages.sampling import (
            cap_per_key,
        )

        docs = rd.read_parquet(args.docs)
        # row count from parquet metadata — an eager docs.count() would
        # execute a full extra read of the input before the pipeline runs
        import pyarrow.dataset as pads

        n_in = pads.dataset(args.docs).count_rows()
        metrics = {"algorithm": "screen", "rows_in": n_in}
        if args.seen:
            seen_key = args.seen_key or args.key_col
            bloom = build_bloom_distributed(
                rd.read_parquet(args.seen, columns=[seen_key]), seen_key
            )
            # the filter hashes VALUES (salted), so --seen-key may name a
            # differently-named column holding the same key domain
            docs = bloom_screen(docs, bloom, args.key_col, drop_seen=True)
            metrics["seen_screen"] = args.seen
        if args.cap_per_domain:
            docs = cap_per_key(
                docs, args.domain_col, args.cap_per_domain,
                [args.key_col], salt="screen",
            )
            metrics["cap_per_domain"] = args.cap_per_domain
        result_ds = docs

    elif args.cmd == "tokens":
        import ray.data as rd

        from cryptowalletcommunitydetection_ray.stages.text import token_topk

        docs = rd.read_parquet(args.docs, columns=[args.text_col])
        result_ds = token_topk(docs, k=args.topk, text_col=args.text_col)
        metrics = {"algorithm": "token_topk", "k": args.topk}

    elif args.cmd == "contamination":
        import ray.data as rd

        from cryptowalletcommunitydetection_ray.stages.text import (
            contamination_screen,
        )

        docs = rd.read_parquet(args.docs, columns=["doc_id", "text"])
        bench = rd.read_parquet(args.bench, columns=["text"])
        result_ds = contamination_screen(
            docs, bench, n=args.ngram, hashed=args.hashed
        )
        metrics = {
            "algorithm": "contamination_screen",
            "ngram": args.ngram,
            "hashed": bool(args.hashed),
        }

    if result_ds is not None and getattr(args, "out", None):
        # snapshot pre-existing files so rows_out counts ONLY this run's
        # output — write_parquet appends to a non-empty directory, and
        # counting the whole directory silently inflates rows_out with
        # stale files from a previous run (ADVICE r4)
        # pyarrow.fs handles local paths AND remote URIs (s3://, hdfs://)
        # the same way write_parquet does — os.listdir would crash on any
        # non-local --out after the output was already written
        from pyarrow import fs as pafs

        out_fs, out_root = pafs.FileSystem.from_uri(
            args.out if "://" in args.out else os.path.abspath(args.out)
        )

        def _list_out() -> set:
            try:
                infos = out_fs.get_file_info(
                    pafs.FileSelector(out_root, recursive=True)
                )
            except FileNotFoundError:
                return set()
            return {
                i.path for i in infos if i.type == pafs.FileType.File
            }

        pre = _list_out()
        result_ds.write_parquet(args.out)
        metrics["out"] = args.out
        if args.cmd == "screen":
            # rows_out for screen comparison, from the freshly written
            # files' parquet metadata (no re-read)
            import pyarrow.dataset as pads

            new_files = sorted(_list_out() - pre)
            metrics["rows_out"] = (
                pads.dataset(new_files, filesystem=out_fs).count_rows()
                if new_files
                else 0
            )
            if pre:
                metrics["stale_files_ignored"] = len(pre)
    elif result_ds is not None:
        metrics["rows"] = result_ds.count()
        if args.cmd == "screen":
            metrics["rows_out"] = metrics["rows"]

    metrics.pop("history", None)
    print(json.dumps(metrics, default=str))
    ray.shutdown()


if __name__ == "__main__":
    main()
