"""Smoke the ``run.py`` CLI surface (the reference's job-entry analog).

One subprocess chains every subcommand against a tiny synthesized corpus
— each ``main()`` call owns its own Ray session (init + shutdown), which
is exactly the CLI's contract, so this must NOT run in the test
session's shared Ray (a ``ray.shutdown()`` would kill the fixture).
"""

from __future__ import annotations

import json
import subprocess
import sys

SCRIPT = r"""
import json
import run

def cap(argv):
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run.main(argv)
    return json.loads(buf.getvalue().strip().splitlines()[-1])

base = "/tmp/cli_test"
import shutil; shutil.rmtree(base, ignore_errors=True)
import pandas as pd
out = {}
out["synth"] = cap(["synth", "--out", f"{base}/pages", "--pages", "400"])
out["build"] = cap(["build", "--pages-dir", f"{base}/pages",
                    "--graph", f"{base}/g", "--partitions", "2"])
out["pagerank"] = cap(["pagerank", "--graph", f"{base}/g"])
out["cc"] = cap(["cc", "--graph", f"{base}/g"])
# capped run then --resume: continues from the checkpoint instead of
# starting over (the north-rule mid-convergence resume, CLI-drivable)
out["cc_capped"] = cap(["cc", "--graph", f"{base}/g",
                        "--checkpoint", f"{base}/ck",
                        "--max-supersteps", "2"])
out["cc_resumed"] = cap(["cc", "--graph", f"{base}/g",
                         "--checkpoint", f"{base}/ck", "--resume"])
out["communities"] = cap(["communities", "--graph", f"{base}/g",
                          "--min-user", "1", "--top", "3"])
out["triangles"] = cap(["triangles", "--graph", f"{base}/g"])
docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
docs.to_parquet(f"{base}/docs.parquet")
docs.head(10)[["doc_id"]].to_parquet(f"{base}/seen.parquet")
out["dedup"] = cap(["dedup", "--docs", f"{base}/docs.parquet",
                    "--threshold", "0.5"])
out["screen"] = cap(["screen", "--docs", f"{base}/docs.parquet",
                     "--cap-per-domain", "3", "--domain-col", "lang",
                     "--seen", f"{base}/seen.parquet",
                     "--out", f"{base}/survivors"])
surv = pd.read_parquet(f"{base}/survivors")
out["_survivor_check"] = {
    "rows": int(len(surv)),
    "seen_leaked": int(surv["doc_id"].isin(docs.head(10)["doc_id"]).sum()),
    "max_per_lang": int(surv.groupby("lang").size().max()),
}
out["tokens"] = cap(["tokens", "--docs", f"{base}/docs.parquet",
                     "--topk", "5", "--out", f"{base}/toks"])
toks = pd.read_parquet(f"{base}/toks")
want = (
    docs["text"].str.split().explode().value_counts()
    .rename_axis("token").reset_index(name="n")
    .sort_values(["n", "token"], ascending=[False, True]).head(5)
)
out["_tokens_check"] = {
    "rows": int(len(toks)),
    "match": bool(
        (toks.sort_values(["n", "token"], ascending=[False, True])
             .reset_index(drop=True)[["token", "n"]]
         == want.reset_index(drop=True)[["token", "n"]]).all().all()
    ),
}
docs.head(5)[["text"]].to_parquet(f"{base}/bench.parquet")
out["contamination"] = cap(["contamination", "--docs", f"{base}/docs.parquet",
                            "--bench", f"{base}/bench.parquet",
                            "--ngram", "8", "--out", f"{base}/contam"])
con = pd.read_parquet(f"{base}/contam").set_index("doc_id")
out["_contam_check"] = {
    "rows": int(len(con)),
    # the bench docs themselves must self-hit (every 8-gram is shared)
    "bench_self_hits_positive": bool(
        (con.loc[docs.head(5)["doc_id"], "n_hits"] > 0).all()
    ),
}
print("CLI_RESULT " + json.dumps(out))
"""


def test_cli_end_to_end():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=540,
        cwd="/root/repo",
        env={"RAY_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin",
             "HOME": "/root", "RAY_ADDRESS": "local",
             "PYTHONPATH": "/root/repo"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("CLI_RESULT ")]
    assert line, proc.stdout[-3000:]
    out = json.loads(line[-1][len("CLI_RESULT "):])

    assert out["build"]["num_vertices"] == 400
    assert out["build"]["num_edges"] > 0
    assert out["pagerank"]["rows"] == 400
    assert out["pagerank"]["supersteps_run"] > 1
    assert out["cc"]["rows"] == 400
    # capped at 2 supersteps, then --resume finishes the remainder from
    # the checkpoint: same final iteration as the uncapped run, fewer
    # supersteps run in the resumed process than from scratch
    assert out["cc_capped"]["supersteps_run"] == 2
    assert (
        out["cc_resumed"]["last_iteration"] == out["cc"]["last_iteration"]
    )
    assert (
        out["cc_resumed"]["supersteps_run"] < out["cc"]["supersteps_run"]
    )
    assert out["communities"]["rows"] <= 3
    assert out["triangles"]["rows"] == 400
    assert out["dedup"]["algorithm"] == "minhash_dedup"

    chk = out["_survivor_check"]
    # Bloom drop-vs-seen guarantees NO false negatives: zero seen docs leak.
    assert chk["seen_leaked"] == 0
    assert chk["max_per_lang"] <= 3
    assert 0 < chk["rows"] < 500

    assert out["_tokens_check"] == {"rows": 5, "match": True}
    assert out["_contam_check"]["rows"] == 500
    assert out["_contam_check"]["bench_self_hits_positive"]
