"""CLI smoke test: the spark-submit surface (python -m bliss_rs_spark) runs
the full lifecycle — synth -> build -> stats -> query -> serve -> migrate —
in a fresh subprocess (its own SparkSession; main() stops it, so it must not
run in-process against the shared test session)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args, stdin_text=None):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "bliss_rs_spark", *args],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env,
        input=stdin_text,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    return [json.loads(l) for l in lines]


def test_cli_lifecycle(tmp_path):
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "idx")

    (synth,) = _run("synth", "--n", "200", "--dest", corpus)
    assert synth["written"] == 200

    (built,) = _run("build", "--source", corpus, "--index", index)
    assert built["snapshot"] == "v00001" and built["n_docs"] == 200

    (stats,) = _run("stats", "--index", index)
    assert stats["current"] == "v00001"
    assert stats["meta"]["segments"] == ["seg_000001"]

    (q,) = _run("query", "--index", index, "--text", "varbyte merge return", "--k", "5")
    assert len(q["results"]) == 5
    assert q["results"][0]["rank"] == 1

    qfile = tmp_path / "queries.txt"
    qfile.write_text(
        "varbyte merge return\n"
        "blockMaxScore\n"
        ":filter rustonly lang=rust\n"
        ":in rustonly varbyte merge return\n"
        ":suggest varbite\n"
    )
    ready, r1, r2, flt, rf, sg = _run("serve", "--index", index, "--k", "5",
                                      "--queries", str(qfile))
    assert ready["ready"] and ready["units"] == 1
    assert [x["doc_id"] for x in r1["results"]] == [x["doc_id"] for x in q["results"]]
    assert r1["ms"] > 0 and len(r2["results"]) >= 1
    # filtered serving: registration ack (1/5 of 200 docs are rust), then a
    # constrained result set that actually differs from the unfiltered run
    assert flt["filter"] == "rustonly" and flt["n_docs"] == 40
    assert rf["filter"] == "rustonly" and rf["results"]
    assert {x["doc_id"] for x in rf["results"]} != {
        x["doc_id"] for x in r1["results"]
    }
    # did-you-mean over the live vocab
    assert sg["suggest"] == "varbite"
    assert any(t["term"] == "varbyte" for t in sg["terms"])

    (srch,) = _run("search", "--index", index,
                   "--query", "+varbyte merg* -zzznope", "--k", "5")
    assert srch["results"] and srch["results"][0]["rank"] == 1

    (upd,) = _run("update", "--source", corpus, "--index", index,
                  "--repack", "segment")
    assert upd["docs_processed"] == 0 and upd["repack_mode"] == "segment"

    (mig,) = _run("migrate", "--index", index, "--analyzer-version", "2")
    assert mig["analyzer_version"] == 2
    (stats2,) = _run("stats", "--index", index)
    assert stats2["meta"]["analyzer_version"] == 2


def test_cli_phrase_serve(tmp_path):
    """serve --phrase: the PhraseServer loop answers exact-phrase queries
    identical to the one-shot query --phrase path."""
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "idx")
    _run("synth", "--n", "150", "--dest", corpus)
    _run("build", "--source", corpus, "--index", index, "--positions")

    (q,) = _run("query", "--index", index, "--text", "posting block codec",
                "--k", "5", "--phrase")
    assert q["results"]  # non-vacuous: the phrase occurs in the synth corpus
    qfile = tmp_path / "queries.txt"
    qfile.write_text(
        "posting block codec\n:window codec posting\n:refresh\n"
        "posting block codec\n"
        ":filter rustonly lang=rust\n:in rustonly posting block codec\n"
    )
    ready, r1, rw, rr, r2, flt, rf = _run("serve", "--index", index, "--k", "5",
                                          "--phrase", "--queries", str(qfile))
    assert ready["ready"] and ready["mode"] == "phrase"
    assert [(x["doc_id"], x["score"]) for x in r1["results"]] == \
        [(x["doc_id"], x["phrase_tf"]) for x in q["results"]]
    # :window -> order-free proximity; the exact-phrase docs have windows
    assert rw["mode"] == "window" and rw["results"]
    assert all(x["min_window"] >= 2 for x in rw["results"])
    # :refresh on an unchanged store is a no-op reuse; answers unchanged
    assert rr["refreshed"] and not rr["rebuilt_units"]
    assert r2["results"] == r1["results"]
    # metadata filters work in phrase mode too (150 docs, 1/5 rust)
    assert flt["filter"] == "rustonly" and flt["n_docs"] == 30
    assert rf["filter"] == "rustonly"


def test_cli_grep_serve(tmp_path):
    """serve --grep: warm TrigramServer loop answers substring queries,
    incl. -i over the store's folded layout."""
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "idx")
    _run("synth", "--n", "120", "--dest", corpus)
    _run("build", "--source", corpus, "--index", index, "--trigrams",
         "--no-checkpoint")

    (one,) = _run("grep", "--index", index, "--source", corpus,
                  "--needle", "posting_block_codec")
    qfile = tmp_path / "g.txt"
    qfile.write_text(
        "posting_block_codec\n-i BLOCKMAXSCORE\nzzz never\n:refresh\n"
        "posting_block_codec\n-n posting_block_codec\n"
        ":regex posting_\\w+_codec\n"
    )
    ready, r1, r2, r3, rr, r4, rn, rx = _run(
        "serve", "--index", index, "--grep",
        "--source", corpus, "--k", "1000",
        "--queries", str(qfile))
    assert ready["mode"] == "grep"
    assert r1["doc_ids"] == one["doc_ids"]  # warm == one-shot batch
    assert r2["ignore_case"] and r2["doc_ids"], "-i must hit camelCase docs"
    assert r3["doc_ids"] == []
    # :refresh on an unchanged store reuses every unit; answers unchanged
    assert rr["refreshed"] and not rr["rebuilt_units"]
    assert r4["doc_ids"] == r1["doc_ids"]
    # -n: line-granularity hits cover the same docs
    assert sorted({d for d, _, _ in rn["lines"]}) == r1["doc_ids"]
    assert all(ln >= 1 and col >= 1 for _, ln, col in rn["lines"])
    # :regex through the warm server (required literal "posting_" prunes;
    # superset of the exact-needle hits, non-vacuous)
    assert rx["regex"] == "posting_\\w+_codec"
    assert set(rx["doc_ids"]) >= set(r1["doc_ids"]) and rx["doc_ids"]

    # batch grep --lines: grep -n text output (path:line:col:line)
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "bliss_rs_spark", "grep", "--index", index,
         "--source", corpus, "--needle", "posting_block_codec", "--lines",
         "--limit", "50"],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    hits = [l for l in out.stdout.splitlines() if ":" in l and not l.startswith("{")]
    assert hits and all("posting_block_codec" in l for l in hits)
    # path:line_no:col prefix parses
    for l in hits:
        _path, line_no, col = l.split(":")[0], l.split(":")[1], l.split(":")[2]
        assert int(line_no) >= 1 and int(col) >= 1
