"""CLI surface tests that don't need a Ray session: index-setup artifact
contents (the reference's ensure_index / conf.data_index contract analog)
and clean."""

import json
import os

from engine.cli import main


def test_index_setup_artifact(tmp_path):
    out = tmp_path / "scaffold"
    rc = main(["index-setup", str(out)])
    assert rc == 0
    art = json.load(open(out / "_schema.json"))

    # table schemas present with the key columns typed
    assert art["meta"]["uuid"] == "string"
    assert art["data"]["meta_keywords"] == "list<item: string>"
    assert art["frontier"]["priority"] == "double"

    # index contract: analyzer language set (conf/data_index.py:68-377),
    # engine-supported set, and the _source-exclusion analog (:2-9)
    ic = art["index_contract"]
    assert "en" in ic["reference_analyzer_langs"]
    assert "unknown" in ic["reference_analyzer_langs"]
    assert len(ic["reference_analyzer_langs"]) == 28
    assert set(ic["supported_langs"]) <= set(ic["reference_analyzer_langs"])
    assert ic["source_excluded_columns"] == [
        "warc_target_query_string", "full_body", "headings",
    ]
    # default read set excludes exactly the excluded columns
    assert set(ic["data_default_read_columns"]).isdisjoint(
        ic["source_excluded_columns"]
    )
    assert "body" in ic["data_default_read_columns"]


def test_clean(tmp_path):
    d = tmp_path / "junk"
    d.mkdir()
    (d / "x").write_text("y")
    assert main(["clean", str(d)]) == 0
    assert not os.path.exists(d)
    # idempotent on a missing path
    assert main(["clean", str(d)]) == 0


def test_filter_and_export_cli(ray_session, tmp_path, capsys):
    """The filter/export subcommands run end-to-end over a small documents
    parquet and never shut down a Ray session they didn't start."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    docs = tmp_path / "docs.parquet"
    n = 60
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(
                    [
                        "the quick brown fox jumps over the lazy dog and "
                        f"then walks away slowly number {i} " * 3
                        for i in range(n)
                    ],
                    pa.string(),
                ),
            }
        ),
        docs,
    )
    out_f = tmp_path / "verdicts"
    assert main(["filter", str(docs), str(out_f)]) == 0
    assert ray.is_initialized()  # fixture session survived
    got = capsys.readouterr().out
    assert "Time taken" in got
    verd = pq.read_table(str(out_f)).to_pandas()
    assert len(verd) == n and set(verd.columns) == {
        "doc_id", "n_chars", "n_words", "status",
    }

    out_e = tmp_path / "shards"
    assert main(["export", str(docs), str(out_e), "--n-shards", "4"]) == 0
    assert ray.is_initialized()
    man = capsys.readouterr().out
    assert f"{n} rows in 4 shards" in man


def test_stats_cli(ray_session, tmp_path, capsys):
    """The stats subcommand profiles a documents parquet (counts, langs,
    quantiles, dedup, top terms) and leaves the outer Ray session alive."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    docs = tmp_path / "docs.parquet"
    rows = [
        (0, "alpha beta beta", "en", "s0"),
        (1, "alpha beta beta", "en", "s0"),   # exact dup of 0
        (2, "gamma delta words here", "de", "s1"),
        (3, "more gamma content here now", "de", "s1"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        docs,
    )
    rc = main(["stats", str(docs), "--top-terms", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "documents      4" in out
    assert "en:2" in out and "de:2" in out
    assert "exact-distinct 3  (dup rows: 1)" in out
    assert "top-terms s0: beta, alpha" in out
    assert ray.is_initialized()  # session not ours to kill


def test_search_cli(ray_session, tmp_path, capsys):
    """The search subcommand ranks, snippets the hits, prints facets."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = tmp_path / "sdocs.parquet"
    rows = []
    for i in range(30):
        body = "filler words here " * (i % 5 + 1)
        if i % 3 == 0:
            body += " target phrase appears " * (i % 7 + 1)
        rows.append((i, body, "en" if i % 2 else "de"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        docs,
    )
    rc = main(
        ["search", str(docs), "--query", "target phrase", "--k", "5",
         "--facets", "lang"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "1. doc" in out and "target" in out
    assert "[lang]" in out and "hits" in out


def test_query_dsl_cli(ray_session, tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = tmp_path / "qdocs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(12), pa.int64()),
                "text": pa.array(
                    [f"alpha beta {'gamma' if i % 3 else 'delta'}" for i in range(12)],
                    pa.string(),
                ),
                "lang": pa.array(["en"] * 12, pa.string()),
            }
        ),
        docs,
    )
    rc = main(
        ["query", str(docs), "--dsl",
         '{"bool": {"must": ["alpha"], "must_not": ["delta"]}}']
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "8 matches" in out
