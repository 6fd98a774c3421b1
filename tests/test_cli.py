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
