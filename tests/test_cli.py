"""CLI surface tests (ontology / dedup / idtypes / template / corpus-kg)."""

import os

import pandas as pd

from ontology_matcher_ray.cli import main


def test_template_and_idtypes(tmp_path, capsys):
    out = tmp_path / "tmpl.tsv"
    assert main(["template", "-O", "disease", "-o", str(out)]) == 0
    df = pd.read_csv(out, sep="\t")
    assert list(df.columns) == ["id", "name", "label", "resource"]

    assert main(["idtypes", "-O", "gene"]) == 0
    got = capsys.readouterr().out
    for db in ["ENTREZ", "ENSEMBL", "HGNC", "MGI", "SYMBOL", "UNIPROT"]:
        assert db in got


def test_ontology_command(tmp_path):
    inp = tmp_path / "in.tsv"
    pd.DataFrame(
        [
            {"id": "MESH:D0000001", "name": "spark", "label": "Disease", "resource": "CTD"},
            {"id": "MESH:D0000008", "name": "vector", "label": "Disease", "resource": "CTD"},
        ]
    ).to_csv(inp, sep="\t", index=False)
    out = tmp_path / "out.tsv"
    assert main(["ontology", "-i", str(inp), "-o", str(out), "-O", "disease"]) == 0
    res = pd.read_csv(out, sep="\t").fillna("")
    assert set(res["id"]) == {"MONDO:0000001", "MESH:D0000008"}


def test_dedup_command(tmp_path):
    inp = tmp_path / "fmt.tsv"
    pd.DataFrame(
        [
            {"id": "MONDO:1", "label": "Disease", "name": "a", "xrefs": "X:1|X:2",
             "synonyms": "s1", "raw_id": "MESH:1"},
            {"id": "MONDO:1", "label": "Disease", "name": "b", "xrefs": "X:2|X:3",
             "synonyms": "s2", "raw_id": "MESH:2"},
            {"id": "MONDO:2", "label": "Disease", "name": "c", "xrefs": "",
             "synonyms": "", "raw_id": "MESH:3"},
        ]
    ).to_csv(inp, sep="\t", index=False)
    out = tmp_path / "dedup.tsv"
    assert main(["dedup", "-i", str(inp), "-o", str(out)]) == 0
    res = pd.read_csv(out, sep="\t").fillna("")
    assert len(res) == 2
    row = res[res["id"] == "MONDO:1"].iloc[0]
    assert row["name"] == "a"                       # first by input order
    assert row["xrefs"] == "X:1|X:2|X:3"            # merge_unique
    assert row["raw_id"] == "MESH:1|MESH:2"


def test_analyze_command(tmp_path):
    out = tmp_path / "packed"
    assert main([
        "analyze", "--sf-dir", "/root/testdata/sf0.001",
        "--output-dir", str(out), "--op", "pack",
    ]) == 0
    df = pd.read_parquet(out)
    assert len(df) == 500
    assert {"doc_id", "n_tokens", "start_offset", "chunk_id", "n_chunks"} == set(df.columns)

    out2 = tmp_path / "sketch"
    assert main([
        "analyze", "--sf-dir", "/root/testdata/sf0.001",
        "--output-dir", str(out2), "--op", "sketch",
    ]) == 0
    assert set(pd.read_parquet(out2).columns) == {"lang", "reg", "max_rho"}


def test_analyze_dsir_op(tmp_path):
    out = tmp_path / "dsir"
    assert main([
        "analyze", "--sf-dir", "/root/testdata/sf0.001",
        "--output-dir", str(out), "--op", "dsir",
    ]) == 0
    df = pd.read_parquet(out)
    assert len(df) == 500
    assert set(df.columns) == {"doc_id", "n_bigrams", "dsir_score_micro"}


def test_analyze_reach_op(tmp_path):
    out = tmp_path / "reach"
    assert main([
        "analyze", "--sf-dir", "/root/testdata/sf0.001",
        "--output-dir", str(out), "--op", "reach",
    ]) == 0
    df = pd.read_parquet(out)
    assert set(df.columns) == {"node", "n_reach"}
    assert len(df) > 0 and (df["n_reach"] >= 1).all()


def test_corpus_dedup_command(tmp_path, capsys):
    """corpus-dedup writes the boilerplate table and the line-scrubbed
    corpus; counts agree with the library pipelines it composes."""
    from ontology_matcher_ray import corpus as corpus_mod
    from ontology_matcher_ray.schemas import DISEASE_SPEC
    from ontology_matcher_ray.state.snapshot import build_snapshot

    corp = str(tmp_path / "corp")
    snap = build_snapshot(DISEASE_SPEC, n_synthetic=100, seed=42)
    corpus_mod.generate_corpus(corp, 300, snap)
    out = tmp_path / "dedup_out"
    assert main(["corpus-dedup", "--corpus-dir", corp,
                 "--output-dir", str(out), "--min-files", "6"]) == 0
    bp = pd.read_parquet(out / "boilerplate")
    clean = pd.read_parquet(out / "clean")
    assert set(bp.columns) == {"line", "n_files"}
    assert (bp["n_files"] >= 6).all() and len(bp) > 0
    assert len(clean) == 300
    assert clean["n_removed"].sum() > 0
    assert f"corpus-dedup: {len(bp)} boilerplate lines" in capsys.readouterr().out


def test_idtypes_links_notice(capsys):
    """idtypes --links prints the reference's ontology-links notice
    (ontology_formatter.py:346-356) with one URL per supported database,
    plus the converter's upstream database_url."""
    assert main(["idtypes", "-O", "disease", "--links"]) == 0
    got = capsys.readouterr().out
    assert "NOTICE:" in got
    assert "MONDO: https://www.ebi.ac.uk/ols4/ontologies/mondo" in got
    assert "database_url: https://www.ebi.ac.uk/spot/oxo/api/search" in got
    # every choice of every type has a link (the notice's own check)
    from ontology_matcher_ray.schemas import SPECS

    for spec in SPECS.values():
        assert set(spec.choices) <= set(spec.ontology_links), spec.type
        assert spec.database_url


def test_analyze_range_partitioned_output(tmp_path):
    """--range-key writes resumable range=NNNNN/ sorted parquet dirs."""
    import glob
    import json

    out = tmp_path / "rp"
    assert main([
        "analyze", "--sf-dir", "/root/testdata/sf0.001",
        "--output-dir", str(out), "--op", "pii-scrub",
        "--range-key", "doc_id", "--num-ranges", "4",
    ]) == 0
    dirs = sorted(glob.glob(str(out / "range=*")))
    assert len(dirs) == 4
    assert json.load(open(out / "_cuts.json"))["key"] == "doc_id"
    parts = [pd.read_parquet(d) for d in dirs]
    assert sum(len(p) for p in parts) == 500
    assert all(p["doc_id"].is_monotonic_increasing for p in parts)
    assert all(parts[i]["doc_id"].max() < parts[i + 1]["doc_id"].min()
               for i in range(3))


def test_layout_command(tmp_path, capsys):
    import numpy as np

    src = tmp_path / "small"
    src.mkdir()
    rng = np.random.default_rng(5)
    for i in range(8):
        pd.DataFrame({
            "k": rng.integers(0, 1000, 100).astype("int64"),
            "v": rng.integers(0, 10, 100).astype("int64"),
        }).to_parquet(src / f"in-{i:03d}.parquet", index=False)

    comp = tmp_path / "compacted"
    assert main(["layout", "compact", "--input-dir", str(src),
                 "--output-dir", str(comp), "--target-mb", "1",
                 "--stat-cols", "k"]) == 0
    assert "compact: 8 inputs" in capsys.readouterr().out

    zo = tmp_path / "zordered"
    assert main(["layout", "zorder", "--input-dir", str(comp),
                 "--output-dir", str(zo), "--cols", "k,v",
                 "--num-files", "4"]) == 0
    assert "Z-clustered parts" in capsys.readouterr().out

    assert main(["layout", "scan", "--input-dir", str(zo),
                 "--col", "k", "--lo", "0", "--hi", "100"]) == 0
    out = capsys.readouterr().out
    assert "zone maps skipped" in out


def test_layout_missing_flags_rejected(tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        main(["layout", "compact", "--input-dir", str(tmp_path)])


def test_layout_merge_and_vacuum(tmp_path, capsys):
    import numpy as np
    import ray.data as rd

    from ontology_matcher_ray.sources.io import write_range_partitioned

    tbl = tmp_path / "tbl"
    df = pd.DataFrame({"k": np.arange(100, dtype="int64"),
                       "v": np.arange(100, dtype="int64")})
    write_range_partitioned(rd.from_pandas(df), str(tbl), "k", num_ranges=4)
    ch = tmp_path / "changes"
    ch.mkdir()
    pd.DataFrame({"k": [5, 200], "v": [99, 1],
                  "_op": ["upsert", "upsert"]}).to_parquet(
        ch / "c.parquet", index=False)
    assert main(["layout", "merge", "--input-dir", str(tbl),
                 "--changes", str(ch)]) == 0
    assert "2 upserts" in capsys.readouterr().out

    (tbl / "range=00000.old").mkdir()
    assert main(["layout", "vacuum", "--input-dir", str(tbl)]) == 0
    assert "1 old" in capsys.readouterr().out


def test_table_command(tmp_path, capsys):
    import numpy as np

    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame({"k": np.arange(50, dtype="int64"),
                  "v": np.arange(50, dtype="int64")}).to_parquet(
        src / "a.parquet", index=False)
    base = str(tmp_path / "vt")
    assert main(["table", "create", "--base", base,
                 "--input-dir", str(src), "--key", "k",
                 "--num-ranges", "4"]) == 0
    assert "v1 with 50 rows" in capsys.readouterr().out

    ch = tmp_path / "ch"
    ch.mkdir()
    pd.DataFrame({"k": [1, 100], "v": [99, 1],
                  "_op": ["upsert", "upsert"]}).to_parquet(
        ch / "c.parquet", index=False)
    assert main(["table", "merge", "--base", base,
                 "--changes", str(ch)]) == 0
    assert "v2 (2 upserts" in capsys.readouterr().out

    assert main(["table", "log", "--base", base]) == 0
    log = capsys.readouterr().out
    assert "v1: op=create" in log and "v2: op=merge" in log

    assert main(["table", "vacuum", "--base", base,
                 "--keep-last", "1"]) == 0
    assert "dropped 1 versions" in capsys.readouterr().out


def test_corpus_kg_publish_base(tmp_path, capsys):
    """--publish-base ships the built triples into the MVCC table (v1),
    'table probe' point-reads a subject through the Bloom sidecars, and
    a rebuild republish of the SAME corpus is a no-op merge (v2 +0/-0)."""
    corp = str(tmp_path / "corp")
    base = str(tmp_path / "kgtable")
    args = ["corpus-kg", "--corpus-dir", corp,
            "--output-dir", str(tmp_path / "kg"),
            "--generate", "--n-files", "300", "--dict-size", "500",
            "--shards", "2", "--publish-base", base]
    assert main(args) == 0
    out = capsys.readouterr().out
    assert "kg publish: v1" in out

    from ontology_matcher_ray.sources import versioned as vt

    head = vt.read_versioned(base, columns=["subj"]).take(1)[0]["subj"]
    assert main(["table", "probe", "--base", base,
                 "--col", "subj", "--value", head]) == 0
    probe_out = capsys.readouterr().out
    n = int(probe_out.split("table probe: ")[1].split(" rows")[0])
    assert n >= 1

    # same corpus, fresh build dir -> empty diff: NOTHING commits
    # (head stays v1), reported as +0/-0
    assert main(["corpus-kg", "--corpus-dir", corp,
                 "--output-dir", str(tmp_path / "kg_b"),
                 "--generate", "--n-files", "300", "--dict-size", "500",
                 "--shards", "2", "--publish-base", base]) == 0
    out2 = capsys.readouterr().out
    assert "kg publish: v1" in out2 and "(+0 / -0" in out2
    assert vt.list_versions(base) == [1]
