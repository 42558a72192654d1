"""Cross-file duplicated-line curation (pipelines/corpus_curate): the
boilerplate table matches an independent DuckDB recompute exactly, the
line-deduped corpus matches a plain-Python per-file recompute, and the
result is invariant to exchange partitioning."""

import duckdb
import pandas as pd
import pytest

from ontology_matcher_ray import corpus as corpus_mod
from ontology_matcher_ray.pipelines import corpus_curate
from ontology_matcher_ray.schemas import DISEASE_SPEC
from ontology_matcher_ray.state.snapshot import build_snapshot

N_FILES = 600
MIN_FILES = 6


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("curate") / "corpus")
    snap = build_snapshot(DISEASE_SPEC, n_synthetic=100, seed=42)
    corpus_mod.generate_corpus(d, N_FILES, snap)
    return d


def _oracle_bp(corpus_dir: str) -> pd.DataFrame:
    return duckdb.connect().execute(f"""
WITH l AS (SELECT row_number() OVER () AS fid,
                  unnest(str_split(content, chr(10))) AS line
           FROM read_parquet('{corpus_dir}/*.parquet')),
d AS (SELECT DISTINCT fid, line FROM l WHERE line <> '')
SELECT line, count(*) AS n_files FROM d GROUP BY 1
HAVING count(*) >= {MIN_FILES} ORDER BY line
""").df()


def test_boilerplate_matches_duckdb(corpus_dir):
    got = (corpus_curate.corpus_boilerplate(corpus_dir, MIN_FILES)
           .to_pandas().sort_values("line", ignore_index=True))
    want = _oracle_bp(corpus_dir)
    assert len(got) > 50          # the fixture plants real boilerplate
    pd.testing.assert_frame_equal(got, want)


def test_boilerplate_partition_invariant(corpus_dir):
    a = (corpus_curate.corpus_boilerplate(corpus_dir, MIN_FILES,
                                          num_partitions=3)
         .to_pandas().sort_values("line", ignore_index=True))
    b = (corpus_curate.corpus_boilerplate(corpus_dir, MIN_FILES,
                                          num_partitions=64)
         .to_pandas().sort_values("line", ignore_index=True))
    pd.testing.assert_frame_equal(a, b)


def test_line_dedup_matches_python_recompute(corpus_dir):
    clean = corpus_curate.corpus_line_dedup(corpus_dir, MIN_FILES).to_pandas()
    raw = duckdb.connect().execute(
        f"SELECT repo, path, content FROM "
        f"read_parquet('{corpus_dir}/*.parquet')").df()
    assert len(clean) == len(raw) == N_FILES
    bpset = set(_oracle_bp(corpus_dir)["line"])
    m = raw.merge(clean, on=["repo", "path"], validate="one_to_one")
    for row in m.itertuples():
        lines = row.content.split("\n")
        assert row.clean_content == "\n".join(
            x for x in lines if x not in bpset)
        assert row.n_lines == len(lines)
        assert row.n_removed == sum(1 for x in lines if x in bpset)
    # the fixture must actually strip something, but never everything
    assert clean["n_removed"].sum() > 0
    assert (clean["n_lines"] > clean["n_removed"]).all()


def test_null_content_treated_as_empty(tmp_path):
    """A null content cell (legal in user-supplied parquet via the CLI)
    must not crash the Arrow split nor misalign per-row counts."""
    d = tmp_path / "nullcorp"
    d.mkdir()
    pd.DataFrame({
        "repo": ["r"] * 4, "path": ["a", "b", "c", "d"],
        "lang": ["py"] * 4,
        "content": ["dup\nx", None, "dup\ny", "dup\nz"],
        "size_bytes": [5, 0, 5, 5], "sha256": ["0"] * 4,
    }).to_parquet(d / "part-0.parquet", index=False)
    bp = corpus_curate.corpus_boilerplate(str(d), 3).to_pandas()
    assert list(bp["line"]) == ["dup"]
    clean = (corpus_curate.corpus_line_dedup(str(d), 3)
             .to_pandas().sort_values("path", ignore_index=True))
    assert list(clean["clean_content"]) == ["x", "", "y", "z"]
    assert list(clean["n_lines"]) == [2, 1, 2, 2]
    assert list(clean["n_removed"]) == [1, 0, 1, 1]


def test_precomputed_boilerplate_passthrough(corpus_dir):
    """corpus_line_dedup(boilerplate=...) (the CLI's single-count path)
    produces the identical scrub as the recompute path."""
    bp = corpus_curate.corpus_boilerplate(corpus_dir, MIN_FILES).materialize()
    a = (corpus_curate.corpus_line_dedup(corpus_dir, MIN_FILES, boilerplate=bp)
         .to_pandas().sort_values(["repo", "path"], ignore_index=True))
    b = (corpus_curate.corpus_line_dedup(corpus_dir, MIN_FILES)
         .to_pandas().sort_values(["repo", "path"], ignore_index=True))
    pd.testing.assert_frame_equal(a, b)


def test_boilerplate_hashes_sorted_unique(corpus_dir):
    bp = corpus_curate.corpus_boilerplate(corpus_dir, MIN_FILES)
    h = corpus_curate.boilerplate_hashes(bp)
    assert (h[1:] > h[:-1]).all()          # strictly sorted => unique


def test_nul_line_not_falsely_scrubbed(tmp_path):
    """Round-4 VERDICT 'wrong' #1: pandas' string hash merges values at
    an embedded NUL, so a line sharing a NUL-truncated prefix with a
    boilerplate line ('abc\\x00tail' vs boilerplate 'abc') was at risk
    of silent deletion.  With the NUL-safe content hash it must
    survive — and the true boilerplate must still be removed."""
    d = tmp_path / "nulcorp"
    d.mkdir()
    bp_line = "abc"
    victim = "abc\x00tail"       # NOT boilerplate; C-string-equal to it
    files = [f"{bp_line}\nuniq{i}" for i in range(3)] + [f"{victim}\nlast"]
    pd.DataFrame({
        "repo": ["r"] * 4, "path": [f"f{i}" for i in range(4)],
        "lang": ["py"] * 4, "content": files,
        "size_bytes": [len(c) for c in files], "sha256": ["0"] * 4,
    }).to_parquet(d / "part-0.parquet", index=False)
    bp = corpus_curate.corpus_boilerplate(str(d), 3).to_pandas()
    assert list(bp["line"]) == [bp_line]
    clean = (corpus_curate.corpus_line_dedup(str(d), 3)
             .to_pandas().sort_values("path", ignore_index=True))
    # boilerplate stripped from the three carriers
    assert list(clean["clean_content"][:3]) == [f"uniq{i}" for i in range(3)]
    # the NUL-truncated cousin is untouched
    assert clean["clean_content"][3] == f"{victim}\nlast"
    assert clean["n_removed"][3] == 0


def test_line_hash_exhaustive_nul_alphabet():
    """content-hash injectivity over EVERY string of length <= 4 from
    {'a', 'b', NUL} — the exhaustive version of the hypothesis NUL case
    that caught the layout-Bloom bug (commit 529816c): equal values hash
    equal, distinct values hash distinct, independent of batch makeup."""
    import itertools

    vals = [""]
    for n in range(1, 5):
        vals += ["".join(t) for t in itertools.product("ab\x00", repeat=n)]
    h = corpus_curate._line_hash(pd.Series(vals, dtype=object))
    assert len(set(h.tolist())) == len(vals)          # injective here
    # per-value stability regardless of surrounding batch
    for i in [0, 1, 5, 17, len(vals) - 1]:
        single = corpus_curate._line_hash(
            pd.Series([vals[i]], dtype=object))[0]
        assert single == h[i]


def test_line_dedup_level2_bit_identical(corpus_dir):
    """driver_gate=0 forces the level-2 exchange path (semi join on the
    line hash + one file-keyed rebuild exchange) on small data; output
    must be bit-identical to the broadcast path — the same contract
    global_scan's size-gated levels carry."""
    a = (corpus_curate.corpus_line_dedup(corpus_dir, MIN_FILES)
         .to_pandas().sort_values(["repo", "path"], ignore_index=True))
    b = (corpus_curate.corpus_line_dedup(corpus_dir, MIN_FILES,
                                         driver_gate=0)
         .to_pandas().sort_values(["repo", "path"], ignore_index=True))
    pd.testing.assert_frame_equal(a, b)
    assert b["n_removed"].sum() > 0      # the fixture really scrubs


def test_line_dedup_level2_nul_safe(tmp_path):
    """The NUL-truncated cousin survives on the exchange path too."""
    d = tmp_path / "nulcorp2"
    d.mkdir()
    files = ["abc\nuniq%d" % i for i in range(3)] + ["abc\x00tail\nlast"]
    pd.DataFrame({
        "repo": ["r"] * 4, "path": [f"f{i}" for i in range(4)],
        "lang": ["py"] * 4, "content": files,
        "size_bytes": [len(c) for c in files], "sha256": ["0"] * 4,
    }).to_parquet(d / "part-0.parquet", index=False)
    clean = (corpus_curate.corpus_line_dedup(str(d), 3, driver_gate=0)
             .to_pandas().sort_values("path", ignore_index=True))
    assert list(clean["clean_content"]) == [
        "uniq0", "uniq1", "uniq2", "abc\x00tail\nlast"]
    assert list(clean["n_removed"]) == [1, 1, 1, 0]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.text(
        alphabet=st.sampled_from(["a", "b", "\x00", "é", "\n"[:0] or "c"]),
        max_size=8), min_size=1, max_size=20))
    def test_line_hash_hypothesis_nul_consistency(values):
        """Property: equal strings hash equal across any batch makeup;
        distinct strings (incl. NUL-adversarial pairs) hash distinct —
        the hypothesis form of the 529816c regression."""
        h = corpus_curate._line_hash(pd.Series(values, dtype=object))
        seen = {}
        for v, x in zip(values, h):
            if v in seen:
                assert seen[v] == x, repr(v)
            seen[v] = x
        assert len(set(seen.values())) == len(seen)
        # singleton probes agree with the batch hash
        for v in set(values):
            assert corpus_curate._line_hash(
                pd.Series([v], dtype=object))[0] == seen[v], repr(v)
except ImportError:      # hypothesis is baked in, but stay import-safe
    pass
