"""Per-source KL-divergence-to-corpus (docs_train.source_kl): value-exact
vs an independent pure-Python dict recompute on a skewed fixture,
partition invariance, and the zero-divergence closed form (a single
source IS the corpus, so every log-ratio term is exactly 0)."""

import math

import pandas as pd
import pytest

from ontology_matcher_ray.pipelines.docs_train import source_kl

SF = "/root/testdata/sf0.001"


def _reference(sf: str) -> dict:
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    cst: dict = {}
    for r in docs.itertuples():
        for t in r.text.split(" "):
            cst[(r.source, t)] = cst.get((r.source, t), 0) + 1
    ct: dict = {}
    ts: dict = {}
    for (s, t), c in cst.items():
        ct[t] = ct.get(t, 0) + c
        ts[s] = ts.get(s, 0) + c
    t_all = sum(ts.values())
    L = lambda x: math.floor(1e6 * math.log(x))
    out = {}
    for (s, t), c in cst.items():
        out[s] = out.get(s, 0) + c * (L(c * t_all) - L(ts[s] * ct[t]))
    return {s: (ts[s], v // ts[s]) for s, v in out.items()}


def _run(sf: str, **kw) -> dict:
    df = source_kl(sf, **kw)
    return {r.source: (r.n_tokens, r.kl_micro) for r in df.itertuples()}


@pytest.fixture(scope="module")
def skewed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("skl")
    rows = []
    for i in range(80):
        src = "web" if i % 4 else "code"
        text = ("def f return x " * 3).strip() if src == "code" \
            else f"the quick value {i % 6} of data"
        rows.append({"doc_id": i, "text": text, "lang": "en",
                     "source": src, "n_chars": len(text)})
    pd.DataFrame(rows).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_source_kl_matches_reference(skewed_dir, ray_session):
    assert _run(skewed_dir) == _reference(skewed_dir)


def test_source_kl_on_sf(ray_session):
    assert _run(SF) == _reference(SF)


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_source_kl_partition_invariant(skewed_dir, ray_session, parts):
    assert _run(skewed_dir, num_partitions=parts) == _reference(skewed_dir)


def test_source_kl_single_source_is_zero(tmp_path, ray_session):
    rows = [{"doc_id": i, "text": f"alpha beta {i % 3}", "lang": "en",
             "source": "only", "n_chars": 10} for i in range(30)]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet",
                                  index=False)
    got = _run(str(tmp_path))
    # c_st == c_t and T_s == T for every token: L args identical -> 0
    assert list(got.values()) == [(got["only"][0], 0)]


def test_source_kl_skewed_source_diverges(skewed_dir, ray_session):
    got = _run(skewed_dir)
    # the code source shares no tokens with web: strictly positive KL
    assert got["code"][1] > 0 and got["web"][1] > 0
