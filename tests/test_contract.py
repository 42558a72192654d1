"""Driver-contract guardrails: session ownership and entry-module purity."""

import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_library_never_calls_ray_init():
    """Only cli.py (guarded), bench.py and the test fixture own sessions;
    the library and __ray_entry__ must never call ray.init/shutdown."""
    offenders = []
    for py in (REPO / "ontology_matcher_ray").rglob("*.py"):
        if py.name == "cli.py":
            continue
        text = py.read_text()
        if re.search(r"\bray\.init\s*\(", text) or re.search(r"\bray\.shutdown\s*\(", text):
            offenders.append(str(py))
    entry = (REPO / "__ray_entry__.py").read_text()
    assert not re.search(r"\bray\.init\s*\(", entry)
    assert not offenders, offenders


def test_cli_init_is_guarded():
    text = (REPO / "ontology_matcher_ray" / "cli.py").read_text()
    assert "if not ray.is_initialized():" in text


def test_queries_and_oracles_consistent():
    import __ray_entry__ as m

    q, o = m.queries(), m.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))
    assert len(q) >= 25
    assert len(o) >= 17
