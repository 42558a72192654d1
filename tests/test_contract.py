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


def test_coverage_surface_count():
    """COVERAGE.md's headline surface count is ARITHMETIC over its own
    gate map (round-4 VERDICT flagged 69/78/81 drift across three
    places): surfaces = components in the consolidation table (first
    cell, parenthesized text stripped, split on '/' and '⋈') plus
    standalone queries (50 - table rows).  Also pins queries() at
    exactly 50 and every mapped driver-query name to a real entry."""
    import re

    import __ray_entry__ as m

    q = m.queries()
    assert len(q) == 50

    text = (REPO / "COVERAGE.md").read_text()
    head = re.search(
        r"## Driver-gate consolidation: 50 queries, (\d+) verified",
        text)
    assert head, "COVERAGE.md headline count missing"
    stated = int(head.group(1))

    components, rows, qnames = 0, 0, []
    in_tbl = False
    for line in text.splitlines():
        if line.startswith("| Component operator"):
            in_tbl = True
            continue
        if in_tbl:
            if not line.startswith("|"):
                break
            if line.startswith("|---"):
                continue
            cells = line.split("|")
            first = re.sub(r"\([^)]*\)", "", cells[1])
            components += len(re.split(r"/|⋈", first))
            rows += 1
            mq = re.search(r"`(\w+)`", cells[2])
            assert mq, f"no driver-query name in: {cells[2][:60]}"
            qnames.append(mq.group(1))
    assert rows > 15, "consolidation table not found"
    assert len(set(qnames)) == rows, "duplicate composite rows"
    for name in qnames:
        assert name in q, f"table maps to unknown query {name!r}"
    assert stated == components + (50 - rows), (
        f"COVERAGE.md says {stated}, table arithmetic gives "
        f"{components} components + {50 - rows} standalone")
