"""Deterministic fixture lexicon + xref dictionary (FIXTURES.md F3/F4).

``FIXTURE_TERMS`` maps ontology term surface forms (drawn from the synthetic
``documents`` vocabulary) to raw CURIEs; ``FIXTURE_DICT`` maps raw CURIEs to
per-database id lists shaped like the reference's lookup responses
(``ConvertedId`` dynamic attributes, ``ontology_formatter.py:45-102``).  The
entries are chosen to drive EVERY branch of the §2.8 routing tree:

* single default-db hit        -> canonical output id
* default-db self (MONDO:...)  -> pass-through
* hits only in non-default dbs -> keep raw id (mixture fallback, rule 7)
* multiple default-db hits     -> failed "Multiple results found" (rule 4)
* no dictionary entry          -> failed "No results found" (rule 3)
* metadata present             -> name/description/synonyms/xrefs merge

``EXPECTED_ROUTE`` is the HAND-COMPUTED oracle (raw_id -> status, reason,
output id, sorted xref set) used to build the DuckDB oracle SQL; it is
intentionally written as literals, independent of the engine's routing
code, so a routing bug cannot pass the correctness gate.

Golden cross-check entries from the reference's committed example results
(``/root/reference/examples/results/disease_formatted.json``, first record:
``MESH:C579849 -> MONDO:0013256`` with xrefs OMIM:613406, UMLS:C3150674,
ORDO:94065, UMLS:CN237818, DOID:0060395) are included verbatim as data.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

# term -> raw CURIE (disease-shaped CURIE space; see DISEASE_SPEC)
FIXTURE_TERMS: Dict[str, str] = {
    "spark": "MESH:D0000001",
    "hash": "MESH:D0000002",
    "join": "DOID:0000003",
    "merge": "OMIM:600004",
    "sort": "UMLS:C0000005",
    "filter": "MESH:D0000006",
    "window": "HP:0000007",
    "vector": "MESH:D0000008",
    "stream": "Orphanet:900009",
    "scan": "MESH:D0000010",
    "table": "ICD10CM:C11",
    "hash join": "MONDO:0000012",
    "sort merge": "MESH:D0000013",
    "group": "MESH:D0000014",
    "vector window": "MESH:D0000015",
    "customer": "ICD-9:349.89",
}

# raw_id -> {db: [curies]}  (absent raw_id == "No results found")
FIXTURE_DICT: Dict[str, Dict[str, List[str]]] = {
    "MESH:D0000001": {"MONDO": ["MONDO:0000001"], "DOID": ["DOID:0000019"]},
    "MESH:D0000002": {"MONDO": ["MONDO:0000002"]},
    "DOID:0000003": {"MONDO": ["MONDO:0000003"], "UMLS": ["UMLS:C0000033"]},
    "OMIM:600004": {"MONDO": ["MONDO:0000004"]},
    "UMLS:C0000005": {"HP": ["HP:0000055"]},
    "MESH:D0000006": {"MONDO": ["MONDO:0000601", "MONDO:0000602"]},
    "HP:0000007": {"MONDO": ["MONDO:0000007"], "UMLS": ["UMLS:C0000077"]},
    # MESH:D0000008 intentionally absent -> "No results found"
    "Orphanet:900009": {"MONDO": ["MONDO:0000009"]},
    "MESH:D0000010": {"DOID": ["DOID:0000100"], "HP": ["HP:0000100"]},
    "ICD10CM:C11": {"MONDO": ["MONDO:0000011"]},
    "MONDO:0000012": {"DOID": ["DOID:0000120"]},
    "MESH:D0000013": {"MONDO": ["MONDO:0000013"]},
    "MESH:D0000014": {"MONDO": ["MONDO:0000014"]},
    "MESH:D0000015": {"MONDO": ["MONDO:0000015"]},
    "ICD-9:349.89": {"MONDO": ["MONDO:0000016"]},
    # golden record lifted from the reference's committed example output
    "MESH:C579849": {
        "MONDO": ["MONDO:0013256"],
        "DOID": ["DOID:0060395"],
        "OMIM": ["OMIM:613406"],
        "Orphanet": ["Orphanet:94065"],
        "UMLS": ["UMLS:C3150674", "UMLS:CN237818"],
    },
}

# raw_id -> metadata Entity payload (apis.py:16-36 shape); most have none.
FIXTURE_METADATA: Dict[str, Dict[str, object]] = {
    "MESH:D0000014": {
        "name": "group disorder",
        "description": "a grouped disorder",
        "synonyms": ["group syndrome", "aggregation disease"],
        "xrefs": ["UMLS:C0000144"],
    },
}

# ---------------------------------------------------------------------------
# HAND-COMPUTED oracle (strategy = MIXTURE).
# tuple: (status, reason, out_id, xrefs sorted pipe-joined)
#   status "ok"      -> converted, canonical default-db id
#   status "ok_raw"  -> converted, no default-db id, raw id kept (rule 7)
#   status "failed"  -> routed to failed; under MIXTURE readmitted with raw
#                       id and NO xref enrichment (rules 3/4/8)
# xrefs include the raw id itself whenever its prefix is not the default db
# (get_alias_ids over the prefix attribute, ontology_formatter.py:625-641).
# ---------------------------------------------------------------------------
EXPECTED_ROUTE: Dict[str, Tuple[str, str, str, str]] = {
    "MESH:D0000001": ("ok", "", "MONDO:0000001", "DOID:0000019|MESH:D0000001"),
    "MESH:D0000002": ("ok", "", "MONDO:0000002", "MESH:D0000002"),
    "DOID:0000003": ("ok", "", "MONDO:0000003", "DOID:0000003|UMLS:C0000033"),
    "OMIM:600004": ("ok", "", "MONDO:0000004", "OMIM:600004"),
    "UMLS:C0000005": ("ok_raw", "", "UMLS:C0000005", "HP:0000055|UMLS:C0000005"),
    "MESH:D0000006": ("failed", "Multiple results found", "MESH:D0000006", ""),
    "HP:0000007": ("ok", "", "MONDO:0000007", "HP:0000007|UMLS:C0000077"),
    "MESH:D0000008": ("failed", "No results found", "MESH:D0000008", ""),
    "Orphanet:900009": ("ok", "", "MONDO:0000009", "Orphanet:900009"),
    "MESH:D0000010": (
        "ok_raw", "", "MESH:D0000010", "DOID:0000100|HP:0000100|MESH:D0000010",
    ),
    "ICD10CM:C11": ("ok", "", "MONDO:0000011", "ICD10CM:C11"),
    "MONDO:0000012": ("ok", "", "MONDO:0000012", "DOID:0000120"),
    "MESH:D0000013": ("ok", "", "MONDO:0000013", "MESH:D0000013"),
    "MESH:D0000014": (
        "ok", "", "MONDO:0000014", "MESH:D0000014|UMLS:C0000144",
    ),
    "MESH:D0000015": ("ok", "", "MONDO:0000015", "MESH:D0000015"),
    "ICD-9:349.89": ("ok", "", "MONDO:0000016", "ICD-9:349.89"),
    "MESH:C579849": (
        "ok",
        "",
        "MONDO:0013256",
        "DOID:0060395|MESH:C579849|OMIM:613406|Orphanet:94065|UMLS:C3150674|UMLS:CN237818",
    ),
}

# Terms in deterministic order for the docs->entity-table derivation
# (doc_id % len(ORDERED_TERMS) picks the raw id); oracle SQL mirrors this.
ORDERED_TERMS: List[Tuple[str, str]] = sorted(FIXTURE_TERMS.items())


def entity_raw_id_for_doc(doc_id: int) -> str:
    return ORDERED_TERMS[doc_id % len(ORDERED_TERMS)][1]
