"""Core data model: entity-type specs, strategies, Arrow schemas.

Re-expresses the reference's ``OntologyType`` registry
(``/root/reference/ontology_matcher/ontology_formatter.py:14-36`` and the
per-type instances ``disease/__init__.py:24-38``, ``gene/__init__.py:22-43``,
``compound/__init__.py:19-23``, ``metabolite/__init__.py:19-23``,
``symptom/__init__.py:30-32``) as plain config dataclasses that drive
Ray Data pipeline construction.  Nothing here touches Ray: these are pure
declarations shared by stages, snapshots, tests and the CLI.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum
from typing import Dict, List, Optional

import pyarrow as pa


class Strategy(Enum):
    """Mirror of ``ontology_formatter.py:33-36``."""

    UNIQUE = "Unique"
    MIXTURE = "Mixture"


@dataclass(frozen=True)
class OntologySpec:
    """An entity type: its label, canonical database and permitted sources.

    ``type``/``default``/``choices`` mirror ``OntologyType``
    (``ontology_formatter.py:14-30``).  ``gene_style_metadata`` selects the
    gene formatter's metadata-merge rules (``gene/__init__.py:332-354``)
    instead of the default ones (``ontology_formatter.py:656-673``).
    ``batch_cap`` mirrors the per-type batch-size caps
    (``ontology_formatter.py:262-269``, ``gene/__init__.py:89-92``); the Ray
    engine uses it only as a default ``batch_size`` hint for linker stages.
    """

    type: str
    default: str
    choices: List[str] = field(default_factory=list)
    gene_style_metadata: bool = False
    batch_cap: int = 500
    #: per-database reference websites, printed after a conversion
    #: (``print_ontology_links``, ontology_formatter.py:346-356) and by
    #: ``idtypes --links``; every choice must have one (checked there)
    ontology_links: Dict[str, str] = field(default_factory=dict)
    #: the upstream API the reference's converter would call
    #: (``ConversionResult.database_url``, ontology_formatter.py:220) —
    #: informational here: this engine resolves against the offline
    #: dictionary snapshot instead of the live service
    database_url: str = ""

    @property
    def curie_regex(self) -> "re.Pattern[str]":
        """CURIE validation regex, as in ``ontology_formatter.py:292``."""
        return re.compile(r"^(%s):[a-z0-9A-Z\.\*\+]+$" % "|".join(self.choices))

    @property
    def non_default_choices(self) -> List[str]:
        return [c for c in self.choices if c != self.default]


DISEASE_SPEC = OntologySpec(
    type="Disease",
    default="MONDO",
    choices=["MONDO", "DOID", "MESH", "OMIM", "ICD-9", "HP", "ICD10CM", "Orphanet", "UMLS"],
    # disease/__init__.py:68-82 (SNOMED stays excluded there too)
    ontology_links={
        "MONDO": "https://www.ebi.ac.uk/ols4/ontologies/mondo",
        "DOID": "https://www.ebi.ac.uk/ols4/ontologies/doid",
        "MESH": "https://meshb.nlm.nih.gov/search",
        "OMIM": "https://www.omim.org/",
        "ICD-9": "https://www.cdc.gov/nchs/icd/icd9.htm",
        "HP": "https://hpo.jax.org/app/",
        "ICD10CM": "https://www.cdc.gov/nchs/icd/icd-10-cm.htm",
        "Orphanet": "https://www.orpha.net/consor/cgi-bin/index.php",
        "UMLS": "https://www.nlm.nih.gov/research/umls/",
    },
    database_url="https://www.ebi.ac.uk/spot/oxo/api/search",
)

GENE_SPEC = OntologySpec(
    type="Gene",
    default="ENTREZ",
    choices=["ENTREZ", "ENSEMBL", "HGNC", "MGI", "SYMBOL", "UNIPROT"],
    gene_style_metadata=True,
    batch_cap=1000,
    # gene/__init__.py:79-88
    ontology_links={
        "ENTREZ": "https://www.ncbi.nlm.nih.gov/gene/",
        "ENSEMBL": "http://useast.ensembl.org/index.html",
        "HGNC": "https://www.genenames.org",
        "SYMBOL": "https://www.genenames.org",
        "MGI": "http://www.informatics.jax.org",
        "UNIPROT": "https://www.uniprot.org/uniprot/",
    },
    database_url="https://mygene.info",
)

COMPOUND_SPEC = OntologySpec(
    type="Compound",
    default="DrugBank",
    choices=["DrugBank", "PUBCHEM", "CHEBI", "MESH", "UMLS", "CHEMBL", "HMDB"],
    # compound/__init__.py:55-65
    ontology_links={
        "DrugBank": "https://go.drugbank.com/drugs",
        "PUBCHEM": "https://pubchem.ncbi.nlm.nih.gov/",
        "CHEBI": "https://www.ebi.ac.uk/chebi/init.do",
        "MESH": "https://meshb.nlm.nih.gov/search",
        "UMLS": "https://www.nlm.nih.gov/research/umls/",
        "CHEMBL": "https://www.ebi.ac.uk/chembl/",
        "HMDB": "https://hmdb.ca/",
    },
    database_url="https://mychem.info",
)

METABOLITE_SPEC = OntologySpec(
    type="Metabolite",
    default="HMDB",
    choices=["HMDB", "DrugBank", "PUBCHEM", "CHEBI", "MESH", "UMLS", "CHEMBL"],
    # metabolite/__init__.py:55-65
    ontology_links={
        "HMDB": "https://hmdb.ca/metabolites/",
        "DrugBank": "https://go.drugbank.com/drugs",
        "PUBCHEM": "https://pubchem.ncbi.nlm.nih.gov/",
        "CHEBI": "https://www.ebi.ac.uk/chebi/init.do",
        "MESH": "https://meshb.nlm.nih.gov/search",
        "UMLS": "https://www.nlm.nih.gov/research/umls/",
        "CHEMBL": "https://www.ebi.ac.uk/chembl/",
    },
    database_url="https://mychem.info",
)

SYMPTOM_SPEC = OntologySpec(
    type="Symptom",
    default="UMLS",
    choices=["SYMP", "MESH", "UMLS", "HP"],
    # symptom/__init__.py:62-69
    ontology_links={
        "UMLS": "https://www.nlm.nih.gov/research/umls/",
        "MESH": "https://www.nlm.nih.gov/mesh/",
        "SYMP": "https://bioportal.bioontology.org/ontologies/SYMP",
        "HP": "https://hpo.jax.org/app/",
    },
    database_url="https://www.ebi.ac.uk/spot/oxo/api/search",
)

SPECS: Dict[str, OntologySpec] = {
    "disease": DISEASE_SPEC,
    "gene": GENE_SPEC,
    "compound": COMPOUND_SPEC,
    "metabolite": METABOLITE_SPEC,
    "symptom": SYMPTOM_SPEC,
}


# ---------------------------------------------------------------------------
# Entity-file schema (reference input format).
# Required / optional columns per BaseOntologyFileFormat
# (ontology_formatter.py:398-436).
# ---------------------------------------------------------------------------

REQUIRED_COLUMNS = ["id", "name", "label", "resource"]
OPTIONAL_COLUMNS = ["description", "synonyms", "pmids", "taxid", "xrefs"]
ALL_ENTITY_COLUMNS = REQUIRED_COLUMNS + OPTIONAL_COLUMNS

# Formatted-output column order, from examples/results/*_formatted.tsv.
FORMATTED_COLUMNS = [
    "id", "name", "label", "resource", "description",
    "synonyms", "pmids", "taxid", "xrefs", "raw_id",
]

# Routing statuses emitted by the resolve stage (SURVEY.md §2.8).
STATUS_OK = "ok"                    # single default-db id -> canonical output
STATUS_OK_RAW = "ok_raw"            # converted, no default-db id -> keep raw id
STATUS_FAILED = "failed"            # routed to failed (reason column says why)
STATUS_INVALID = "invalid"          # CURIE regex failure (ontology_formatter.py:292-303)

REASON_NO_RESULTS = "No results found"
REASON_MULTIPLE = "Multiple results found"
REASON_UNIQUE_MULTI = "The strategy is unique, but multiple results found"


def reason_invalid_prefix(spec: OntologySpec) -> str:
    """Invalid-prefix reason text, after ``disease/__init__.py:112-119``."""
    return "Invalid prefix, only support %s" % spec.choices


# ---------------------------------------------------------------------------
# Arrow schemas (SURVEY.md §1.3).
# ---------------------------------------------------------------------------

CORPUS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
    ]
)

DICTIONARY_SCHEMA = pa.schema(
    [
        ("raw_id", pa.string()),
        # per-database mapped CURIEs; map<db, list<curie>> per FIXTURES.md F3
        ("db_ids", pa.map_(pa.string(), pa.list_(pa.string()))),
        ("name", pa.string()),
        ("synonyms", pa.list_(pa.string())),
        ("xrefs", pa.list_(pa.string())),
        ("description", pa.string()),
        ("pmids", pa.list_(pa.string())),
        ("taxid", pa.string()),
    ]
)

LEXICON_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("raw_id", pa.string()),
    ]
)
