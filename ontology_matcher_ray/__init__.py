"""ontology_matcher_ray — Ray-Data-native KG construction engine.

From-scratch re-expression of open-prophetdb/ontology-matcher's semantics
(identifier normalization, xref-dictionary entity resolution, mixture
fallback chains, canonicalization + dedup, triple emission) as streaming
``ray.data.Dataset`` pipelines.  See SURVEY.md for the blueprint.

This package never calls ``ray.init``/``ray.shutdown``; sessions are owned
by the CLI entry points, ``bench.py`` and the test fixture.
"""

from ontology_matcher_ray.schemas import (
    SPECS,
    DISEASE_SPEC,
    GENE_SPEC,
    COMPOUND_SPEC,
    METABOLITE_SPEC,
    SYMPTOM_SPEC,
    OntologySpec,
    Strategy,
)

__version__ = "0.1.0"

__all__ = [
    "SPECS",
    "DISEASE_SPEC",
    "GENE_SPEC",
    "COMPOUND_SPEC",
    "METABOLITE_SPEC",
    "SYMPTOM_SPEC",
    "OntologySpec",
    "Strategy",
]
