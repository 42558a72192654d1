"""Planted-cluster checks for the quality-priority survivor kernel
(docs_train.quality_priority_keep); engine-vs-SQL coverage of the full
column lives in the driver gate (dedup_assignments)."""

import numpy as np
import pandas as pd

from ontology_matcher_ray.pipelines.docs_train import quality_priority_keep


def frame(rows):
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id", "quality_band"])


def kept(g):
    out = quality_priority_keep(g)
    return set(out.loc[out["keep_best_quality"], "doc_id"])


def test_highest_band_wins():
    g = frame([(1, 10, "low"), (2, 10, "high"), (3, 10, "medium")])
    assert kept(g) == {2}


def test_tie_breaks_to_min_doc_id():
    g = frame([(5, 10, "medium"), (3, 10, "medium"), (9, 10, "low")])
    assert kept(g) == {3}


def test_one_winner_per_cluster_and_singletons_kept():
    g = frame([(1, 10, "low"), (2, 10, "high"),
               (7, 20, "low"),                       # singleton
               (8, 30, "medium"), (4, 30, "high"), (6, 30, "high")])
    assert kept(g) == {2, 7, 4}


def test_empty_partition():
    out = quality_priority_keep(frame([]))
    assert list(out.columns)[-1] == "keep_best_quality"
    assert len(out) == 0


def test_unknown_band_ranks_lowest():
    g = frame([(1, 10, "weird"), (2, 10, "low")])
    # both rank 0 -> min doc_id wins... except 'low' maps to 0 too
    assert kept(g) == {1}
