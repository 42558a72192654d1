"""Per-partition checkpoint/lineage + resume (SURVEY.md §4.3).

The reference checkpoints a whole run as one JSON and skips re-running when
the file exists (``ontology_formatter.py:777-790``, ``cli.py:127-148``).
At corpus scale that must become PER-PARTITION: input files are planned
into shards; each shard's pipeline output lands in its own directory,
written atomically (tmp dir + rename), with a lineage record
``{stage, shard, input_files, row_count, content_sha256_agg, triple_count,
wall_time}`` appended to a JSON-lines manifest.  Resume = skip shards whose
lineage record exists and whose output dir is complete; kill the job at any
point and a rerun does only the missing shards.

``content_sha256_agg`` is an ORDER-INDEPENDENT aggregate (XOR of per-row
sha256 prefixes) of the input ``content`` column — the per-row invariant
demanded by BASELINE.json ``input_hint`` — so a resumed run can prove it
read the same bytes without re-hashing the whole corpus again.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict, dataclass
from typing import Callable, Dict, List, Optional

import pandas as pd


@dataclass
class LineageRecord:
    stage: str
    shard: int
    input_files: List[str]
    row_count: int
    content_sha256_agg: str
    triple_count: int
    wall_time: float
    #: input files excluded by corrupt-input quarantine (default keeps
    #: manifests written before the field existed loadable)
    quarantined: int = 0


class Manifest:
    """JSON-lines manifest of completed (stage, shard) partitions."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path), exist_ok=True)

    def completed(self) -> Dict[tuple, LineageRecord]:
        out: Dict[tuple, LineageRecord] = {}
        if not os.path.exists(self.path):
            return out
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = LineageRecord(**json.loads(line))
                out[(rec.stage, rec.shard)] = rec
        return out

    def append(self, rec: LineageRecord) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(asdict(rec)) + "\n")


def xor_sha_agg(hex_hashes: pd.Series) -> str:
    """Order-independent fold of hex sha256 strings (XOR of first 16 bytes)."""
    acc = 0
    for h in hex_hashes:
        acc ^= int(h[:32], 16)
    return "%032x" % acc


def plan_shards(files: List[str], n_shards: int) -> List[List[str]]:
    """Contiguous round-robin-free sharding: files sorted, then split into
    contiguous ranges so each shard's inputs are an explicit file range."""
    files = sorted(files)
    n_shards = max(1, min(n_shards, len(files)))
    per = (len(files) + n_shards - 1) // n_shards
    return plan_shards_by_size(files, per)


def plan_shards_by_size(files: List[str], files_per_shard: int) -> List[List[str]]:
    """Fixed-SIZE sharding for incremental ingest: chunk boundaries depend
    only on sorted position, so APPENDING files (sorting after the
    existing ones) leaves every full earlier shard's input list unchanged
    — a rerun recomputes only the previously-partial last shard and the
    new shards (``run_sharded`` validates input lists, so a shifted shard
    can never silently reuse stale output)."""
    files = sorted(files)
    per = max(1, files_per_shard)
    return [files[i : i + per] for i in range(0, len(files), per)]


def run_sharded(
    stage: str,
    shards: List[List[str]],
    out_dir: str,
    manifest: Manifest,
    run_shard: Callable[[List[str], str], Dict[str, object]],
) -> List[LineageRecord]:
    """Run ``run_shard(input_files, shard_out_dir)`` for every incomplete
    shard; atomic rename + lineage append on success.

    ``run_shard`` must return ``{"row_count": int, "content_sha256_agg":
    str, "triple_count": int}``.  Completed shards (lineage record present
    AND output dir exists AND the recorded input_files EQUAL this plan's)
    are skipped — this is the resume path.  The input check matters: when
    the corpus grows or the shard plan changes, boundaries shift, and a
    bare (stage, shard) match would silently reuse output computed from
    DIFFERENT inputs.  A recomputed shard appends a superseding lineage
    record (``completed()`` keeps the last per key).
    """
    import glob as _glob
    import re as _re

    # prune orphans: shard dirs beyond the CURRENT plan's length (a
    # shrinking plan — fewer/bigger shards — would otherwise leave stale
    # outputs that any shard=*/ glob reader ingests as duplicates)
    for d in _glob.glob(os.path.join(out_dir, "shard=*")):
        m = _re.fullmatch(r"shard=(\d+)(?:\.tmp)?", os.path.basename(d))
        if m and int(m.group(1)) >= len(shards):
            shutil.rmtree(d)

    done = manifest.completed()
    records: List[LineageRecord] = []
    for shard_idx, input_files in enumerate(shards):
        final_dir = os.path.join(out_dir, f"shard={shard_idx:05d}")
        prior = done.get((stage, shard_idx))
        if (prior is not None and os.path.isdir(final_dir)
                and list(prior.input_files) == list(input_files)):
            records.append(prior)
            continue
        tmp_dir = final_dir + ".tmp"
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)
        if os.path.isdir(final_dir):
            shutil.rmtree(final_dir)          # half-written, no lineage
        t0 = time.time()
        stats = run_shard(input_files, tmp_dir)
        os.rename(tmp_dir, final_dir)
        rec = LineageRecord(
            stage=stage,
            shard=shard_idx,
            input_files=input_files,
            row_count=int(stats.get("row_count", 0)),
            content_sha256_agg=str(stats.get("content_sha256_agg", "")),
            triple_count=int(stats.get("triple_count", 0)),
            wall_time=time.time() - t0,
            quarantined=int(stats.get("quarantined", 0)),
        )
        manifest.append(rec)
        records.append(rec)
    return records
