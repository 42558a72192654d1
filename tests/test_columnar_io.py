"""ORC / Arrow-IPC sink+source round trips (sources/io.py): lossless
schema round trip incl. timestamps, real column pruning at the read,
and the dirty-directory guard.  Oracle parity of the orc/ipc legs runs
through the lang_id composite in tests/test_queries_oracle.py."""

import pandas as pd
import pytest

from ontology_matcher_ray.sources import io as sio
from tests.util import normalize, to_pandas

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fmt", ["orc", "ipc"])
def test_columnar_roundtrip_documents_and_events(tmp_path, fmt):
    write = getattr(sio, f"write_{fmt}")
    read = getattr(sio, f"read_{fmt}")
    for table in ("documents", "events"):
        src = sio.read_parquet_clean(f"{SF}/{table}.parquet")
        want = normalize(to_pandas(src))
        out = str(tmp_path / f"{fmt}_{table}")
        write(src, out)
        got = normalize(to_pandas(read(out)))
        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=False, check_exact=True)


@pytest.mark.parametrize("fmt", ["orc", "ipc"])
def test_columnar_column_pruning_and_guards(tmp_path, fmt):
    write = getattr(sio, f"write_{fmt}")
    read = getattr(sio, f"read_{fmt}")
    src = sio.read_parquet_clean(f"{SF}/documents.parquet")
    out = str(tmp_path / fmt)
    write(src, out)

    pruned = to_pandas(read(out, columns=["doc_id", "lang"]))
    assert sorted(pruned.columns) == ["doc_id", "lang"]
    assert len(pruned) == len(to_pandas(src))

    with pytest.raises(ValueError, match="already contains"):
        write(src, out)
    with pytest.raises(FileNotFoundError):
        read(str(tmp_path / "nope"))
