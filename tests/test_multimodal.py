"""Multimodal plumbing: binary columns through an actor-pool featurizer."""

import numpy as np
import pytest

import ray.data as rd

from ontology_matcher_ray.stages.multimodal import (
    MediaFeaturizer,
    featurize_media,
    synthesize_media_table,
)


def test_binary_columns_roundtrip_through_actor_pool():
    df = synthesize_media_table(64, payload_bytes=1024)
    ds = rd.from_pandas(df)
    out = featurize_media(ds, dim=8, concurrency=(1, 2), batch_size=16).to_pandas()
    assert len(out) == 64
    assert set(out.columns) == {"media_id", "kind", "feat", "payload_sha256",
                                "width", "height", "duration_ms"}
    assert all(len(f) == 8 for f in out["feat"])
    # deterministic: same payload -> same features on any worker
    out2 = featurize_media(rd.from_pandas(df), dim=8, concurrency=(1, 2),
                           batch_size=32).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert a["payload_sha256"].tolist() == b["payload_sha256"].tolist()
    assert all(np.allclose(x, y) for x, y in zip(a["feat"], b["feat"]))


def test_decode_stub_raises_where_real_codec_goes():
    f = MediaFeaturizer(decode_stub="raise")
    with pytest.raises(NotImplementedError, match="codec"):
        f._decode(b"\x00" * 16)
