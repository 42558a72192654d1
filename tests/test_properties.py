"""Property-based tests (hypothesis) for the scalar kernels and routing
invariants — the algebraic properties the distributed composition relies
on (associativity/commutativity of combiners, idempotence of dedup)."""

import string

from hypothesis import given, settings, strategies as st

from ontology_matcher_ray.functions.listops import concat, join_lst, merge_unique
from ontology_matcher_ray.schemas import DISEASE_SPEC, Strategy
from ontology_matcher_ray.stages.resolve import route_id

token = st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=6)
cell = st.lists(token, max_size=5).map(lambda xs: "|".join(xs))
cells = st.lists(cell, max_size=6)


@settings(max_examples=200, deadline=None)
@given(cells, cells)
def test_merge_unique_associative_commutative(a, b):
    # partial/final composition in the canonical merge requires this
    assert merge_unique([merge_unique(a), merge_unique(b)]) == merge_unique(a + b)
    assert merge_unique(a + b) == merge_unique(b + a)


@settings(max_examples=200, deadline=None)
@given(cells)
def test_merge_unique_idempotent(a):
    once = merge_unique(a)
    assert merge_unique([once]) == once


@settings(max_examples=200, deadline=None)
@given(cell)
def test_join_lst_idempotent_and_sorted(c):
    out = join_lst(c)
    assert join_lst(out) == out
    parts = [p for p in out.split("|") if p]
    assert parts == sorted(set(parts))


@settings(max_examples=200, deadline=None)
@given(st.lists(token, max_size=4), st.lists(token, max_size=4))
def test_concat_is_set_union(x, y):
    assert set(concat(x, y)) == set(x) | set(y)
    assert concat(x, y) == concat(y, x)


db_ids = st.dictionaries(
    st.sampled_from(DISEASE_SPEC.choices),
    st.lists(token.map(lambda t: "MONDO:" + t), min_size=0, max_size=3),
    max_size=4,
)


@settings(max_examples=300, deadline=None)
@given(st.sampled_from(["MESH:D1", "MONDO:1", "UMLS:C1", "HP:1"]), db_ids)
def test_routing_invariants(raw_id, entry):
    for strategy in (Strategy.MIXTURE, Strategy.UNIQUE):
        r = route_id(raw_id, entry, DISEASE_SPEC, strategy)
        # total: every id gets exactly one status
        assert r.status in ("ok", "ok_raw", "failed", "invalid")
        # output id is canonical (default db) XOR the raw id
        if r.status == "ok":
            assert r.out_id.startswith(DISEASE_SPEC.default + ":") or r.out_id == raw_id
        if r.status in ("ok_raw", "failed"):
            assert r.out_id == raw_id
        # (no assertion that out_id is absent from aliases: the reference's
        # get_alias_ids collects non-default-db attrs by KEY, so a
        # dictionary that stores the canonical id under another database's
        # key surfaces it as an alias — data inconsistency passes through)
        # raw id with non-default prefix always appears in aliases when converted
        prefix = raw_id.split(":", 1)[0]
        if r.status in ("ok", "ok_raw") and prefix != DISEASE_SPEC.default:
            assert raw_id in r.alias_ids


@settings(max_examples=100, deadline=None)
@given(db_ids)
def test_unique_stricter_than_mixture(entry):
    m = route_id("MESH:D1", entry, DISEASE_SPEC, Strategy.MIXTURE)
    u = route_id("MESH:D1", entry, DISEASE_SPEC, Strategy.UNIQUE)
    # UNIQUE can only fail where MIXTURE succeeded, never the reverse
    if m.status == "failed":
        assert u.status == "failed"


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
               max_size=40))
def test_md5half_matches_duckdb_md5_number_lower(s):
    """Foundation of every dedup-family SQL oracle: the engine's content
    hash must equal DuckDB's md5_number_lower for arbitrary strings."""
    import duckdb

    from ontology_matcher_ray.functions.hashing import md5half

    got = duckdb.execute("SELECT md5_number_lower(?)", [s]).fetchone()[0]
    assert md5half(s) == got


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(["spark", "hash", "joins", "SPARK", "Hash",
                                 "sparks", "hashs", "other", "Sparkle"]),
                min_size=0, max_size=6))
def test_fuzzy_normalization_exact_preference(tokens):
    """The fuzzy tier never shadows an exact hit, and normalization is
    the documented lowercase-fold + single-plural-strip, nothing more."""
    from ontology_matcher_ray.corpus import normalize_term

    index = {"spark", "hash", "joins"}
    for t in tokens:
        key = t if t in index else normalize_term(t, index)
        if t in index:
            assert key == t
        elif key is not None:
            low = t.lower()
            assert key == low or (low.endswith("s") and key == low[:-1])
            assert key in index


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("ME SH:DOID9-_.x1\n#aZ+*")), max_size=60))
def test_curie_scan_equals_regex(s):
    """The colon-anchored fast CURIE scan must equal the alternation-regex
    semantics on arbitrary text (word boundaries, prefix charsets, id
    charsets, multi-colon runs)."""
    from ontology_matcher_ray.stages.extract import CurieExtractor

    ex = CurieExtractor(DISEASE_SPEC)
    want = {m.group(0) for m in ex.rx.finditer(s)}
    assert ex.scan(s) == want, s


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(min_value=-10, max_value=10,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=8))
def test_quantize_sign_split_matches_python(vec):
    # docs_train.embedding_quantize relies on the sign-split identity:
    # numpy floor-division on the non-negative domain == DuckDB // —
    # check the numpy kernel against plain-Python integer arithmetic
    import numpy as np

    vm = np.floor(np.asarray(vec, dtype=np.float64) * 1_000_000).astype(np.int64)
    scale = max(int(np.abs(vm).max()), 1)
    q_np = np.sign(vm) * (np.abs(vm) * 127 // scale)
    for x, q in zip(vm.tolist(), q_np.tolist()):
        want = (abs(x) * 127) // scale
        want = -want if x < 0 else want
        assert q == want
        assert -127 <= q <= 127


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=500),
                min_size=1, max_size=50),
       st.integers(min_value=1, max_value=64))
def test_pack_chunk_algebra(token_counts, budget):
    # doc_pack invariants: offsets are an exclusive prefix sum, chunk
    # spans are consistent, and the per-partition + offset composition
    # used by the distributed scan equals the serial computation
    import numpy as np

    n = np.asarray(token_counts, dtype=np.int64)
    start = np.cumsum(n) - n
    chunk = start // budget
    n_chunks = (start + n - 1) // budget - chunk + 1
    assert start[0] == 0
    assert (n_chunks >= 1).all()
    # split at an arbitrary point and recompose with an offset — the
    # two-phase scan identity
    for cut in {0, len(n) // 2, len(n) - 1}:
        off = int(n[:cut].sum())
        right = np.cumsum(n[cut:]) - n[cut:] + off
        assert (right == start[cut:]).all()


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.printable, max_size=12))
def test_sketch_rho_bits(tok):
    # rho = trailing-zeros + 1 on the 27-bit remainder; bounded by cap
    from ontology_matcher_ray.functions.hashing import md5half
    from ontology_matcher_ray.pipelines.docs_train import (
        MERSENNE_P, SKETCH_REGISTERS, SKETCH_RHO_CAP,
    )

    hv = md5half(tok) % MERSENNE_P
    rest = hv // SKETCH_REGISTERS
    rho = SKETCH_RHO_CAP if rest == 0 else (rest & -rest).bit_length()
    assert 1 <= rho <= SKETCH_RHO_CAP
    if rest:
        assert rest % (1 << (rho - 1)) == 0      # rho-1 trailing zero bits
        assert (rest >> (rho - 1)) & 1 == 1      # then a one bit


# --- N-Triples escape/parse round trip (pure kernels, no Ray) ---

_nt_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
)
_nt_curie = st.from_regex(r"[A-Za-z][A-Za-z0-9_.]{0,8}:[A-Za-z0-9_.:-]{1,12}",
                          fullmatch=True)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(_nt_curie, _nt_curie, st.one_of(_nt_text, _nt_curie)),
                min_size=1, max_size=8))
def test_ntriples_roundtrip_property(rows):
    import pandas as pd

    from ontology_matcher_ray.sources.io import (
        nt_lines_to_triples,
        triples_to_nt_lines,
    )

    t = pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    lines = triples_to_nt_lines(t)
    back = nt_lines_to_triples(pd.DataFrame({"text": lines["line"]}))
    pd.testing.assert_frame_equal(
        t.reset_index(drop=True), back.reset_index(drop=True), check_dtype=False
    )


# --- hash_join partition kernel vs pandas merge (the REAL kernel) ---

@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(st.integers(-5, 5), st.integers(-1000, 1000)),
             min_size=0, max_size=30),
    st.lists(st.tuples(st.integers(-5, 5), st.integers(-1000, 1000)),
             min_size=0, max_size=30),
)
def test_hash_join_kernel_matches_pandas_merge(lrows, rrows):
    """exchange.join_partition_kernel (all rows in ONE partition) must
    equal a pandas merge for inner/left/semi/anti on any key multiset."""
    import numpy as np
    import pandas as pd

    from ontology_matcher_ray.stages.exchange import join_partition_kernel

    l = pd.DataFrame(lrows, columns=["k", "v"]).astype("int64")
    r = pd.DataFrame(rrows, columns=["k", "w"]).astype("int64")

    def norm(df):
        return (df.sort_values(list(df.columns), kind="mergesort")
                  .reset_index(drop=True))

    # one partition holding both padded sides, exactly as hash_join's
    # _pad + union produce it (typed zero sentinels, _side tag)
    g = pd.concat(
        [l.assign(w=np.int64(0), _side=np.int8(0)),
         r.assign(v=np.int64(0), _side=np.int8(1))],
        ignore_index=True,
    )[["k", "v", "w", "_side"]]

    keys = r["k"].unique()
    wants = {
        "inner": l.merge(r, on="k", how="inner"),
        "left": l.merge(r, on="k", how="left"),
        "outer": l.merge(r, on="k", how="outer"),
        "semi": l[l["k"].isin(keys)],
        "anti": l[~l["k"].isin(keys)],
    }
    for how, want in wants.items():
        got = join_partition_kernel("k", ["k", "v"], ["w"], how)(g)
        pd.testing.assert_frame_equal(norm(got), norm(want), check_dtype=False)


# ---------------------------------------------------------------------------
# JPEG codec: encode->decode over arbitrary uint8 images
# ---------------------------------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=41),
    st.integers(min_value=1, max_value=41),
    st.integers(min_value=0, max_value=2 ** 31 - 1),
    st.sampled_from(["444", "420"]),
)
def test_jpeg_q100_roundtrip_error_bound(h, w, seed, subsampling):
    """At quality 100 every quantizer is 1, so the only losses are DCT
    coefficient rounding and the color-transform round trip —
    empirically <= 2 even on uniform noise; assert <= 4.  The 4:2:0 case
    uses GRAY noise (r=g=b): chroma is then exactly constant 128, so the
    2x2 averaging is lossless and the same bound applies (colored noise
    through 4:2:0 is lossy by design — chroma averaging + RGB clipping —
    and admits no tight invariant)."""
    import numpy as np

    from ontology_matcher_ray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(seed)
    if subsampling == "420":
        gray = rng.randint(0, 256, (h, w, 1), dtype=np.uint8)
        img = np.repeat(gray, 3, axis=2)
    else:
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=100, subsampling=subsampling))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int)).max()
    assert err <= 4, err


@given(st.integers(2, 8).flatmap(
    lambda mcs: st.tuples(
        st.just(mcs),
        st.lists(st.integers(0, (1 << mcs) - 1), max_size=3000),
    )))
@settings(max_examples=60, deadline=None)
def test_gif_lzw_roundtrip_property(mcs_and_idx):
    """GIF Appendix-F LZW: decode(encode(x)) == x for arbitrary index
    streams at every min-code-size — covers KwKwK, width growth and
    table resets wherever hypothesis lands on them."""
    import numpy as np

    from ontology_matcher_ray.functions.codecs import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    mcs, idx = mcs_and_idx
    enc = _gif_lzw_encode(np.asarray(idx, dtype=np.int64), mcs)
    got = list(_gif_lzw_decode(enc, mcs))
    assert got == idx


@given(st.integers(2, 8).flatmap(
    lambda mcs: st.tuples(
        st.just(mcs),
        st.lists(st.integers(0, (1 << mcs) - 1), max_size=400),
    )))
@settings(max_examples=40, deadline=None)
def test_gif_lzw_oracle_encoder_byte_identical(mcs_and_idx):
    """The oracle's independently-written LZW (tuple-dict, two-phase
    pack) must emit byte-identical streams to the engine's numpy/int-key
    encoder for arbitrary inputs — the property the media payload-sha
    oracle rests on."""
    import numpy as np

    from ontology_matcher_ray.functions.codecs import _gif_lzw_encode
    from ontology_matcher_ray.oracle import _oracle_gif_lzw

    mcs, idx = mcs_and_idx
    assert _gif_lzw_encode(np.asarray(idx, dtype=np.int64), mcs) \
        == _oracle_gif_lzw(idx, mcs)
