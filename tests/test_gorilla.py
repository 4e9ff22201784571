"""Codec round-trip invariants (FIXTURES.md §3.1): bitwise exact."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ts_pymfe_ray.functions import gorilla as g


@given(n=st.integers(0, 300), seed=st.integers(0, 1000), smooth=st.booleans())
@settings(max_examples=150, deadline=None)
def test_float_xor_roundtrip(n, seed, smooth):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=n)
    if smooth and n:
        v = np.cumsum(v)
    dec = g.decode_floats_xor(g.encode_floats_xor(v))
    assert dec.size == n
    assert np.array_equal(v.view(np.uint64), dec.view(np.uint64))


def test_float_xor_special_values():
    v = np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 1e-300, 1e300])
    dec = g.decode_floats_xor(g.encode_floats_xor(v))
    assert np.array_equal(v.view(np.uint64), dec.view(np.uint64))


@given(
    n=st.integers(0, 300),
    order=st.integers(1, 3),
    seed=st.integers(0, 1000),
)
@settings(max_examples=150, deadline=None)
def test_int_dod_roundtrip(n, order, seed):
    rng = np.random.default_rng(seed)
    x = rng.integers(-(2**40), 2**40, size=n)
    assert np.array_equal(g.decode_ints_dod(g.encode_ints_dod(x, order=order)), x)


def test_token_roundtrip_with_sentinels():
    rng = np.random.default_rng(3)
    tok = rng.integers(0, 65536, size=5000).astype(np.int64)
    tok[100:120] = -1
    enc = g.encode_ints_dod(tok, order=1)
    assert np.array_equal(g.decode_ints_dod(enc), tok)
    assert len(enc) < tok.size * 4  # beats raw int32


def test_compression_on_regular_timestamps():
    ts = np.arange(0, 100000, 5)
    enc = g.encode_ints_dod(ts, order=2)
    assert len(enc) < ts.size * 1.2  # ~1 byte/point on constant stride
    assert np.array_equal(g.decode_ints_dod(enc), ts)


def test_batched_encoders_bitwise_equal_per_row():
    """encode_*_many must produce byte-identical per-row streams to the
    per-row encoders for every padding/width regime (empty rows, single
    values, constants, wide varints) — the tier format and the
    seq_tier_diagnostics oracle ride on this."""
    import numpy as np

    from ts_pymfe_ray.functions import gorilla as g

    rng = np.random.default_rng(5)
    frows = [rng.normal(size=k) for k in (0, 1, 2, 3, 27, 250)] + [
        np.full(9, -2.5), np.zeros(4)]
    ff = np.concatenate(frows)
    fo = np.concatenate([[0], np.cumsum([len(r) for r in frows])])
    fd, foo = g.encode_floats_xor_many(ff, fo)
    for i, r in enumerate(frows):
        got = bytes(fd[foo[i]:foo[i + 1]])
        assert got == g.encode_floats_xor(r), ("float", i)
        assert np.array_equal(g.decode_floats_xor(got), r)

    irows = [rng.integers(-5, 70000, k).astype(np.int64)
             for k in (0, 1, 2, 3, 500)] + [
        np.arange(40) * 7 + 3, rng.integers(0, 2**60, 30).astype(np.int64)]
    iflat = np.concatenate(irows)
    io = np.concatenate([[0], np.cumsum([len(r) for r in irows])])
    for order in (1, 2):
        idd, ioo = g.encode_ints_dod_many(iflat, io, order=order)
        for i, r in enumerate(irows):
            got = bytes(idd[ioo[i]:ioo[i + 1]])
            assert got == g.encode_ints_dod(r, order=order), (order, i)
            assert np.array_equal(g.decode_ints_dod(got), r)
