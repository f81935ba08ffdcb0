"""Property-based tests (hypothesis) for the pure deterministic kernels
the driver oracles lean on: the vector-tile varint/zigzag codec, the
tile union-find, the mix64 split kernel, and the exact-int DP
simplification.  These complement the example-based suites with
machine-generated adversarial inputs — all driver-side pure functions,
no SparkSession needed (fast)."""

from __future__ import annotations

from collections import deque

from hypothesis import given, settings
from hypothesis import strategies as st

from engine.geo.polygonize import _label_tile
from engine.geo.vectile import (
    EXTENT, _unzigzag, _varint, _zigzag, decode_payload, encode_payload,
)

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(I64)
def test_zigzag_bijective(v):
    u = _zigzag(v)
    assert 0 <= u < 2**64
    assert _unzigzag(u) == v


@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_varint_order_preserving_length(u):
    # LEB128 length grows monotonically with magnitude
    assert len(_varint(u)) == max(1, -(-u.bit_length() // 7))


@settings(max_examples=50)
@given(st.lists(st.tuples(st.integers(0, 10**12), st.integers(0, EXTENT - 1),
                          st.integers(0, EXTENT - 1)), max_size=50))
def test_payload_roundtrip_any_features(feats):
    feats = list({f[0]: f for f in feats}.values())
    extent, got = decode_payload(encode_payload(feats))
    assert extent == EXTENT
    assert got == sorted(feats)


@settings(max_examples=50)
@given(st.sets(st.integers(0, 255), max_size=80))
def test_label_tile_matches_bfs_property(pix):
    grid = 16
    labels = _label_tile(sorted(pix), grid)
    assert set(labels) == set(pix)
    # oracle BFS over 4-adjacency
    cells = {(p % grid, p // grid) for p in pix}
    seen = set()
    for start in sorted(cells):
        if start in seen:
            continue
        comp, dq = set(), deque([start])
        seen.add(start)
        while dq:
            x, y = dq.popleft()
            comp.add((x, y))
            for nx, ny in ((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)):
                if (nx, ny) in cells and (nx, ny) not in seen:
                    seen.add((nx, ny))
                    dq.append((nx, ny))
        ids = {x + y * grid for x, y in comp}
        assert {labels[i] for i in ids} == {min(ids)}


@settings(max_examples=30)
@given(st.lists(st.tuples(st.floats(-179.9, 179.9, allow_nan=False),
                          st.floats(-84.9, 84.9, allow_nan=False)),
                min_size=4, max_size=60),
       st.floats(1e-6, 1.0, allow_nan=False))
def test_dp_simplify_invariants(verts, tol):
    """Exact-int DP: kept indices are sorted unique anchors-inclusive,
    and simplification is idempotent (running DP on the kept vertices
    keeps all of them)."""
    from engine.geo.simplify import Q, _dp_keep
    xs = [int(lon * Q) for lon, _ in verts]
    ys = [int(lat * Q) for _, lat in verts]
    tol_q6 = int(tol * Q)
    keep = _dp_keep(xs, ys, tol_q6)
    n = len(xs)
    assert keep == sorted(set(keep))
    assert 0 in keep and all(0 <= i < n for i in keep)
    # idempotence on the simplified ring
    xs2 = [xs[i] for i in keep]
    ys2 = [ys[i] for i in keep]
    keep2 = _dp_keep(xs2, ys2, tol_q6)
    assert keep2 == list(range(len(xs2)))


@given(st.integers(0, 2**63 - 1), st.integers(0, 2**31 - 1))
def test_mix64_split_kernel_deterministic_and_ranged(key, seed):
    import numpy as np

    from engine.ml.split import seed_offset
    from engine.text.dedup import _mix64

    def bucket(k, s):
        v = np.array([k], dtype=np.uint64) + np.uint64(seed_offset(s))
        return int(_mix64(v)[0])

    b1, b2 = bucket(key, seed), bucket(key, seed)
    assert b1 == b2
    assert 0 <= b1 < 2**64
