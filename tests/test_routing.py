"""Clos routing network tests (sparse/routing.py).

The router is pure numpy (pack-time, host-side); these tests validate that
the 3- and 5-stage gather decompositions realize arbitrary permutations
through the exact layout contract the device pipeline mirrors.
"""

import numpy as np
import pytest

from linops_tpu.sparse.routing import (
    RADIX,
    clos_apply,
    clos_route,
    clos_stage_shapes,
)


@pytest.mark.parametrize(
    "n",
    [
        RADIX,                # single crossbar
        4 * RADIX,            # 3-stage, m = 4
        RADIX * RADIX,        # 3-stage, m = 128 (largest 3-stage)
        2 * RADIX * RADIX,    # 5-stage, B = 2
        8 * RADIX * RADIX,    # 5-stage, B = 8
    ],
)
def test_clos_random_permutation(n):
    rng = np.random.default_rng(n)
    dest = rng.permutation(n)
    idx = clos_route(dest)
    v = np.arange(n, dtype=np.float64)
    out = clos_apply(v, idx)
    # element with value i started at position i and must land at dest[i]
    np.testing.assert_array_equal(out[dest], v)


def test_clos_identity_and_reverse():
    n = 2 * RADIX * RADIX
    for dest in (np.arange(n), np.arange(n)[::-1].copy()):
        out = clos_apply(np.arange(n, dtype=np.float64), clos_route(dest))
        np.testing.assert_array_equal(out[dest], np.arange(n))


def test_clos_stage_count_and_shapes():
    m, b = clos_stage_shapes(64 * RADIX)
    assert (m, b) == (64, 0)
    assert len(clos_route(np.random.default_rng(0).permutation(64 * RADIX))) == 3
    m, b = clos_stage_shapes(4 * RADIX * RADIX)
    assert (m, b) == (4 * RADIX, 4)
    assert len(clos_route(np.random.default_rng(1).permutation(4 * RADIX * RADIX))) == 5


def test_clos_rejects_bad_sizes():
    with pytest.raises(ValueError):
        clos_stage_shapes(RADIX + 1)
    with pytest.raises(ValueError):
        clos_stage_shapes((RADIX + 1) * RADIX)  # m between 128 and a 128-multiple
    with pytest.raises(ValueError):
        clos_stage_shapes(RADIX ** 3 + RADIX ** 2)  # above 128^3
    with pytest.raises(ValueError):
        clos_route(np.zeros(RADIX, np.int64))  # not a permutation


def test_native_router_matches_python():
    """The C++ router must emit the exact same stage arrays as the numpy
    reference implementation (same Euler-walk order by construction)."""
    from linops_tpu.native import clos_route_native

    for n in (RADIX, 4 * RADIX, RADIX * RADIX, 3 * RADIX * RADIX):
        dest = np.random.default_rng(n).permutation(n)
        got = clos_route_native(dest)
        if got is None:
            import pytest as _pytest

            _pytest.skip("native router unavailable (no g++)")
        want = clos_route(dest)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        out = clos_apply(np.arange(n, dtype=float), got)
        np.testing.assert_array_equal(out[dest], np.arange(n))
