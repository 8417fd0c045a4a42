"""Native host kernels vs numpy references."""

import numpy as np
import pytest

from pvo_tpu import native
from pvo_tpu.utils import io as io_utils


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("cc unavailable; numpy fallback covers API")
    return True


def test_rgb2id_matches(lib_ok):
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (37, 53, 3), np.uint8)
    np.testing.assert_array_equal(native.rgb2id(rgb),
                                  io_utils.rgb2id(rgb))


def test_id2rgb_roundtrip(lib_ok):
    ids = np.array([[0, 1, 70000, 16777215]], np.uint32)
    np.testing.assert_array_equal(native.rgb2id(native.id2rgb(ids)),
                                  ids)


def test_pair_counts_matches_unique(lib_ok):
    rng = np.random.RandomState(1)
    a = rng.randint(0, 7, 10000).astype(np.int64) * 10000
    b = rng.randint(0, 5, 10000).astype(np.int64)
    k1, c1 = native.pair_counts(a, b)
    k2, c2 = np.unique(a * 2 ** 30 + b, return_counts=True)
    np.testing.assert_array_equal(k1, k2)
    np.testing.assert_array_equal(c1, c2)


def test_pair_counts_growth(lib_ok):
    # force the hash map to grow past its initial capacity
    a = np.arange(300000, dtype=np.int64)
    b = np.zeros(300000, np.int64)
    k, c = native.pair_counts(a, b)
    assert len(k) == 300000
    assert int(c.sum()) == 300000
