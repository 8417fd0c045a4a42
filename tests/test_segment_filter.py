"""Unit tests for the on-device dynamic-segment vote filter."""

import jax.numpy as jnp
import numpy as np

from pvo_tpu.vo.factor_graph import segment_vote_filter

S_MAX = 8


def test_majority_dynamic_segment_killed():
    E, h, w = 1, 4, 8
    segm = np.zeros((E, h, w), np.int32)
    segm[0, :, :4] = 1  # segment 1 covers the left half

    bin_mask = np.ones((E, h, w, 2), bool)
    # 90% of segment 1's pixels dynamic (both channels 0)
    bin_mask[0, :, :4] = False
    bin_mask[0, 0, 0] = True  # a couple of static pixels
    bin_mask[0, 0, 1] = True

    out = np.asarray(segment_vote_filter(
        jnp.asarray(bin_mask), jnp.asarray(segm),
        jnp.ones(E, bool), S_MAX, 0.8))
    # whole segment 1 forced dynamic — including its static pixels
    assert not out[0, :, :4].any()
    # background (segment 0) untouched
    assert out[0, :, 4:].all()


def test_minority_dynamic_segment_survives():
    E, h, w = 1, 4, 8
    segm = np.ones((E, h, w), np.int32)  # all one segment
    bin_mask = np.ones((E, h, w, 2), bool)
    bin_mask[0, 0, :2] = False  # only 2/32 pixels dynamic

    out = np.asarray(segment_vote_filter(
        jnp.asarray(bin_mask), jnp.asarray(segm),
        jnp.ones(E, bool), S_MAX, 0.8))
    np.testing.assert_array_equal(out, bin_mask)


def test_segment_zero_never_killed():
    E, h, w = 1, 2, 4
    segm = np.zeros((E, h, w), np.int32)
    bin_mask = np.zeros((E, h, w, 2), bool)  # everything dynamic
    out = np.asarray(segment_vote_filter(
        jnp.asarray(bin_mask), jnp.asarray(segm),
        jnp.ones(E, bool), S_MAX, 0.8))
    np.testing.assert_array_equal(out, bin_mask)  # unchanged (no kill)


def test_per_edge_independence():
    E, h, w = 2, 2, 4
    segm = np.ones((E, h, w), np.int32)
    bin_mask = np.ones((E, h, w, 2), bool)
    bin_mask[0] = False  # edge 0's segment fully dynamic
    out = np.asarray(segment_vote_filter(
        jnp.asarray(bin_mask), jnp.asarray(segm),
        jnp.ones(E, bool), S_MAX, 0.8))
    assert not out[0].any()
    assert out[1].all()  # edge 1 unaffected
