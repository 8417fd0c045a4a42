"""MXU-friendly row gather / segment reduction.

XLA lowers small-index gathers and scatters over big rows — e.g.
``fmaps[ii]`` with 32 edges of (30, 101, 128) features, or GraphAgg's
``segment_sum`` — to sequential dynamic-slice loops on TPU (~2 ms per
gather at tracking shapes, scripts/trace_track.py). With tens of rows
both are better spent on the MXU as one-hot matmuls (~0.05 ms): the
one-hot operand has exactly one 1.0 per row, so products and f32
accumulation are exact for any input dtype the MXU carries natively.

The reference leans on torch_scatter + CUDA gathers for the same ops
(droid_net.py:20, geom/ba.py:8); this is the TPU-shaped replacement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _matmul_dtype(dt):
    return dt if dt in (jnp.bfloat16, jnp.float32) else jnp.float32


def onehot(idx, n, dtype=jnp.float32):
    """(N, n) one-hot rows; out-of-range ids give all-zero rows."""
    ar = jnp.arange(n, dtype=jnp.int32)
    return (idx.astype(jnp.int32)[:, None] == ar[None, :]).astype(dtype)


def gather_rows(buf, idx):
    """``buf[idx]`` over axis 0 as a one-hot MXU matmul.

    buf: (F, ...); idx: (N,) int. Returns (N, ...) in buf's dtype.
    Out-of-range ids return ZERO rows (XLA's gather clamps instead);
    callers mask invalid rows anyway. Integer buffers must hold values
    exactly representable in f32 (|v| < 2^24).
    """
    F = buf.shape[0]
    flat = buf.reshape(F, -1)
    mdt = _matmul_dtype(flat.dtype)
    oh = onehot(idx, F, mdt)
    out = jax.lax.dot_general(
        oh, flat.astype(mdt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if jnp.issubdtype(buf.dtype, jnp.integer):
        out = jnp.rint(out)
    return out.astype(buf.dtype).reshape((idx.shape[0],) +
                                         buf.shape[1:])


def segment_sum_mm(x, seg_ids, num_segments):
    """``jax.ops.segment_sum`` over axis 0 as a one-hot MXU matmul.

    x: (E, ...) bf16/f32; seg_ids: (E,) int in [0, num_segments)
    (out-of-range ids are dropped). Accumulates in f32, returns f32.
    """
    E = x.shape[0]
    flat = x.reshape(E, -1)
    mdt = _matmul_dtype(flat.dtype)
    oh = onehot(seg_ids, num_segments, mdt).T        # (S, E)
    out = jax.lax.dot_general(
        oh, flat.astype(mdt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.reshape((num_segments,) + x.shape[1:])
