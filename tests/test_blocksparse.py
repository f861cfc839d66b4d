"""Block-sparse matvec tests, mirroring the style of the reference's only
unit-tested component (src/physics/sparse_matrix.rs:60-119: single-block,
multi-block with overlap, and transposed multiply, each against a
hand-computed dense expectation)."""

import numpy as np
import jax.numpy as jnp

from physics_tpu.maths.blocksparse import (
    BlockSparseBuilder,
    multiply_vector,
    to_dense,
    tr_multiply_vector,
)


def _dense_oracle(n_rows, n_cols, blocks):
    a = np.zeros((n_rows, n_cols), np.float32)
    for (r, c, d) in blocks:
        d = np.asarray(d, np.float32)
        a[r : r + d.shape[0], c : c + d.shape[1]] += d
    return a


def _build(n_rows, n_cols, blocks):
    bshape = np.asarray(blocks[0][2]).shape
    bld = BlockSparseBuilder(n_rows, n_cols, bshape)
    for (r, c, d) in blocks:
        bld.add_block(r, c, d)
    return bld.finalize()


def test_multiply_vector_single_block():
    blocks = [(1, 2, [[2.0, -1.0], [0.5, 3.0]])]
    m = _build(5, 5, blocks)
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0], np.float32)
    got = np.asarray(multiply_vector(m, jnp.asarray(x)))
    want = _dense_oracle(5, 5, blocks) @ x
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_multiply_vector_overlapping_blocks_accumulate():
    # two blocks sharing rows/cols — accumulation semantics of add_block
    blocks = [
        (0, 0, [[1.0, 2.0], [3.0, 4.0]]),
        (1, 1, [[10.0, -2.0], [0.0, 5.0]]),
        (3, 2, [[-1.0, 1.0], [2.0, 2.0]]),
    ]
    m = _build(5, 5, blocks)
    x = np.array([0.5, -1.0, 2.0, 1.0, 3.0], np.float32)
    got = np.asarray(multiply_vector(m, jnp.asarray(x)))
    want = _dense_oracle(5, 5, blocks) @ x
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_tr_multiply_vector_multiple_blocks():
    blocks = [
        (0, 1, [[1.0, 0.0, 2.0], [0.0, -1.0, 1.0]]),
        (2, 0, [[3.0, 1.0, 0.0], [0.5, 0.5, 0.5]]),
        (2, 1, [[1.0, 1.0, 1.0], [2.0, 0.0, -2.0]]),
    ]
    m = _build(4, 4, blocks)
    x = np.array([1.0, 2.0, -1.0, 0.5], np.float32)
    got = np.asarray(tr_multiply_vector(m, jnp.asarray(x)))
    want = _dense_oracle(4, 4, blocks).T @ x
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_to_dense_matches_oracle_and_rectangular():
    blocks = [
        (0, 0, [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]),
        (2, 3, [[7.0, 8.0, 9.0], [1.0, 1.0, 1.0]]),
        (2, 3, [[1.0, 0.0, 0.0], [0.0, 0.0, -1.0]]),  # overlap accumulates
    ]
    m = _build(4, 6, blocks)
    np.testing.assert_allclose(
        np.asarray(to_dense(m)), _dense_oracle(4, 6, blocks), rtol=1e-6
    )
    x = np.arange(6, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(multiply_vector(m, jnp.asarray(x))),
        _dense_oracle(4, 6, blocks) @ x,
        rtol=1e-6,
    )
    y = np.arange(4, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(tr_multiply_vector(m, jnp.asarray(y))),
        _dense_oracle(4, 6, blocks).T @ y,
        rtol=1e-6,
    )
