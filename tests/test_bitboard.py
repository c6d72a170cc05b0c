"""Bitboard ops vs a dense numpy reference."""
import jax.numpy as jnp
import numpy as np
import pytest

from alphatpu import bitboard as bb


def dense_from_words(spec, words):
    words = np.asarray(words, dtype=np.uint64)
    out = np.zeros(spec.nbits, dtype=np.int64)
    for i in range(spec.nbits):
        out[i] = (words[i // 32] >> np.uint64(i % 32)) & np.uint64(1)
    return out.reshape(spec.cols, spec.rows).T  # [rows, cols], column-major bits


def words_from_dense(spec, grid):
    grid = np.asarray(grid)
    words = np.zeros(spec.nwords, dtype=np.uint64)
    for r in range(spec.rows):
        for c in range(spec.cols):
            if grid[r, c]:
                i = r + spec.rows * c
                words[i // 32] |= np.uint64(1) << np.uint64(i % 32)
    return jnp.asarray(words.astype(np.uint32))


SPECS = [bb.BoardSpec(3, 3), bb.BoardSpec(6, 7), bb.BoardSpec(8, 8),
         bb.BoardSpec(10, 10), bb.BoardSpec(14, 14)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: f"{s.rows}x{s.cols}")
def test_directional_shifts(spec, rng):
    grid = rng.integers(0, 2, size=(spec.rows, spec.cols))
    b = words_from_dense(spec, grid)

    # right: column +1
    want = np.zeros_like(grid)
    want[:, 1:] = grid[:, :-1]
    np.testing.assert_array_equal(dense_from_words(spec, bb.right(spec, b)), want)

    # left: column -1
    want = np.zeros_like(grid)
    want[:, :-1] = grid[:, 1:]
    np.testing.assert_array_equal(dense_from_words(spec, bb.left(spec, b)), want)

    # down: row +1 (toward higher row index), no column wrap
    want = np.zeros_like(grid)
    want[1:, :] = grid[:-1, :]
    np.testing.assert_array_equal(dense_from_words(spec, bb.down(spec, b)), want)

    # up: row -1
    want = np.zeros_like(grid)
    want[:-1, :] = grid[1:, :]
    np.testing.assert_array_equal(dense_from_words(spec, bb.up(spec, b)), want)


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: f"{s.rows}x{s.cols}")
def test_popcount_invert_planes(spec, rng):
    grid = rng.integers(0, 2, size=(spec.rows, spec.cols))
    b = words_from_dense(spec, grid)
    assert int(bb.popcount(spec, b)) == int(grid.sum())
    inv = bb.invert(spec, b)
    np.testing.assert_array_equal(dense_from_words(spec, inv), 1 - grid)
    planes = np.asarray(bb.to_planes(spec, b, dtype=jnp.int32))
    np.testing.assert_array_equal(
        planes.reshape(spec.cols, spec.rows).T, grid
    )
    rt = bb.from_planes(spec, jnp.asarray(planes))
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(b))


def test_get_set_bit(rng):
    spec = bb.BoardSpec(9, 9)
    b = bb.empty(spec)
    idx = rng.choice(spec.nbits, size=20, replace=False)
    for i in idx:
        b = bb.set_bit(spec, b, jnp.int32(i))
    for i in range(spec.nbits):
        assert bool(bb.get_bit(spec, b, jnp.int32(i))) == (i in set(idx.tolist()))
    assert int(bb.popcount(spec, b)) == 20


def test_shift_matches_bigint(rng):
    spec = bb.BoardSpec(14, 14)  # 196 bits, 7 words
    raw = int.from_bytes(rng.bytes(25), "little") & ((1 << spec.nbits) - 1)
    words = jnp.asarray(
        np.array([(raw >> (32 * w)) & 0xFFFFFFFF for w in range(spec.nwords)],
                 dtype=np.uint32)
    )
    for n in [1, 5, 14, 31, 32, 33, 64, 70, 150]:
        got_up = bb.shift_up_bits(spec, words, n)
        want = (raw << n) & ((1 << spec.nbits) - 1)
        got_int = sum(int(got_up[w]) << (32 * w) for w in range(spec.nwords))
        assert got_int == want, f"shl {n}"
        got_dn = bb.shift_down_bits(spec, words, n)
        want = raw >> n
        got_int = sum(int(got_dn[w]) << (32 * w) for w in range(spec.nwords))
        assert got_int == want, f"shr {n}"
