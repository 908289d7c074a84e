"""MXU-based small-codomain lookup/histogram/OR vs direct gather/scatter."""
import numpy as np
import jax.numpy as jnp

from ovo_tpu.ops.segment_mxu import histogram, segment_or, table_lookup


def test_table_lookup_matches_gather(rng):
    T, N = 97, 300_001  # non-multiple of the chunk size
    table = jnp.asarray(rng.integers(-1, 1 << 20, T), jnp.int32)
    idx = jnp.asarray(rng.integers(0, T, N), jnp.int32)
    got = table_lookup(idx, table)
    ref = np.asarray(table)[np.asarray(idx)]
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_table_lookup_2d_and_oob(rng):
    table = jnp.asarray(rng.standard_normal((5, 3)), jnp.float32)
    idx = jnp.asarray([0, 4, 5, 2], jnp.int32)  # 5 == out-of-range -> 0s
    got = np.asarray(table_lookup(idx, table))
    np.testing.assert_allclose(got[0], np.asarray(table)[0], rtol=1e-6)
    np.testing.assert_allclose(got[1], np.asarray(table)[4], rtol=1e-6)
    np.testing.assert_array_equal(got[2], np.zeros(3))


def test_histogram_matches_bincount(rng):
    B, N = 96, 816_000
    idx = jnp.asarray(rng.integers(0, B + 1, N), jnp.int32)  # B = dropped
    got = np.asarray(histogram(idx, B))
    ref = np.bincount(np.asarray(idx), minlength=B + 1)[:B]
    np.testing.assert_array_equal(got.astype(np.int64), ref)


def test_histogram_weighted(rng):
    idx = jnp.asarray([0, 1, 1, 3, 7], jnp.int32)
    w = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0], jnp.float32)
    got = np.asarray(histogram(idx, 4, weights=w))
    np.testing.assert_allclose(got, [1.0, 5.0, 0.0, 4.0], rtol=1e-6)


def test_segment_or_matches_scatter_max(rng):
    M, L, S = 96, 8160, 96
    rows = jnp.asarray(rng.random((M, L)) < 0.2)
    idx = jnp.asarray(rng.integers(0, S + 1, M), jnp.int32)  # S = dropped
    got = np.asarray(segment_or(idx, rows, S))
    ref = np.zeros((S, L), bool)
    for i, t in enumerate(np.asarray(idx)):
        if t < S:
            ref[t] |= np.asarray(rows)[i]
    np.testing.assert_array_equal(got, ref)


def test_table_lookup_int_matches_gather(rng):
    from ovo_tpu.ops.segment_mxu import table_lookup_int
    T, N = 1026, 300_001  # instance-id-scale table, non-chunk-multiple N
    table = jnp.asarray(rng.integers(-1, 32768, T), jnp.int32)
    idx = jnp.asarray(rng.integers(0, T, N), jnp.int32)
    got = np.asarray(table_lookup_int(idx, table))
    ref = np.asarray(table)[np.asarray(idx)]
    np.testing.assert_array_equal(got, ref)


def test_table_lookup_int_2d_oob_and_extremes(rng):
    from ovo_tpu.ops.segment_mxu import table_lookup_int
    table = jnp.asarray([[-32767, 32767, -1], [0, 1, 256],
                         [255, -256, 1024]], jnp.int32)
    idx = jnp.asarray([2, 0, 3, 1], jnp.int32)  # 3 == out-of-range -> 0s
    got = np.asarray(table_lookup_int(idx, table))
    np.testing.assert_array_equal(got[0], np.asarray(table)[2])
    np.testing.assert_array_equal(got[1], np.asarray(table)[0])
    np.testing.assert_array_equal(got[2], np.zeros(3, np.int32))
    np.testing.assert_array_equal(got[3], np.asarray(table)[1])
