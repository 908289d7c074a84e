"""Small-codomain gather/scatter replacements that run on the MXU.

TPU gathers and scatters execute row-at-a-time; profiling the association
program (SURVEY.md section 3.1 hot loop 4) showed each 2M-element lookup
into a tiny (~100-row) table costing 16+ ms, and 816k-element histograms /
row-wise OR scatters costing 6-18 ms -- while the equivalent chunked
one-hot matmuls run in ~1-3 ms on the MXU (counts accumulate exactly in
f32 for values < 2^24, and 0/1 one-hots are exact in bf16).

These helpers express index-space operations whose index codomain is SMALL
(mask slots, instance ids) as dense matmuls:

  table_lookup    out[i] = table[idx[i]]          (gather replacement)
  histogram       out[t] = #{i : idx[i] == t}     (scatter-add replacement)
  segment_or      out[t] = OR_i {rows[i] : idx[i] == t}  (scatter-max repl.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_CHUNK = 2 ** 18


def _chunked(idx: Array, n_table: int):
    """Reshape (N,) indices to scan chunks, mapping out-of-range to
    n_table - 1 is NOT done here -- callers route invalid entries to a
    dedicated slot first. Pads with n_table (one-hot of which is all-zero
    when num_classes == n_table)."""
    N = idx.shape[0]
    ch = min(N, _CHUNK)
    pad = (-N) % ch
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), n_table, jnp.int32)])
    return idx.reshape(-1, ch), pad


def table_lookup(idx: Array, table: Array) -> Array:
    """out[i] = table[idx[i]] for idx in [0, T); out-of-range rows return 0.
    table: (T,) or (T, C) f32/i32. Exact for integer tables < 2^24."""
    squeeze = table.ndim == 1
    tbl = table[:, None] if squeeze else table
    T = tbl.shape[0]
    out_dtype = tbl.dtype
    tbl_f = tbl.astype(jnp.float32)
    chunks, pad = _chunked(idx.astype(jnp.int32), T)

    # precision=HIGHEST is REQUIRED for exactness: the TPU MXU's default
    # single-pass mode truncates operands to bf16, which rounds table
    # VALUES above 256 (e.g. instance ids up to 1024). One-hots are 0/1
    # (bf16-exact) but the table is not. The tables here are ~100 rows, so
    # the full-f32 passes cost nothing.
    def body(_, s):
        oh = jax.nn.one_hot(s, T, dtype=jnp.float32)
        val = jax.lax.dot_general(
            oh, tbl_f, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return None, val

    _, vals = jax.lax.scan(body, None, chunks)
    out = vals.reshape(-1, tbl.shape[1])
    if pad:
        out = out[:idx.shape[0]]
    out = out.astype(out_dtype)
    return out[:, 0] if squeeze else out


def table_lookup_int(idx: Array, table: Array) -> Array:
    """Exact integer table lookup on a SINGLE bf16 MXU pass.

    out[i] = table[idx[i]] for idx in [0, T); out-of-range rows return 0.
    table: (T,) or (T, C) int32 with values in (-32768, 32767].

    table_lookup's full-f32 HIGHEST-precision dots cost ~3 MXU passes per
    operand pair because integer table VALUES above 256 round in bf16. Here
    the table is split into hi/lo BYTES (each <= 256, bf16-exact), packed as
    2C output columns of ONE default-precision bf16 matmul, and recombined
    -- the one-hot rows are 0/1 (bf16-exact) and the f32 accumulation picks
    exactly one nonzero term per row, so the result is exact. Traced ~3x
    faster than the HIGHEST path at 524k rows (PERF.md 6w)."""
    squeeze = table.ndim == 1
    tbl = table[:, None] if squeeze else table
    T, C = tbl.shape
    v = tbl.astype(jnp.int32) + 32768            # [0, 65535]
    hi = (v // 256).astype(jnp.float32)          # [0, 256) bf16-exact
    lo = (v % 256).astype(jnp.float32)           # [0, 256) bf16-exact
    tbl2 = jnp.stack([hi, lo], axis=-1).reshape(T, 2 * C).astype(jnp.bfloat16)
    chunks, pad = _chunked(idx.astype(jnp.int32), T)

    def body(_, s):
        oh = jax.nn.one_hot(s, T, dtype=jnp.bfloat16)
        val = jax.lax.dot_general(
            oh, tbl2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return None, val

    _, vals = jax.lax.scan(body, None, chunks)
    out2 = vals.reshape(-1, C, 2)
    if pad:
        out2 = out2[:idx.shape[0]]
    out = out2[..., 0].astype(jnp.int32) * 256 \
        + out2[..., 1].astype(jnp.int32)
    # out-of-range one-hot rows are all-zero -> hi = lo = 0; every in-range
    # value has v + 32768 >= 1 (hence hi + lo > 0), so hit==0 <=> miss and
    # misses return 0, matching table_lookup's out-of-range contract
    hit = out2[..., 0] + out2[..., 1] > 0
    out = jnp.where(hit, out - 32768, 0)
    return out[:, 0] if squeeze else out


def histogram(idx: Array, n_bins: int, weights: Array | None = None) -> Array:
    """out[t] = sum of weights (default 1) where idx == t, for t in
    [0, n_bins). Out-of-range indices are dropped. Unweighted counts are
    exact below 2^24 (bf16 one-hots, f32 accumulation); weighted sums keep
    the weights in f32 via precision=HIGHEST passes (same cost profile as
    table_lookup -- the one-hot side stays a cheap single bf16 pass)."""
    chunks, _ = _chunked(idx.astype(jnp.int32), n_bins)
    if weights is None:
        def body(acc, s):
            oh = jax.nn.one_hot(s, n_bins, dtype=jnp.bfloat16)
            w = jnp.ones(s.shape, jnp.bfloat16)
            return acc + jax.lax.dot_general(
                w[None, :], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[0], None

        out, _ = jax.lax.scan(
            body, jnp.zeros((n_bins,), jnp.float32), chunks)
        return out

    w = weights.astype(jnp.float32)
    pad = chunks.size - w.shape[0]
    if pad:
        w = jnp.concatenate([w, jnp.zeros((pad,), jnp.float32)])
    w_chunks = w.reshape(chunks.shape)

    def body_w(acc, x):
        s, wc = x
        # f32 weights x f32 one-hot at HIGHEST: a default single-pass bf16
        # matmul would round weights needing > 8 mantissa bits (e.g.
        # integer weights > 256)
        oh = jax.nn.one_hot(s, n_bins, dtype=jnp.float32)
        return acc + jax.lax.dot_general(
            wc[None, :], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)[0], None

    out, _ = jax.lax.scan(
        body_w, jnp.zeros((n_bins,), jnp.float32), (chunks, w_chunks))
    return out


def segment_or(idx: Array, rows: Array, n_segments: int) -> Array:
    """out[t] = OR of rows[i] where idx[i] == t. rows: (N, ...) bool,
    idx: (N,) in [0, n_segments); out-of-range rows are dropped.
    Runs as one (n_segments, N) x (N, ...) dot_general contracting over N;
    trailing dims pass through untouched (so tiled 2D mask layouts avoid a
    bit-repacking reshape)."""
    # bf16 one-hots are exact and run a single MXU pass on TPU; the CPU
    # backend cannot execute bf16 dots with >1 trailing dim (DotThunk
    # UNIMPLEMENTED), so tests fall back to f32
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    oh = jax.nn.one_hot(idx, n_segments, dtype=dt)                # (N, S)
    acc = jax.lax.dot_general(
        oh, rows.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                        # (S, ...)
    return acc > 0.5
