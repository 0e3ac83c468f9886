"""Round-4 measurement: what does a coherence sort + permutation REALLY
cost per 524K-ray dispatch on this chip, primitive by primitive?

The round-3 ledger recorded brutal numbers (1-D cumsum 9 ms, lane gather
41-51 ms, lane scatter ~10 ms per 524K) that killed default compaction.
Before designing the resident-path bounce sort (VERDICT r3 #1) we
re-measure each candidate primitive in isolation AND fused into a
producer chain, including MXU-based alternatives:

  a. jnp.cumsum (N,) i32                 — the XLA scan baseline
  b. MXU cumsum: (N/128, 128) @ L tri    — two-level matmul prefix sum
  c. jnp.argsort (N,) u32
  d. lane gather  (8, N)[:, perm]
  e. lane scatter (8, N).at[:, pos].set
  f. sublane gather (N, 8)[perm, :]      — rays-on-rows orientation
  g. one-hot histogram + rank (counting sort position build, MXU)
  h. full _sort_queue round trip (sort 6 comps + unsort (4, N))

Run on the chip: python prof/prof_r4_sortcost.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 524288


def timeit(name, fn, *args, iters=20):
    f = jax.jit(fn)
    o = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), o)
    # hard sync via 1-elem readback (axon relay)
    first = jax.tree_util.tree_leaves(o)[0]
    _ = np.asarray(first.ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    first = jax.tree_util.tree_leaves(o)[0]
    _ = np.asarray(first.ravel()[0:1])
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{name:44s} {dt:8.3f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    keys_u32 = jax.random.randint(k1, (N,), 0, 1 << 24, dtype=jnp.int32
                                  ).astype(jnp.uint32)
    x_i32 = jax.random.randint(k2, (N,), 0, 2, dtype=jnp.int32)
    rays = jax.random.normal(k3, (8, N), jnp.float32)
    rays_t = rays.T.copy()  # (N, 8)
    perm = np.random.permutation(N).astype(np.int32)
    perm = jnp.asarray(perm)

    # a. XLA cumsum
    timeit("a. jnp.cumsum (N,) i32", lambda x: jnp.cumsum(x), x_i32)

    # b. MXU two-level cumsum
    L128 = jnp.tril(jnp.ones((128, 128), jnp.float32))

    def mxu_cumsum(x):
        # (N,) i32 -> inclusive cumsum via two matmul levels (exact in
        # f32 for sums < 2^24)
        g = x.reshape(N // 128, 128).astype(jnp.float32)
        within = jnp.matmul(g, L128.T, precision=jax.lax.Precision.HIGHEST)
        totals = within[:, -1]  # (N/128,)
        g2 = totals.reshape(-1, 128)
        w2 = jnp.matmul(g2, L128.T, precision=jax.lax.Precision.HIGHEST)
        t2 = w2[:, -1]
        t3 = jnp.cumsum(t2)  # tiny (32,)
        off2 = jnp.concatenate([jnp.zeros((1,), jnp.float32), t3[:-1]])
        row_off = (w2 - g2 + off2[:, None]).reshape(-1)  # exclusive
        return (within + row_off[:, None]).reshape(-1).astype(jnp.int32)

    timeit("b. MXU cumsum (N,) via tri-matmul", mxu_cumsum, x_i32)
    # correctness
    a = np.asarray(jnp.cumsum(x_i32))
    b = np.asarray(jax.jit(mxu_cumsum)(x_i32))
    assert (a == b).all(), "mxu cumsum mismatch"

    # c. argsort
    timeit("c. jnp.argsort (N,) u32", lambda k: jnp.argsort(k), keys_u32)
    timeit("c2. jnp.argsort stable", lambda k: jnp.argsort(k, stable=True),
           keys_u32)
    # c3. sort key+payload pairs via lax.sort
    timeit(
        "c3. lax.sort (key, iota) pair",
        lambda k: jax.lax.sort(
            (k, jax.lax.iota(jnp.int32, N)), num_keys=1
        ),
        keys_u32,
    )

    # d/e. lane gather / scatter of (8, N)
    timeit("d. lane gather (8,N)[:, perm]", lambda r, p: r[:, p], rays, perm)
    timeit(
        "e. lane scatter (8,N).at[:,pos].set",
        lambda r, p: jnp.zeros_like(r).at[:, p].set(r, unique_indices=True),
        rays, perm,
    )

    # f. sublane (row) gather, rays-on-rows
    timeit("f. row gather (N,8)[perm, :]", lambda r, p: r[p, :], rays_t, perm)
    timeit(
        "f2. row scatter (N,8).at[pos,:].set",
        lambda r, p: jnp.zeros_like(r).at[p, :].set(r, unique_indices=True),
        rays_t, perm,
    )
    # f3: 1-D per-component gather x8
    timeit(
        "f3. 8x 1-D gathers c[perm]",
        lambda r, p: jnp.stack([r[k][p] for k in range(8)]),
        rays, perm,
    )
    # f4: 1-D per-component scatter x8
    timeit(
        "f4. 8x 1-D scatters",
        lambda r, p: jnp.stack(
            [jnp.zeros((N,), r.dtype).at[p].set(r[k], unique_indices=True)
             for k in range(8)]
        ),
        rays, perm,
    )

    # g. counting-sort position build with K bins, MXU rank
    K = 64
    bkeys = (keys_u32 & (K - 1)).astype(jnp.int32)

    def count_pos_mxu(bk):
        # one-hot (N, K) in bf16 never materialized in HBM at f32:
        # within-block rank via L @ onehot per 128-row block
        oh = jax.nn.one_hot(bk, K, dtype=jnp.float32)  # (N, K)
        g = oh.reshape(N // 128, 128, K)
        within = jnp.einsum(
            "rs,bsk->brk", L128, g, precision=jax.lax.Precision.HIGHEST
        )  # inclusive rank within 128-block
        blk_tot = within[:, -1, :]  # (N/128, K)
        # cumsum over blocks per bin: (N/128, K) — do with MXU too
        nb = N // 128
        Lb = jnp.tril(jnp.ones((nb, nb), jnp.float32), k=-1)
        blk_off = jnp.matmul(Lb, blk_tot,
                             precision=jax.lax.Precision.HIGHEST)
        bin_tot = blk_tot.sum(axis=0)
        bin_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.float32), jnp.cumsum(bin_tot)[:-1]]
        )
        rank = within - 1.0 + blk_off[:, None, :]  # exclusive global rank
        posk = rank + bin_start[None, None, :]
        pos = jnp.sum(posk.reshape(N, K) * oh, axis=1)
        return pos.astype(jnp.int32)

    timeit("g. counting-sort pos (K=64, MXU)", count_pos_mxu, bkeys)
    # correctness vs stable argsort
    pos_ref = np.empty(N, np.int32)
    order = np.argsort(np.asarray(bkeys), kind="stable")
    pos_ref[order] = np.arange(N)
    pos_got = np.asarray(jax.jit(count_pos_mxu)(bkeys))
    assert (pos_got == pos_ref).all(), "counting pos mismatch"

    # h. full sort round trip as _sort_queue does it
    def full_roundtrip(r, k):
        p = jnp.argsort(k, stable=True)
        sorted_r = r[:, p]
        out = sorted_r * 2.0  # stand-in for the kernel
        inv = jnp.zeros((N,), jnp.int32).at[p].set(
            jnp.arange(N, dtype=jnp.int32), unique_indices=True
        )
        return out[:4][:, inv]

    timeit("h. argsort+gather+ungather round trip", full_roundtrip,
           rays, keys_u32)


if __name__ == "__main__":
    main()
