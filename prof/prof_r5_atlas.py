"""Round-5: atlas-lookup cost attack.

prof_r4_shade measured each bilinear atlas lookup at ~23.6 ms per 524K
lanes (3 lookups per textured visit = ~71 ms — comparable to the v3
closest dispatch itself). The cost is 4 independent 1-D u32 gathers.
A/B'd here:

  A. current: 4 gathers from (P,) u32 + unpack;
  B. quad-packed: one gather from (P, 4) u32 rows (p00,p10,p01,p11
     pre-packed per texel) — 4x atlas memory, 1 gather;
  C. fused-3: the three per-visit lookups (basecolor/specular/normal)
     batched into ONE gather of 3N indices (same 4-gather structure,
     amortized launch/index staging);
  D. row-pair gather: one gather of (P, 2) rows for (p00,p10) +
     one for (p01,p11) — 2x memory, 2 gathers.

Run on chip: PYTHONPATH=.:/root/.axon_site python prof/prof_r5_atlas.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 524288
P = 16384  # ~the village atlas texel count


def sync(x):
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def timeit(name, fn, *args, iters=8):
    o = fn(*args)
    sync(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    sync(o)
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{name:58s} {dt:9.2f} ms", flush=True)
    return dt


def _unpack(px):
    px = px.astype(jnp.uint32)
    return (
        (px & 0xFF).astype(jnp.float32),
        ((px >> 8) & 0xFF).astype(jnp.float32),
        ((px >> 16) & 0xFF).astype(jnp.float32),
        ((px >> 24) & 0xFF).astype(jnp.float32),
    )


def main():
    rng = np.random.default_rng(0)
    texels = jnp.asarray(rng.integers(0, 2**32, P, dtype=np.uint64)
                         .astype(np.uint32))
    # quad-packed: (P, 4) — row p holds [p, p+1, p+w, p+w+1] texels
    w = 128
    idx = np.arange(P)
    quad_np = np.stack(
        [idx, (idx + 1) % P, (idx + w) % P, (idx + w + 1) % P], axis=1
    )
    texels_quad = jnp.asarray(np.asarray(texels)[quad_np])
    pair_np0 = np.stack([idx, (idx + 1) % P], axis=1)
    pair_np1 = np.stack([(idx + w) % P, (idx + w + 1) % P], axis=1)
    texels_p0 = jnp.asarray(np.asarray(texels)[pair_np0])
    texels_p1 = jnp.asarray(np.asarray(texels)[pair_np1])

    i00 = jnp.asarray(rng.integers(0, P - w - 2, N).astype(np.int32))
    fx = jnp.asarray(rng.random(N, np.float32))
    fy = jnp.asarray(rng.random(N, np.float32))

    @jax.jit
    def bilinear_4gather(i00, fx, fy):
        p00 = _unpack(texels[i00])
        p10 = _unpack(texels[i00 + 1])
        p01 = _unpack(texels[i00 + w])
        p11 = _unpack(texels[i00 + w + 1])
        out = []
        for k in range(4):
            out.append(
                p00[k] * (1 - fx) * (1 - fy) + p10[k] * fx * (1 - fy)
                + p01[k] * (1 - fx) * fy + p11[k] * fx * fy
            )
        return out[0] + out[1] + out[2] + out[3]

    @jax.jit
    def bilinear_quad(i00, fx, fy):
        q = texels_quad[i00]  # (N, 4) one gather
        p00 = _unpack(q[:, 0])
        p10 = _unpack(q[:, 1])
        p01 = _unpack(q[:, 2])
        p11 = _unpack(q[:, 3])
        out = []
        for k in range(4):
            out.append(
                p00[k] * (1 - fx) * (1 - fy) + p10[k] * fx * (1 - fy)
                + p01[k] * (1 - fx) * fy + p11[k] * fx * fy
            )
        return out[0] + out[1] + out[2] + out[3]

    @jax.jit
    def bilinear_pair(i00, fx, fy):
        a = texels_p0[i00]  # (N, 2)
        b = texels_p1[i00]
        p00 = _unpack(a[:, 0])
        p10 = _unpack(a[:, 1])
        p01 = _unpack(b[:, 0])
        p11 = _unpack(b[:, 1])
        out = []
        for k in range(4):
            out.append(
                p00[k] * (1 - fx) * (1 - fy) + p10[k] * fx * (1 - fy)
                + p01[k] * (1 - fx) * fy + p11[k] * fx * fy
            )
        return out[0] + out[1] + out[2] + out[3]

    @jax.jit
    def fused3_4gather(i00, fx, fy):
        # three lookups with one 3N-index gather per tap
        i3 = jnp.concatenate([i00, i00 + 7, i00 + 13])
        fx3 = jnp.concatenate([fx, fx, fx])
        fy3 = jnp.concatenate([fy, fy, fy])
        r = bilinear_4gather(i3, fx3, fy3)
        return r[:N] + r[N:2 * N] + r[2 * N:]

    @jax.jit
    def three_separate(i00, fx, fy):
        return (
            bilinear_4gather(i00, fx, fy)
            + bilinear_4gather(i00 + 7, fx, fy)
            + bilinear_4gather(i00 + 13, fx, fy)
        )

    timeit("A  one lookup, 4 gathers (current)", bilinear_4gather, i00, fx, fy)
    timeit("B  one lookup, quad-packed 1 gather", bilinear_quad, i00, fx, fy)
    timeit("D  one lookup, row-pair 2 gathers", bilinear_pair, i00, fx, fy)
    timeit("   three lookups, separate (current)", three_separate, i00, fx, fy)
    timeit("C  three lookups, fused 3N-gather", fused3_4gather, i00, fx, fy)

    # correctness: quad/pair == 4-gather
    a = np.asarray(bilinear_4gather(i00, fx, fy))
    b = np.asarray(bilinear_quad(i00, fx, fy))
    c = np.asarray(bilinear_pair(i00, fx, fy))
    assert np.array_equal(a, b) and np.array_equal(a, c)
    print("quad/pair == 4-gather: exact OK", flush=True)


if __name__ == "__main__":
    main()
