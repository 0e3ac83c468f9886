"""Find a fast permutation primitive on v5e: lane gathers vs 128-lane
row (granule) gathers/scatters, argsort sizes, MXU prefix sums."""
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from prof_micro import timeit


def main():
    print("device:", jax.devices()[0])
    n = 262144
    g = n // 128  # 2048 granules
    m = 4 * g  # pair rows (4 crossings avg)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(g, 128)).astype(np.float32))
    x8 = jnp.asarray(rng.normal(size=(8, n)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    rows = jnp.asarray(rng.integers(0, g, size=(m,)).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(m, 128)).astype(np.float32))
    keys_m = jnp.asarray(rng.integers(0, 1 << 30, size=(m,)).astype(np.uint32))

    tests = {
        "lane gather x[perm] (262k)": lambda: x[perm],
        "take(x, perm)": lambda: jnp.take(x, perm),
        "row gather (2k,128)[8k rows]": lambda: x2[rows],
        "row gather x3 arrays": lambda: (x2[rows], x2[rows], x2[rows]),
        "row scatter-min (8k->2k,128)": lambda: jnp.full(
            (g, 128), 1e30, jnp.float32
        ).at[rows].min(vals),
        "row scatter-set unique": lambda: jnp.zeros((g, 128)).at[
            jnp.asarray(np.random.default_rng(1).permutation(g)[: m // 4].astype(np.int32))
        ].set(vals[: m // 4]),
        "argsort 8k keys": lambda: jnp.argsort(keys_m),
        "argsort 262k": lambda: jnp.argsort(perm),
        "cumsum 8k": lambda: jnp.cumsum(keys_m.astype(jnp.int32)),
        "sort+gather rows by key": lambda: x2[rows[jnp.argsort(keys_m)]],
        "(8,n) block gather 512-cols": lambda: x8.reshape(8, n // 512, 512)[
            :, jnp.asarray(rng.permutation(n // 512).astype(np.int32))
        ],
    }
    for name, fn in tests.items():
        try:
            ms = timeit(lambda: jax.jit(fn)())
            print(f"  {name:34s} {ms:8.2f} ms")
        except Exception as e:
            print(f"  {name:34s} FAIL {str(e)[:90]}")


if __name__ == "__main__":
    main()
