"""Isolate the cost of _compact's pieces on chip: cumsum, scatter, gathers."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from prof_micro import timeit
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas2 as tp2


def main():
    print("device:", jax.devices()[0])
    n = 524288
    rng = np.random.default_rng(3)
    rays = jnp.asarray(rng.normal(size=(8, n)).astype(np.float32))
    live_np = (rng.uniform(size=n) < 0.3).astype(np.float32)
    rays = rays.at[6].set(0.0).at[7].set(jnp.asarray(live_np))

    @jax.jit
    def f_cumsum(r):
        live = (r[7] > r[6]).astype(jnp.int32)
        return jnp.cumsum(live)

    @jax.jit
    def f_pos(r):
        live = r[7] > r[6]
        li = live.astype(jnp.int32)
        n_live = jnp.sum(li)
        pos_live = jnp.cumsum(li) - 1
        pos_dead = n_live + jnp.cumsum(1 - li) - 1
        return jnp.where(live, pos_live, pos_dead).astype(jnp.int32)

    @jax.jit
    def f_perm(r):
        pos = f_pos(r)
        return jnp.zeros((n,), jnp.int32).at[pos].set(
            jnp.arange(n, dtype=jnp.int32), unique_indices=True
        )

    @jax.jit
    def f_gather8(r):
        perm = f_perm(r)
        return r[:, perm]

    @jax.jit
    def f_full(r):
        return tp2._compact(r)[0]

    @jax.jit
    def f_argsort(r):
        live = r[7] > r[6]
        return jnp.argsort(~live, stable=True)

    @jax.jit
    def f_sortgather(r):
        perm = f_argsort(r)
        return r[:, perm]

    for name, fn in [
        ("cumsum", f_cumsum), ("pos", f_pos), ("perm(scatter)", f_perm),
        ("gather(8,N)", f_gather8), ("full _compact", f_full),
        ("argsort", f_argsort), ("argsort+gather", f_sortgather),
    ]:
        ms = timeit(lambda: fn(rays))
        print(f"  {name:16s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
