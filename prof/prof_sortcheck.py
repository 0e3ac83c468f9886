import numpy as np, jax.numpy as jnp, time
from realtimepathtracingresearchframework_tpu.ops import traverse_stream as TS

rs = np.random.RandomState(3)
T = 120000
v0 = rs.uniform(-5, 5, (T, 3)).astype(np.float32)
e1 = rs.uniform(-0.3, 0.3, (T, 3)).astype(np.float32)
e2 = rs.uniform(-0.3, 0.3, (T, 3)).astype(np.float32)
bb = TS.pack_streamed(v0, e1, e2)
N = 196608
ro = rs.uniform(-6, 6, (3, N)).astype(np.float32)
rd = rs.normal(size=(3, N)).astype(np.float32)
rd /= np.linalg.norm(rd, axis=0, keepdims=True)
comps = tuple(jnp.asarray(a) for a in (*ro, *rd))
import jax
f0 = jax.jit(lambda c: TS.closest_hit_streamed(bb, None, None, comps=c))
f1 = jax.jit(lambda c: TS.closest_hit_streamed(bb, None, None, comps=c, sort=True))
h0 = f0(comps); jax.block_until_ready(h0)
h1 = f1(comps); jax.block_until_ready(h1)
for a, b, nm in ((h0.t, h1.t, "t"), (h0.tri, h1.tri, "tri"),
                 (h0.u, h1.u, "u"), (h0.v, h1.v, "v")):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=nm)
print("bit-exact: sorted == unsorted (closest)", flush=True)

def timeit(f, c):
    t0 = time.perf_counter()
    for _ in range(5): o = f(c)
    np.asarray(jax.device_get(o.t.ravel()[0:1]))
    return (time.perf_counter() - t0) / 5 * 1e3
print(f"unsorted closest (incoherent): {timeit(f0, comps):9.2f} ms", flush=True)
print(f"sorted   closest (incoherent): {timeit(f1, comps):9.2f} ms", flush=True)
