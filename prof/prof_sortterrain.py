"""Terrain: sorted vs unsorted streamed traversal on realistic bounce rays."""
import time, numpy as np, jax, jax.numpy as jnp
from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import traverse_stream as TS

sv = procedural.terrain(grid=500)
sc = Scene.from_vkr_scene(sv)
flat = sc.flatten_world()
print("tris:", len(flat.v0), flush=True)
bb = TS.pack_streamed(flat.v0, flat.e1, flat.e2)
print("subtrees:", bb.sub_nodes.shape[0] // TS.SUB_NODE_ROWS, "top nodes:", bb.num_top_nodes, flush=True)

# primary rays from the bench camera (coherent)
N = 196608
rs = np.random.RandomState(0)
W, H = 512, 384
xs = (np.arange(N) % W + 0.5) / W * 2 - 1
ys = ((np.arange(N) // W) % H + 0.5) / H * 2 - 1
import math
eye = np.array([0, 5.0, 12.0], np.float32)
fwd = -eye / np.linalg.norm(eye)
right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
up = np.cross(right, fwd)
tanf = math.tan(math.radians(55 / 2))
rd = (fwd[None] + right[None] * (xs * tanf * W / H)[:, None] + up[None] * (-ys * tanf)[:, None]).astype(np.float32)
rd /= np.linalg.norm(rd, axis=1, keepdims=True)
ro = np.broadcast_to(eye, (N, 3)).astype(np.float32).copy()
comps_p = tuple(jnp.asarray(a) for a in (*ro.T, *rd.T))

fc = jax.jit(lambda c: TS.closest_hit_streamed(bb, None, None, comps=c))
fcs = jax.jit(lambda c: TS.closest_hit_streamed(bb, None, None, comps=c, sort=True))
h = fc(comps_p); jax.block_until_ready(h)
hit_mask = np.asarray(h.tri) >= 0
t = np.asarray(h.t)
print("primary hit rate:", hit_mask.mean(), flush=True)

# bounce rays: origins at hit points, cosine hemisphere around +normalish up
p = ro + rd * np.where(np.isfinite(t), t, 0)[:, None]
u1, u2 = rs.uniform(size=N), rs.uniform(size=N)
r_ = np.sqrt(u1); th = 2 * np.pi * u2
loc = np.stack([r_ * np.cos(th), r_ * np.sin(th), np.sqrt(1 - u1)], 1)
nrm = np.stack([np.zeros(N), np.ones(N), np.zeros(N)], 1)  # approx up
tang = np.stack([np.ones(N), np.zeros(N), np.zeros(N)], 1)
bit = np.cross(nrm, tang)
brd = (tang * loc[:, :1] + bit * loc[:, 1:2] + nrm * loc[:, 2:3]).astype(np.float32)
bro = (p + brd * 1e-3).astype(np.float32)
# lanes that missed: dead rays (tmax=0 analogue): keep them pointing up from origin
comps_b = tuple(jnp.asarray(a) for a in (*bro.T, *brd.T))

def timeit(f, c, k=4):
    o = f(c); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(k): o = f(c)
    np.asarray(jax.device_get(o.t.ravel()[0:1]))
    return (time.perf_counter() - t0) / k * 1e3

print(f"primary unsorted: {timeit(fc, comps_p):9.2f} ms", flush=True)
print(f"primary sorted  : {timeit(fcs, comps_p):9.2f} ms", flush=True)
print(f"bounce  unsorted: {timeit(fc, comps_b):9.2f} ms", flush=True)
print(f"bounce  sorted  : {timeit(fcs, comps_b):9.2f} ms", flush=True)

# shuffled bounce rays (worst case lane order)
perm = rs.permutation(N)
comps_sh = tuple(jnp.asarray(np.asarray(c)[perm]) for c in comps_b)
print(f"shuffled bounce unsorted: {timeit(fc, comps_sh):9.2f} ms", flush=True)
print(f"shuffled bounce sorted  : {timeit(fcs, comps_sh):9.2f} ms", flush=True)
