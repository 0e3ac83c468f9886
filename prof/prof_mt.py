"""Where do the ~26us/block go? Isolate transpose / MT / chunked-MT costs."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from prof_micro import timeit

B = 512
LEAF = 128
N = 524288


def kernel_copy(tris_ref, rays_ref, out_ref):
    rays_t = jnp.transpose(rays_ref[:, :], (1, 0))  # (B, 8)
    res = jnp.concatenate([rays_t[:, 0:1], rays_t[:, 1:2],
                           rays_t[:, 2:3], rays_t[:, 3:4]], axis=1)
    out_ref[:, :] = jnp.transpose(res, (1, 0))


def _mt(tile, rox, roy, roz, rdx, rdy, rdz, tmin, tmax, lane_iota,
        t_best, best_row, best_u, best_v):
    v0x = tile[0:1, :]; v0y = tile[1:2, :]; v0z = tile[2:3, :]
    e1x = tile[3:4, :]; e1y = tile[4:5, :]; e1z = tile[5:6, :]
    e2x = tile[6:7, :]; e2y = tile[7:8, :]; e2z = tile[8:9, :]
    px = rdy * e2z - rdz * e2y
    py = rdz * e2x - rdx * e2z
    pz = rdx * e2y - rdy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvx = rox - v0x; tvy = roy - v0y; tvz = roz - v0z
    uu = (tvx * px + tvy * py + tvz * pz) * inv_det
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    vv = (rdx * qx + rdy * qy + rdz * qz) * inv_det
    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = ((jnp.abs(det) > 1e-12) & (uu >= 0.0) & (vv >= 0.0)
           & (uu + vv <= 1.0) & (tt > tmin) & (tt < jnp.minimum(t_best, tmax)))
    tt = jnp.where(hit, tt, 2e32)
    tmin_row = jnp.min(tt, axis=1, keepdims=True)
    improved = tmin_row < t_best
    is_best = (tt <= tmin_row) & hit
    lane_of_best = jnp.min(jnp.where(is_best, lane_iota, LEAF), axis=1,
                           keepdims=True)
    pick = lane_iota == lane_of_best
    u_pick = jnp.sum(jnp.where(pick, uu, 0.0), axis=1, keepdims=True)
    v_pick = jnp.sum(jnp.where(pick, vv, 0.0), axis=1, keepdims=True)
    t_best = jnp.where(improved, tmin_row, t_best)
    best_row = jnp.where(improved, lane_of_best.astype(jnp.int32), best_row)
    best_u = jnp.where(improved, u_pick, best_u)
    best_v = jnp.where(improved, v_pick, best_v)
    return t_best, best_row, best_u, best_v


def kernel_mt(tris_ref, rays_ref, out_ref, *, chunk: int, reps: int):
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LEAF), 1)
    rays_t = jnp.transpose(rays_ref[:, :], (1, 0))  # (B, 8)

    cols = []
    for s in range(0, B, chunk):
        rox = rays_t[s:s + chunk, 0:1]
        roy = rays_t[s:s + chunk, 1:2]
        roz = rays_t[s:s + chunk, 2:3]
        rdx = rays_t[s:s + chunk, 3:4]
        rdy = rays_t[s:s + chunk, 4:5]
        rdz = rays_t[s:s + chunk, 5:6]
        tmin = rays_t[s:s + chunk, 6:7]
        tmax = rays_t[s:s + chunk, 7:8]
        t_best = tmax
        best_row = jnp.full((chunk, 1), -1, jnp.int32)
        best_u = jnp.zeros((chunk, 1), jnp.float32)
        best_v = jnp.zeros((chunk, 1), jnp.float32)

        def body(j, c):
            t_best, best_row, best_u, best_v = c
            tile = tris_ref[pl.ds(0, 16), :]
            return _mt(tile, rox, roy, roz, rdx, rdy, rdz, tmin, tmax,
                       lane_iota, t_best, best_row, best_u, best_v)

        t_best, best_row, best_u, best_v = jax.lax.fori_loop(
            0, reps, body, (t_best, best_row, best_u, best_v))
        cols.append(jnp.concatenate(
            [t_best, jax.lax.bitcast_convert_type(best_row, jnp.float32),
             best_u, best_v], axis=1))
    res = jnp.concatenate(cols, axis=0)
    out_ref[:, :] = jnp.transpose(res, (1, 0))


def run(kernel, tris, rays, label):
    f = pl.pallas_call(
        kernel,
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec(tris.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, N), jnp.float32),
    )
    g = jax.jit(lambda t, r: f(t, r))
    ms = timeit(lambda: g(tris, rays))
    print(f"  {label}: {ms:7.2f} ms  ({ms * 1000.0 / (N // B):6.2f} us/block)")
    return ms


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(3)
    tris = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
    rays = jnp.asarray(rng.normal(size=(8, N)).astype(np.float32))
    run(kernel_copy, tris, rays, "transpose+copy only")
    for reps in (1, 4):
        for chunk in (512, 128, 64):
            run(functools.partial(kernel_mt, chunk=chunk, reps=reps),
                tris, rays, f"MT chunk={chunk} leaves={reps}")


if __name__ == "__main__":
    main()
