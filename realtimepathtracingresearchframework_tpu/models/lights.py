"""Light collection and binned RIS preparation (host side).

Equivalent of ``librender/lights.{h,cpp}``:
- :func:`collect_emitters` walks the flattened scene and emits a
  ``TriLight`` table (one entry per emissive triangle) —
  ``collect_emitters`` (librender/lights.h:23-24),
- :func:`equalize_emitter_bins` reorders lights into approximately
  equal-total-radiance bins of ``bin_size`` for the RIS sampler —
  ``equalize_emitter_bins`` (librender/lights.h:36-48),
- :func:`trim_dim_emitters` drops lights below a radiance threshold.

The device-side sampler (ops/nee.py) consumes the SoA arrays.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from realtimepathtracingresearchframework_tpu.utils.color import luminance


@dataclass
class TriLights:
    """SoA table of emissive triangles (rendering/lights/tri.h.glsl:8-27)."""

    v0: np.ndarray  # (L,3)
    v1: np.ndarray  # (L,3)
    v2: np.ndarray  # (L,3)
    radiance: np.ndarray  # (L,3)

    @property
    def count(self) -> int:
        return len(self.radiance)

    @property
    def areas(self) -> np.ndarray:
        return 0.5 * np.linalg.norm(
            np.cross(self.v1 - self.v0, self.v2 - self.v0), axis=-1
        )

    @property
    def power(self) -> np.ndarray:
        return luminance(self.radiance) * self.areas * np.pi


def collect_emitters(flat, material_table) -> TriLights:
    """Collect emissive triangles from a FlatScene + MaterialTable.

    Emitted radiance = base_color * emission_intensity, matching the
    reference's emitter unpack (librender/scene.cpp:957-963 +
    shade_base_material emit.radiance).
    """
    emission = np.asarray(material_table.emission_intensity)[flat.material_id]
    sel = np.nonzero(emission > 0.0)[0]
    v0 = flat.v0[sel]
    v1 = v0 + flat.e1[sel]
    v2 = v0 + flat.e2[sel]
    base = np.asarray(material_table.base_color)[flat.material_id[sel]]
    radiance = base * emission[sel, None]
    return TriLights(
        v0=v0.astype(np.float32),
        v1=v1.astype(np.float32),
        v2=v2.astype(np.float32),
        radiance=radiance.astype(np.float32),
    )


def trim_dim_emitters(lights: TriLights, min_radiance: float) -> TriLights:
    """Drop emitters below a luminance threshold (lights.h:44-45)."""
    keep = luminance(lights.radiance) >= min_radiance
    return TriLights(
        v0=lights.v0[keep],
        v1=lights.v1[keep],
        v2=lights.v2[keep],
        radiance=lights.radiance[keep],
    )


def equalize_emitter_bins(lights: TriLights, bin_size: int) -> TriLights:
    """Reorder lights so each bin of ``bin_size`` has roughly equal total
    power — greedy snake assignment by descending power, the equal-weight
    binning of librender/lights.cpp. Pads the table to a multiple of
    bin_size with zero-radiance degenerate lights so the device sampler's
    bins are fixed-width."""
    n = lights.count
    if n == 0:
        return lights
    num_bins = (n + bin_size - 1) // bin_size
    power = lights.power  # property computes areas — hoist out of the loop
    order = np.argsort(-power, kind="stable")

    # greedy least-loaded assignment via a heap: each bin has exactly
    # one live entry until full, so this is O(n log B). The previous
    # argmin-per-light form re-evaluated the power property each
    # iteration — measured quadratic (11.7 s at 16k emitters).
    import heapq

    bins = [[] for _ in range(num_bins)]
    heap = [(0.0, b) for b in range(num_bins)]
    heapq.heapify(heap)
    for idx in order:
        p, b = heapq.heappop(heap)
        bins[b].append(int(idx))
        if len(bins[b]) < bin_size:
            heapq.heappush(heap, (p + float(power[idx]), b))

    padded = num_bins * bin_size
    sel = np.zeros(padded, np.int64)
    pad_mask = np.zeros(padded, bool)
    for b, members in enumerate(bins):
        for i in range(bin_size):
            if i < len(members):
                sel[b * bin_size + i] = members[i]
            else:
                sel[b * bin_size + i] = members[-1] if members else 0
                pad_mask[b * bin_size + i] = True

    out = TriLights(
        v0=lights.v0[sel].copy(),
        v1=lights.v1[sel].copy(),
        v2=lights.v2[sel].copy(),
        radiance=lights.radiance[sel].copy(),
    )
    out.radiance[pad_mask] = 0.0
    # degenerate geometry for padded entries (zero area)
    out.v1[pad_mask] = out.v0[pad_mask]
    out.v2[pad_mask] = out.v0[pad_mask]
    return out


def empty_lights() -> TriLights:
    """A single zero light so device shapes are never empty."""
    z = np.zeros((1, 3), np.float32)
    return TriLights(v0=z, v1=z.copy(), v2=z.copy(), radiance=z.copy())
