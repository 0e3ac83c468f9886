"""Convert the reference RNG pointset tables to a compressed .npz.

The reference ships fitted/optimized sampling tables as C headers:
- rendering/pointsets/sobol_tables.h: ``SobolMatrix`` (1024 dims x 32
  bits of Joe-Kuo direction numbers, MIT-licensed data by Leonhard
  Gruenschloss) and ``SobolInversion_1_0`` (256x256 tile inverting the
  first two dimensions, used by Z-order shuffling),
- rendering/pointsets/bn_tables.h: the Heitz-Belcour blue-noise dithered
  Sobol data — ``sobol_256spp_256d`` plus 128x128x8 scrambling/ranking
  tiles per spp tier (1/4/16/256).

These are pure data; this tool repacks them for
ops/pointsets.py's table-driven (reference-parity) rng variants.

Usage: python -m realtimepathtracingresearchframework_tpu.tools.convert_pointset_tables \
          <reference_root> [out.npz]
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

_NUM_RE = re.compile(r"0[xX][0-9a-fA-F]+|[-+]?\d+")


def parse_u32_array(text: str, name: str) -> np.ndarray:
    m = re.search(
        r"{}\s*\[[^\]]*\]\s*=\s*\{{(.*?)\}}\s*;".format(re.escape(name)),
        text,
        re.S,
    )
    if m is None:
        raise KeyError(f"array {name} not found")
    body = re.sub(r"//[^\n]*", "", m.group(1))
    vals = [int(x, 0) for x in _NUM_RE.findall(body)]
    return np.array(vals, np.int64).astype(np.uint32)


def convert(ref_root: str, out_path: str) -> dict:
    pdir = os.path.join(ref_root, "rendering/pointsets")
    with open(os.path.join(pdir, "sobol_tables.h")) as f:
        sob = f.read()
    with open(os.path.join(pdir, "bn_tables.h")) as f:
        bn = f.read()

    data = dict(
        sobol_matrix=parse_u32_array(sob, "SobolMatrix").reshape(1024, 32),
        sobol_invert=parse_u32_array(sob, "SobolInversion_1_0").reshape(256, 256),
        bn_sobol=parse_u32_array(bn, "sobol_256spp_256d").reshape(256, 256),
    )
    for spp in (1, 4, 16, 256):
        data[f"bn_scrambling_{spp}spp"] = parse_u32_array(
            bn, f"scramblingTile_yx_d_{spp}spp"
        ).reshape(128 * 128 * 8)
        if spp != 1:  # the 1spp ranking tile is all zeros (render_bn.cpp:94)
            data[f"bn_ranking_{spp}spp"] = parse_u32_array(
                bn, f"rankingTile_yx_d_{spp}spp"
            ).reshape(128 * 128 * 8)
    rank1 = parse_u32_array(bn, "rankingTile_yx_d_1spp")
    assert not rank1.any(), "1spp ranking tile expected to be all zeros"
    np.savez_compressed(out_path, **data)
    return data


def main() -> int:
    ref_root = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(__file__), "..", "data", "pointset_tables.npz"
        )
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    data = convert(ref_root, out)
    for k, v in data.items():
        print(f"{k}: {v.shape} {v.dtype}")
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
