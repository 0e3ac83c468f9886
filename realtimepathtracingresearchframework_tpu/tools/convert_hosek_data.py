"""Convert the Hosek-Wilkie sky model data headers to a compressed .npz.

The Hosek-Wilkie fitted coefficient tables
(rendering/lights/sky_model_arhosek/sky_model_data_{rgb,spectral}.h in the
reference tree; published with the original 2012/2013 sample code under the
3-clause BSD license) are pure data — this tool parses the C array
literals and repacks them as numpy arrays for models/sky_hosek.py:

- rgb:        (3, 2, 10, 6, 9)  config coefficients per sRGB channel
              (albedo lo/hi, turbidity 1..10, 6 bezier knots, 9 coeffs)
- rgb_rad:    (3, 2, 10, 6)     radiance scale bezier knots
- spectral:   (11, 2, 10, 6, 9) per 40nm band 320..720nm
- spectral_rad: (11, 2, 10, 6)
- solar:      (11, 10, 45, 4)   piecewise-cubic solar radiance
              (wavelength band, turbidity-1, elevation piece, coeff)
- limb:       (11, 6)           limb darkening polynomials
- cie1931:    (3, 95)           CIE 1931 observer 360..830nm/5nm
              (rendering/color/color_matching.h:50)

Usage: python -m realtimepathtracingresearchframework_tpu.tools.convert_hosek_data \
          <reference_root> [out.npz]
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

_ARRAY_RE_TMPL = r"{name}\s*\[[^\]]*\]\s*=\s*\{{(.*?)\}}\s*;"
_NUM_RE = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?")


def parse_array(text: str, name: str) -> np.ndarray:
    m = re.search(_ARRAY_RE_TMPL.format(name=re.escape(name)), text, re.S)
    if m is None:
        raise KeyError(f"array {name} not found")
    body = re.sub(r"//[^\n]*", "", m.group(1))  # strip // comments
    vals = [float(x) for x in _NUM_RE.findall(body)]
    return np.array(vals, np.float64)


def convert(ref_root: str, out_path: str) -> dict:
    sky_dir = os.path.join(ref_root, "rendering/lights/sky_model_arhosek")
    with open(os.path.join(sky_dir, "sky_model_data_rgb.h")) as f:
        rgb_text = f.read()
    with open(os.path.join(sky_dir, "sky_model_data_spectral.h")) as f:
        spec_text = f.read()

    rgb = np.stack(
        [parse_array(rgb_text, f"datasetRGB{i}") for i in (1, 2, 3)]
    ).reshape(3, 2, 10, 6, 9)
    rgb_rad = np.stack(
        [parse_array(rgb_text, f"datasetRGBRad{i}") for i in (1, 2, 3)]
    ).reshape(3, 2, 10, 6)

    wls = [320 + 40 * i for i in range(11)]
    spectral = np.stack(
        [parse_array(spec_text, f"dataset{w}") for w in wls]
    ).reshape(11, 2, 10, 6, 9)
    spectral_rad = np.stack(
        [parse_array(spec_text, f"datasetRad{w}") for w in wls]
    ).reshape(11, 2, 10, 6)
    solar = np.stack(
        [parse_array(spec_text, f"solarDataset{w}") for w in wls]
    ).reshape(11, 10, 45, 4)
    limb = np.stack(
        [parse_array(spec_text, f"limbDarkeningDataset{w}") for w in wls]
    ).reshape(11, 6)

    with open(os.path.join(ref_root, "rendering/color/color_matching.h")) as f:
        cm_text = f.read()
    cie = parse_array(cm_text, "cie1931_tbl").reshape(3, 95)

    data = dict(
        rgb=rgb, rgb_rad=rgb_rad, spectral=spectral,
        spectral_rad=spectral_rad, solar=solar, limb=limb, cie1931=cie,
    )
    np.savez_compressed(out_path, **data)
    return data


def main() -> int:
    ref_root = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(__file__), "..", "data", "hosek_sky.npz")
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    data = convert(ref_root, out)
    for k, v in data.items():
        print(f"{k}: {v.shape} {v.dtype}")
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
