"""Hosek-Wilkie sky parity vs the reference C implementation.

Pinned values produced by compiling the reference
rendering/lights/sky_model_arhosek/sky_model.cpp into a standalone
harness and printing state for (turbidity=3, albedo=0.2, elevation=0.5)
— see models/sky_hosek.py. Tolerances are float64 round-off."""

import numpy as np
import pytest

from realtimepathtracingresearchframework_tpu.models import sky_hosek as H
from realtimepathtracingresearchframework_tpu.models import sky as S

pytestmark = pytest.mark.skipif(
    not H.hosek_data_available(), reason="hosek data file missing"
)

# arhosek_rgb_skymodelstate_alloc_init(3.0, 0.2, 0.5): configs rows per
# channel + radiance (reference C output)
_REF_CONFIGS = np.array([
    [-1.077124885813151, -0.14085171252167084, 1.1663899120991186,
     0.62918779051393436, -1.9527196997247169, 1.151634006135335,
     0.2099988634801854, 1.6046677840181289, 0.69035847192849797],
    [-1.0845680085491232, -0.16661696219678387, 0.97825523419782956,
     0.26567974047932669, -3.9216728969483352, 1.0143796628017687,
     0.13105172908961893, 2.245584862034868, 0.67646497613369339],
    [-1.1002863098952016, -0.24315146311513092, 0.67015656344501751,
     -0.0060058235125355248, -0.54621292733271076, 0.6797735290080531,
     0.05963172127372858, 2.3101975951322524, 0.65119640909724319],
])
_REF_RADIANCES = np.array(
    [7.403149971936946, 10.480939202256867, 14.135732276198414]
)

# arhosekskymodel_solar_radiance / _radiance at theta=0.5, gamma=0
# (spectral state elevation=0.5, turbidity=3, albedo=0.2)
_REF_SOLAR = {  # wavelength: (solar total, sky inscatter)
    360.0: (5430.0683385382981, 0.070155782193402183),
    450.0: (19320.974870687318, 0.14437850537264155),
    540.0: (21968.968933158154, 0.1234930197774636),
    630.0: (21103.448280401197, 0.093384665232780828),
    720.0: (18429.639085784085, 0.066623570344418237),
}


def test_rgb_state_matches_reference():
    cfg, rad = H.rgb_state(3.0, 0.2, 0.5)
    np.testing.assert_allclose(cfg, _REF_CONFIGS, rtol=1e-12)
    np.testing.assert_allclose(rad, _REF_RADIANCES, rtol=1e-12)


def test_solar_radiance_matches_reference():
    scfg, srad = H.spectral_state(0.5, 3.0, 0.2)
    for wl, (solar, sky) in _REF_SOLAR.items():
        direct = H.solar_radiance_direct(3.0, wl, np.pi / 2 - 0.5, 0.0)
        insc = H._sky_radiance_spectral(scfg, srad, 0.5, 0.0, wl)
        np.testing.assert_allclose(insc, sky, rtol=1e-9)
        np.testing.assert_allclose(direct + insc, solar, rtol=1e-9)


def test_build_sky_defaults_to_hosek():
    p = S.build_sky([0.3, 0.8, 0.2], turbidity=3.0)
    assert p.hosek_configs.shape == (9, 3)
    assert float(p.scale) == 1.0
    # spectral sun integration lands in the right magnitude (>= 1e4)
    assert float(p.sun_radiance[0]) > 1e3


def test_preetham_still_available():
    p = S.build_sky([0.3, 0.8, 0.2], turbidity=3.0, model="preetham")
    assert p.hosek_configs.shape[0] == 1


def test_hosek_runtime_eval_matches_host_model():
    """The jitted sky_radiance must equal the host-side GLSL-equivalent
    math (same configs, scale 0.01, ocean fold) at float32 tolerance."""
    import jax.numpy as jnp

    p = S.build_sky([0.3, 0.8, 0.2], turbidity=4.5, albedo=(0.3, 0.3, 0.3))
    d = np.array([[0.0, 1.0, 0.0], [0.6, 0.3, 0.4], [0.1, 0.05, 0.9]])
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    got = np.asarray(S.sky_radiance(p, jnp.asarray(d)))

    cfg = np.asarray(p.hosek_configs, np.float64)  # (9, 3)
    rad = np.asarray(p.hosek_radiances, np.float64)
    sd = np.asarray(p.sun_dir, np.float64)
    want = np.zeros_like(got)
    for i, dd in enumerate(d.astype(np.float64)):
        cos_t = np.clip(dd[1], 0.0, 1.0)
        cos_g = np.clip(np.dot(dd, sd), -1.0, 1.0)
        gamma = np.arccos(cos_t)  # sky_model.glsl:48 quirk
        for ch in range(3):
            c = cfg[:, ch]
            exp_m = np.exp(c[4] * gamma)
            ray_m = cos_g * cos_g
            mie_m = (1 + cos_g**2) / (1 + c[8] ** 2 - 2 * c[8] * cos_g) ** 1.5
            zen = np.sqrt(cos_t)
            coeffs = (1 + c[0] * np.exp(c[1] / (cos_t + 0.01))) * (
                c[2] + c[3] * exp_m + c[5] * ray_m + c[6] * mie_m + c[7] * zen
            )
            want[i, ch] = coeffs * rad[ch] * 0.01
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
