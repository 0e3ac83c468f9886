"""Writer interop with the REFERENCE loader: scenes written by our
write_scene must open through the reference's own libvkr C implementation
(ext/libvkr/src/vkr.c), compiled on the fly. This is the cross-
implementation proof behind the material-file-convention fixes (vkr.c's
``<Name>_<Param>`` naming, one-float-per-line params) — our own roundtrip
tests can't catch a convention drift, the reference's loader can.

Skips when the reference tree or a C compiler is unavailable."""

import ctypes
import os
import shutil
import subprocess

import numpy as np
import pytest

REF_SRC = "/root/reference/ext/libvkr/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC) or shutil.which("gcc") is None,
    reason="reference tree or gcc unavailable",
)


class VkrSceneHdr(ctypes.Structure):
    # prefix of the reference VkrScene struct (vkr.h:250-303) — enough to
    # read the top-level counts
    _fields_ = [
        ("version", ctypes.c_int32),
        ("flags", ctypes.c_uint32),
        ("headerSize", ctypes.c_int64),
        ("dataOffset", ctypes.c_int64),
        ("textureDir", ctypes.c_char_p),
        ("numMaterials", ctypes.c_uint64),
        ("materials", ctypes.c_void_p),
        ("numTriangles", ctypes.c_uint64),
        ("numMeshes", ctypes.c_uint64),
        ("meshes", ctypes.c_void_p),
        ("numInstances", ctypes.c_uint64),
        ("instances", ctypes.c_void_p),
        ("numLodGroups", ctypes.c_uint64),
        ("lodGroups", ctypes.c_void_p),
        # remainder of the struct as opaque padding (bone/animation block)
        ("_pad", ctypes.c_uint8 * 256),
    ]


@pytest.fixture(scope="module")
def ref_libvkr(tmp_path_factory):
    td = tmp_path_factory.mktemp("libvkr")
    so = str(td / "libvkr_ref.so")
    res = subprocess.run(
        ["gcc", "-O1", "-shared", "-fPIC", "-o", so,
         os.path.join(REF_SRC, "vkr.c"), "-I", REF_SRC],
        capture_output=True,
    )
    if res.returncode != 0:
        pytest.skip(f"libvkr build failed: {res.stderr[:200]}")
    lib = ctypes.CDLL(so)
    lib.vkr_open_scene.restype = ctypes.c_int
    lib.vkr_open_scene.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(VkrSceneHdr), ctypes.c_void_p,
    ]
    lib.vkr_close_scene.argtypes = [ctypes.POINTER(VkrSceneHdr)]
    return lib


def test_reference_loader_opens_our_scene(ref_libvkr, tmp_path):
    from realtimepathtracingresearchframework_tpu.models import procedural, vkr

    scene = procedural.cornell_box()
    path = str(tmp_path / "cornell.vks")
    vkr.write_scene(path, scene)

    hdr = VkrSceneHdr()
    rc = ref_libvkr.vkr_open_scene(path.encode(), ctypes.byref(hdr), None)
    assert rc == 0, f"reference vkr_open_scene failed with {rc}"
    try:
        assert hdr.numMeshes == len(scene.meshes)
        assert hdr.numInstances == len(scene.instances)
        assert hdr.numMaterials == len(scene.materials)
        assert hdr.numTriangles == sum(m.num_triangles for m in scene.meshes)
    finally:
        ref_libvkr.vkr_close_scene(ctypes.byref(hdr))


def test_reference_loader_reads_material_params(ref_libvkr, tmp_path):
    """The emission/base-color side files must parse through the
    reference's vkr_parse_material_param_file (vkr.c:396-452): one float
    per line, '_'-separated names."""
    from realtimepathtracingresearchframework_tpu.models import procedural, vkr

    scene = procedural.cornell_box()
    path = str(tmp_path / "cornell.vks")
    vkr.write_scene(path, scene)
    # the writer must have produced the side files with reference naming
    # (one float per line, '_'-separated) in the texture dir
    names = sorted(os.listdir(tmp_path / "cornell_textures"))
    assert any(n.endswith("_EmissionIntensity.txt") for n in names), names
    for n in names:
        if n.endswith(".txt"):
            for line in open(tmp_path / "cornell_textures" / n):
                float(line)  # exactly one float per line (vkr.c:396-452)

    hdr = VkrSceneHdr()
    rc = ref_libvkr.vkr_open_scene(path.encode(), ctypes.byref(hdr), None)
    assert rc == 0
    try:
        # VkrMaterial layout (vkr.h:154-175): name ptr first, emission
        # block after the 3 standard texture structs — instead of
        # mirroring the whole struct, assert via the emitter count the
        # loader derives: walk materials through the scene struct is
        # overkill here; numMaterials suffices as the parse gate because
        # vkr_open_scene fails on malformed param files
        assert hdr.numMaterials == len(scene.materials)
    finally:
        ref_libvkr.vkr_close_scene(ctypes.byref(hdr))
