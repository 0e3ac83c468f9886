import numpy as np
import pytest

from realtimepathtracingresearchframework_tpu.models import procedural, texture, vkr
from realtimepathtracingresearchframework_tpu.models.quantization import (
    dequantize_vertices,
    unpack_normal_uv,
)


def test_vks_roundtrip_single_triangle(tmp_path):
    scene = procedural.single_triangle()
    p = str(tmp_path / "tri.vks")
    vkr.write_scene(p, scene)
    back = vkr.open_scene(p)
    assert back.version == 4
    assert len(back.meshes) == 1
    assert back.meshes[0].num_triangles == 1
    np.testing.assert_array_equal(back.meshes[0].vertices_q, scene.meshes[0].vertices_q)
    np.testing.assert_array_equal(
        back.meshes[0].normal_uv_q, scene.meshes[0].normal_uv_q
    )
    v = dequantize_vertices(
        back.meshes[0].vertices_q,
        back.meshes[0].vertex_scale,
        back.meshes[0].vertex_offset,
    )
    expect = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    np.testing.assert_allclose(v, expect, atol=1e-5)


def test_vks_roundtrip_cornell(tmp_path):
    scene = procedural.cornell_box()
    p = str(tmp_path / "cornell.vks")
    vkr.write_scene(p, scene)
    back = vkr.open_scene(p)
    m0, m1 = scene.meshes[0], back.meshes[0]
    assert m1.num_triangles == m0.num_triangles
    np.testing.assert_array_equal(m1.vertices_q, m0.vertices_q)
    np.testing.assert_array_equal(m1.material_ids, m0.material_ids)
    assert [m.name for m in back.materials] == ["White", "Red", "Green", "Light"]
    # emission params persisted via the texture dir
    assert back.materials[3].emission_intensity == pytest.approx(12.0)
    np.testing.assert_allclose(
        back.materials[3].emitter_base_color, [1.0, 0.9, 0.75], atol=1e-6
    )
    # instance transform decodes to identity
    t = back.instance_transform(back.instances[0])
    expect = np.zeros((3, 4), np.float32)
    expect[:, :3] = np.eye(3)
    np.testing.assert_allclose(t, expect, atol=2e-4)


def test_vks_normals_decode(tmp_path):
    scene = procedural.single_triangle()
    p = str(tmp_path / "t.vks")
    vkr.write_scene(p, scene)
    back = vkr.open_scene(p)
    n, uv = unpack_normal_uv(back.meshes[0].normal_uv_q)
    np.testing.assert_allclose(n, [[0, 0, 1]] * 3, atol=1e-4)


def test_vks_multi_instance_groups(tmp_path):
    scene = procedural.single_triangle()
    # add a second instance of the same mesh with a translated transform
    import realtimepathtracingresearchframework_tpu.models.quantization as q

    t = np.zeros((2, 3, 4), np.float32)
    t[:, :, :3] = np.eye(3)
    t[1, 0, 3] = 5.0
    scene.transforms_q = q.quantize_transforms(t)
    scene.num_static_transforms = 2
    scene.instances.append(vkr.VkrInstance(name="tri2", mesh_id=0, transform_index=1))
    p = str(tmp_path / "two.vks")
    vkr.write_scene(p, scene)
    back = vkr.open_scene(p)
    assert len(back.instances) == 2
    t1 = back.instance_transform(back.instances[1])
    assert t1[0, 3] == pytest.approx(5.0, abs=1e-5)


def test_vkrinfo_cli(tmp_path, capsys):
    scene = procedural.cornell_box()
    p = str(tmp_path / "c.vks")
    vkr.write_scene(p, scene)
    assert vkr.main([p]) == 0
    out = capsys.readouterr().out
    assert "triangles:" in out and "cornell" in out


def test_vkt_roundtrip(tmp_path, rng):
    img = (rng.random((32, 64, 4)) * 255).astype(np.uint8)
    p = str(tmp_path / "t.vkt")
    texture.write_vkt(p, img)
    back = texture.read_vkt(p)
    assert back.width == 64 and back.height == 32
    assert back.num_mips == 7  # 64x32 -> ... -> 1x1
    np.testing.assert_array_equal(back.mips[0], img)
    assert back.mips[-1].shape == (1, 1, 4)


def test_vkt_non_pow2_rejected(tmp_path):
    with pytest.raises(ValueError):
        texture.write_vkt(str(tmp_path / "x.vkt"), np.zeros((30, 64, 4), np.uint8))


def test_bc1_decode_solid_color():
    # c0 = c1 = pure red in 565, indices all 0 -> solid red
    import struct

    c = (31 << 11) | (0 << 5) | 0
    block = struct.pack("<HHI", c, c, 0)
    img = texture.decode_bc1(block, 4, 4, opaque=True)
    assert img.shape == (4, 4, 4)
    np.testing.assert_array_equal(img[..., 0], 255)
    np.testing.assert_array_equal(img[..., 1], 0)
    np.testing.assert_array_equal(img[..., 3], 255)


def test_bc5_decode_two_channel():
    import struct

    # r block: a0=200, a1=100 (a0>a1, 8-value mode), all indices 0 -> 200
    # g block: a0=50, a1=25, indices 1 -> 25
    def bc4_block(a0, a1, idx):
        bits = 0
        for i in range(16):
            bits |= idx << (3 * i)
        raw = struct.pack("<BB", a0, a1) + bits.to_bytes(6, "little")
        return raw

    data = bc4_block(200, 100, 0) + bc4_block(50, 25, 1)
    img = texture.decode_bc5(data, 4, 4)
    np.testing.assert_array_equal(img[..., 0], 200)
    np.testing.assert_array_equal(img[..., 1], 25)


def test_mip_chain_energy(rng):
    img = (rng.random((16, 16, 4)) * 255).astype(np.uint8)
    mips = texture.build_mip_chain(img)
    assert len(mips) == 5
    # last mip approximates the mean
    assert abs(float(mips[-1][0, 0, 0]) - float(img[..., 0].mean())) < 4.0


def test_vktensor_roundtrip(tmp_path):
    """.vktensor read/write parity (vkr_open_tensor, vkr.c:627-738)."""
    import numpy as np
    from realtimepathtracingresearchframework_tpu.models import vkr

    w = np.arange(64 * 16, dtype=np.float16).reshape(64, 16)
    t = vkr.VkrTensor(
        dimensions=(64, 16),
        format=vkr.TENSOR_FORMAT_HALF_FLOAT,
        flags=vkr.TENSOR_FLAGS_INPUT_OUTPUT_SPEC,
        num_inputs=16,
        num_input_layer_blocks=1,
        num_outputs=64,
        num_output_layer_blocks=2,
        ratio_descriptor=0.5,
        values=w,
    )
    p = str(tmp_path / "netTensor0.vktensor")
    vkr.write_tensor(p, t)
    r = vkr.read_tensor(p)
    assert r.dimensions == (64, 16)
    assert r.format == vkr.TENSOR_FORMAT_HALF_FLOAT
    assert r.num_inputs == 16 and r.num_outputs == 64
    assert r.ratio_descriptor == 0.5
    np.testing.assert_array_equal(r.values, w)
    # int8 custom-layout payload
    t2 = vkr.VkrTensor(
        dimensions=(8,),
        format=vkr.TENSOR_FORMAT_INT8,
        flags=vkr.TENSOR_FLAGS_CUSTOM_DATA_LAYOUT,
        data=b"\x01\x02\x03\x04",
    )
    p2 = str(tmp_path / "cTensor0.vktensor")
    vkr.write_tensor(p2, t2)
    r2 = vkr.read_tensor(p2)
    assert r2.data == b"\x01\x02\x03\x04"
    assert r2.values is None


def test_material_param_files_use_reference_convention(tmp_path):
    """Param/texture filenames are <Name>_<Param>.<ext> with one float per
    line, matching vkr.c:395-459 exactly (the reference toolchain rejects
    any other delimiter or naming)."""
    scene = procedural.cornell_box()
    p = str(tmp_path / "cornell.vks")
    vkr.write_scene(p, scene)
    tex_dir = tmp_path / "cornell_textures"
    em = tex_dir / "Light_EmissionIntensity.txt"
    assert em.exists(), sorted(x.name for x in tex_dir.iterdir())
    lines = em.read_text().strip().split("\n")
    assert len(lines) == 4
    # each line parses as exactly one float (reference fscanf contract)
    vals = [float(l) for l in lines]
    assert vals[0] == pytest.approx(12.0)
    assert vals[1:] == pytest.approx([1.0, 0.9, 0.75])
    # loader reads the same convention back
    back = vkr.open_scene(p)
    assert back.materials[3].emission_intensity == pytest.approx(12.0)


def test_extended_material_name_keywords(tmp_path):
    """Materials whose names contain _SHADER or _EX are extended even
    without an _Ex.txt rename (vkr.c:538-539): their Feature textures
    load."""
    scene = procedural.single_triangle()
    scene.materials[0].name = "Glass_EX"
    p = str(tmp_path / "t.vks")
    vkr.write_scene(p, scene)
    tex_dir = tmp_path / "t_textures"
    tex_dir.mkdir(exist_ok=True)
    texture.write_vkt(
        str(tex_dir / "Glass_EX_Feature0.vkt"), np.full((4, 4, 4), 128, np.uint8)
    )
    back = vkr.open_scene(p)
    assert len(back.materials[0].features) == 1


def test_multi_segment_material_assignment(tmp_path):
    """Multi-segment meshes take materials from segmentMaterialBaseOffsets,
    not the per-triangle id buffer (scene.cpp:665-676)."""
    from realtimepathtracingresearchframework_tpu.models.scene import Scene

    vs = procedural.single_triangle()
    m = vs.meshes[0]
    # duplicate the triangle into a second segment with a different material
    m.vertices_q = np.concatenate([m.vertices_q, m.vertices_q])
    m.normal_uv_q = np.concatenate([m.normal_uv_q, m.normal_uv_q])
    m.num_triangles = 2
    m.segment_num_triangles = [1, 1]
    m.segment_material_base_offsets = [0, 1]
    # a stale per-triangle buffer that must be IGNORED for multi-segment
    m.material_ids = np.zeros(2, np.uint8)
    m.num_materials_in_range = 2
    vs.materials.append(vkr.VkrMaterial(name="Second"))
    s = Scene()
    s.append_vkr_scene(vs)
    ids = s.meshes[0].geometries[0].material_ids
    np.testing.assert_array_equal(np.asarray(ids), [0, 1])


def test_open_scene_v2_deprecated_order(tmp_path):
    """v2 .vks mesh records store vertex scale/offset AFTER the name and
    id fields (the deprecated order vkr.c:957-967 preserves); parsing
    must not consume them up front, or every later field misaligns."""
    import struct

    tri = np.array([[[-1, -1, 0], [1, -1, 0], [0, 1, 0]]], np.float32)
    mesh = procedural.make_mesh("tri", tri)

    def s(name):
        b = name.encode()
        return struct.pack("<Q", len(b)) + b + b"\0"

    buf = struct.pack("<ii", vkr.VKS_MAGIC, 2)
    buf += struct.pack("<QQQQ", 1, 1, 1, 1)  # meshes, insts, materials, tris
    # mesh record in v2 order: name, (matIdBase, nmir, numTris), scale, offset
    buf += s("tri")
    buf += struct.pack("<iQQ", 0, 1, 1)
    buf += np.asarray(mesh.vertex_scale, "<f4").tobytes()
    buf += np.asarray(mesh.vertex_offset, "<f4").tobytes()
    # instance group in v2 order: name, mesh_id, column-major 4x3 transform
    buf += s("inst")
    buf += struct.pack("<i", 0)
    t = np.zeros((4, 3), np.float32)
    t[:3] = np.eye(3, dtype=np.float32)
    buf += t.astype("<f4").tobytes()
    buf += s("mat0")
    buf += np.asarray(mesh.vertices_q, "<u8").tobytes()
    buf += np.asarray(mesh.normal_uv_q, "<u8").tobytes()
    buf += np.asarray(mesh.material_ids, "<u1").tobytes()

    p = tmp_path / "legacy_v2.vks"
    p.write_bytes(buf)
    sc = vkr.open_scene(str(p), load_textures=False)
    assert sc.version == 2
    m = sc.meshes[0]
    assert m.name == "tri"
    assert int(m.num_triangles) == 1
    np.testing.assert_allclose(m.vertex_scale, mesh.vertex_scale)
    np.testing.assert_allclose(m.vertex_offset, mesh.vertex_offset)
    assert sc.instances[0].name == "inst"
    assert sc.instances[0].mesh_id == 0
    assert sc.materials[0].name == "mat0"
    # decoded geometry round-trips through the quantization
    from realtimepathtracingresearchframework_tpu.models.quantization import (
        dequantize_vertices,
    )

    v = dequantize_vertices(m.vertices_q, m.vertex_scale, m.vertex_offset)
    np.testing.assert_allclose(
        np.sort(v.ravel()), np.sort(tri.reshape(-1, 3).ravel()), atol=2e-4
    )


def test_optimize_mesh_preserves_material_assignment(tmp_path):
    """optimize_mesh collapses segments; the per-triangle material
    assignment under the scene.cpp:665-676 resolution rule must be
    IDENTICAL before and after (segment-offset meshes previously lost
    their offsets)."""
    from realtimepathtracingresearchframework_tpu.models.quantization import (
        dequantize_vertices,
    )

    rng = np.random.default_rng(5)
    tris = rng.uniform(-1, 1, (16, 3, 3)).astype(np.float32)
    mesh = procedural.make_mesh("m", tris, num_materials=1)
    # two segments with distinct base offsets; id buffer deliberately
    # garbage (ignored in the offset path)
    mesh = type(mesh)(**{**mesh.__dict__})
    mesh.segment_num_triangles = [10, 6]
    mesh.segment_material_base_offsets = [2, 5]
    mesh.material_ids = rng.integers(0, 7, 16).astype(np.uint8)
    mesh.num_materials_in_range = 1

    def resolve(m):
        if m.num_segments == 1 and m.num_materials_in_range > 1:
            ids = np.asarray(m.material_ids, np.int64) + int(
                m.material_id_buffer_base
            )
        else:
            ids = np.repeat(
                np.asarray(m.segment_material_base_offsets, np.int64),
                np.asarray(m.segment_num_triangles, np.int64),
            )
        c = dequantize_vertices(
            m.vertices_q, m.vertex_scale, m.vertex_offset
        ).reshape(-1, 3, 3).mean(axis=1)
        return {tuple(np.round(cc, 4)): int(i) for cc, i in zip(c, ids)}

    before = resolve(mesh)
    opt = vkr.optimize_mesh(mesh)
    after = resolve(opt)
    assert after == before

    # uniform-material mesh keeps its single offset too
    mesh2 = procedural.make_mesh("m2", tris, num_materials=1,
                                 material_base=3)
    before2 = resolve(mesh2)
    after2 = resolve(vkr.optimize_mesh(mesh2))
    assert after2 == before2
