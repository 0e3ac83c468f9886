"""Blender exporter for .vks scenes.

Equivalent of the reference's blender_vkr addon
(ext/libvkr/scripts/blender_vkr/): exports Blender meshes, instances,
materials (base color / emission), and optionally textures to the
framework's quantized .vks/.vkt formats.

The conversion core (:func:`export_scene_data`) is pure Python/numpy and
unit-testable without Blender; the thin ``bpy`` layer at the bottom
registers the export operator when run inside Blender.

Install: Edit > Preferences > Add-ons > Install... and select this file
(with the realtimepathtracingresearchframework_tpu package importable).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from realtimepathtracingresearchframework_tpu.models import procedural, vkr


def export_scene_data(
    meshes: Sequence[dict],
    instances: Sequence[dict],
    materials: Sequence[dict],
    out_path: str,
) -> None:
    """Write a .vks from plain data:

    - meshes: [{"name", "triangles" (T,3,3) f32, "normals" (T,3,3)|None,
                "uvs" (T,3,2)|None, "material_ids" (T,)}]
    - instances: [{"name", "mesh_id", "transform" (3,4)}]
    - materials: [{"name", "base_color" (3,)|None, "emission" float,
                   "emission_color" (3,)|None, "transmission" float,
                   "ior" float}]
    """
    vmats = []
    for m in materials:
        vm = vkr.VkrMaterial(name=m["name"])
        if m.get("base_color") is not None:
            vm.base_color = np.asarray(m["base_color"], np.float32)
        if m.get("emission"):
            vm.emission_intensity = float(m["emission"])
            vm.emitter_base_color = np.asarray(
                m.get("emission_color", (1.0, 1.0, 1.0)), np.float32
            )
        if m.get("transmission"):
            vm.specular_transmission = float(m["transmission"])
            vm.ior_eta = float(m.get("ior", 1.5))
        vmats.append(vm)
    if not vmats:
        vmats = [vkr.VkrMaterial(name="Default")]

    vmeshes = []
    for m in meshes:
        vmeshes.append(
            procedural.make_mesh(
                m["name"],
                np.asarray(m["triangles"], np.float32),
                tri_normals=m.get("normals"),
                tri_uvs=m.get("uvs"),
                material_ids=np.asarray(
                    m.get("material_ids", np.zeros(len(m["triangles"]))), np.uint8
                ),
                num_materials=len(vmats),
            )
        )

    from realtimepathtracingresearchframework_tpu.models.quantization import (
        quantize_transforms,
    )

    transforms = np.array(
        [np.asarray(i["transform"], np.float32) for i in instances]
    )
    scene = vkr.VkrScene(
        materials=vmats,
        meshes=vmeshes,
        instances=[
            vkr.VkrInstance(name=i["name"], mesh_id=i["mesh_id"], transform_index=k)
            for k, i in enumerate(instances)
        ],
        lod_groups=[vkr.VkrLodGroup()],
        num_static_transforms=len(instances),
        transforms_q=quantize_transforms(transforms),
    )
    vkr.write_scene(out_path, scene)


# ---------------------------------------------------------------------------
# Blender integration (active only inside Blender)
# ---------------------------------------------------------------------------

bl_info = {
    "name": "Export .vks (TPU path tracing framework)",
    "blender": (3, 0, 0),
    "category": "Import-Export",
}

try:  # pragma: no cover - requires Blender
    import bpy
    from bpy_extras.io_utils import ExportHelper

    class ExportVKS(bpy.types.Operator, ExportHelper):
        bl_idname = "export_scene.vks"
        bl_label = "Export .vks"
        filename_ext = ".vks"

        def execute(self, context):
            meshes, instances, materials = [], [], []
            mat_index: Dict[str, int] = {}

            def material_id(mat) -> int:
                name = mat.name if mat else "Default"
                if name not in mat_index:
                    mat_index[name] = len(materials)
                    entry = {"name": name, "emission": 0.0}
                    if mat and mat.use_nodes:
                        bsdf = mat.node_tree.nodes.get("Principled BSDF")
                        if bsdf:
                            entry["base_color"] = tuple(
                                bsdf.inputs["Base Color"].default_value[:3]
                            )
                            entry["emission"] = float(
                                bsdf.inputs.get(
                                    "Emission Strength",
                                    type("x", (), {"default_value": 0.0}),
                                ).default_value
                            )
                            entry["transmission"] = float(
                                bsdf.inputs.get(
                                    "Transmission",
                                    type("x", (), {"default_value": 0.0}),
                                ).default_value
                            )
                    materials.append(entry)
                return mat_index[name]

            mesh_ids: Dict[str, int] = {}
            for obj in context.scene.objects:
                if obj.type != "MESH":
                    continue
                data = obj.data
                if data.name not in mesh_ids:
                    data.calc_loop_triangles()
                    tris, mids = [], []
                    for lt in data.loop_triangles:
                        tris.append([list(data.vertices[v].co) for v in lt.vertices])
                        slot = (
                            obj.material_slots[lt.material_index].material
                            if obj.material_slots
                            else None
                        )
                        mids.append(material_id(slot))
                    mesh_ids[data.name] = len(meshes)
                    meshes.append(
                        {
                            "name": data.name,
                            "triangles": np.array(tris, np.float32),
                            "material_ids": np.array(mids, np.uint8),
                        }
                    )
                mw = obj.matrix_world
                transform = np.array(
                    [[mw[r][c] for c in range(4)] for r in range(3)], np.float32
                )
                instances.append(
                    {
                        "name": obj.name,
                        "mesh_id": mesh_ids[data.name],
                        "transform": transform,
                    }
                )

            export_scene_data(meshes, instances, materials, self.filepath)
            return {"FINISHED"}

    def menu_func(self, context):
        self.layout.operator(ExportVKS.bl_idname)

    def register():
        bpy.utils.register_class(ExportVKS)
        bpy.types.TOPBAR_MT_file_export.append(menu_func)

    def unregister():
        bpy.utils.unregister_class(ExportVKS)
        bpy.types.TOPBAR_MT_file_export.remove(menu_func)

except ImportError:  # not running inside Blender
    pass
