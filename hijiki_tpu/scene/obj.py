"""OBJ/MTL loader with the reference's material conventions.

Reimplements ``Scene::from_obj`` (``src/main.rs:414-531``) without tobj:

* MTL materials are dispatched by **name prefix**: ``light*`` -> Emissive with
  power from the nonstandard ``Ke`` key, ``glass*`` -> Dielectric(eta=1.5),
  ``mirror*`` -> Mirror, everything else -> Diffuse(Kd)
  (``src/main.rs:432-458``).
* Faces are fan-triangulated (0,1,2),(0,2,3),... — matching tobj's behaviour
  (the reference's dead quad-recovery code at ``src/main.rs:489-526`` assumes
  exactly this fan order).
* Vertices are deduplicated per distinct (v, vt, vn) triple per model, with
  (0,0) UV fallback when a face has no texcoord (``src/main.rs:465-474``).
* The cbox camera is hardcoded exactly as in the reference
  (``src/main.rs:417-425``).
* Faces appearing before any ``usemtl`` are skipped, mirroring the reference's
  ``material_id: None => continue`` (``src/main.rs:479-482``).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from hijiki_tpu.scene.model import (
    Camera,
    Dielectric,
    Diffuse,
    Emissive,
    Mirror,
    Scene,
    Triangle,
)


class MtlMaterial:
    def __init__(self, name: str):
        self.name = name
        self.kd = (0.0, 0.0, 0.0)
        self.ke: Optional[Tuple[float, float, float]] = None


def parse_mtl(path: str) -> List[MtlMaterial]:
    materials: List[MtlMaterial] = []
    cur: Optional[MtlMaterial] = None
    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "newmtl":
                cur = MtlMaterial(parts[1] if len(parts) > 1 else "")
                materials.append(cur)
            elif cur is None:
                continue
            elif key == "Kd":
                cur.kd = (float(parts[1]), float(parts[2]), float(parts[3]))
            elif key == "Ke":
                cur.ke = (float(parts[1]), float(parts[2]), float(parts[3]))
    return materials


def _dispatch_material(m: MtlMaterial):
    """Name-prefix material dispatch (``src/main.rs:432-458``)."""
    if m.name.startswith("light"):
        if m.ke is None:
            raise ValueError(
                f"emissive material {m.name!r} is missing the 'Ke' key "
                "(required, as in the reference src/main.rs:433-437)"
            )
        return Emissive(m.ke)
    if m.name.startswith("glass"):
        return Dielectric.clear(1.5)
    if m.name.startswith("mirror"):
        return Mirror()
    return Diffuse(m.kd)


def load_obj_scene(path: str) -> Scene:
    """Parse an OBJ (+MTL) file into a Scene, reference-conformant."""
    positions_raw: List[Tuple[float, float, float]] = []
    normals_raw: List[Tuple[float, float, float]] = []
    uvs_raw: List[Tuple[float, float]] = []

    scene = Scene(camera=Camera.cbox_default())

    mtl_order: List[MtlMaterial] = []
    mtl_index: Dict[str, int] = {}

    out_positions: List[Tuple[float, float, float]] = []
    out_normals: List[Tuple[float, float, float]] = []
    out_uvs: List[Tuple[float, float]] = []

    # Per-model dedup of (v, vt, vn) triples; a new 'o'/'g' starts a new model.
    triple_cache: Dict[Tuple[int, int, int], int] = {}
    current_material: Optional[int] = None

    def new_model():
        triple_cache.clear()

    def resolve_index(token: str, arr_len: int) -> int:
        i = int(token)
        return i - 1 if i > 0 else arr_len + i

    def vertex_for(token: str) -> int:
        vs = token.split("/")
        vi = resolve_index(vs[0], len(positions_raw))
        ti = (
            resolve_index(vs[1], len(uvs_raw))
            if len(vs) > 1 and vs[1] != ""
            else -1
        )
        ni = (
            resolve_index(vs[2], len(normals_raw))
            if len(vs) > 2 and vs[2] != ""
            else -1
        )
        key = (vi, ti, ni)
        if key in triple_cache:
            return triple_cache[key]
        idx = len(out_positions)
        out_positions.append(positions_raw[vi])
        out_uvs.append(uvs_raw[ti] if ti >= 0 else (0.0, 0.0))
        if ni < 0:
            raise ValueError(
                "face vertex without a normal: the reference requires normals "
                "(src/main.rs:468 unwrap)"
            )
        out_normals.append(normals_raw[ni])
        triple_cache[key] = idx
        return idx

    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "v":
                positions_raw.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif key == "vn":
                normals_raw.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif key == "vt":
                uvs_raw.append((float(parts[1]), float(parts[2])))
            elif key in ("o", "g"):
                new_model()
            elif key == "mtllib":
                mtl_path = os.path.join(os.path.dirname(path), parts[1])
                for m in parse_mtl(mtl_path):
                    if m.name not in mtl_index:
                        mtl_index[m.name] = len(mtl_order)
                        mtl_order.append(m)
            elif key == "usemtl":
                current_material = mtl_index.get(parts[1])
            elif key == "f":
                if current_material is None:
                    continue
                idxs = [vertex_for(tok) for tok in parts[1:]]
                for k in range(1, len(idxs) - 1):  # fan triangulation
                    scene.add_object(
                        Triangle((idxs[0], idxs[k], idxs[k + 1])), current_material
                    )

    # Materials enter the scene in MTL declaration order, like the reference's
    # iteration over tobj's material list (src/main.rs:431-458).
    for m in mtl_order:
        scene.add_material(_dispatch_material(m))

    scene.positions = np.asarray(out_positions, dtype=np.float32).reshape(-1, 3)
    scene.normals = np.asarray(out_normals, dtype=np.float32).reshape(-1, 3)
    scene.uvs = np.asarray(out_uvs, dtype=np.float32).reshape(-1, 2)
    return scene
