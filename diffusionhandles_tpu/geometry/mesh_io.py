"""Mesh file I/O: OBJ (read/write incl. per-face UV indices), binary PLY
(read/write), and GLB (read/write).

Replaces reference: diffhandles/mesh_io.py (trimesh-backed glb/ply) and the
hand-written OBJ parser/writer diffhandles/mesh_io_obj.py — self-contained,
no trimesh dependency. GLB export is what the demo webapp uses to ship
colored depth meshes to the browser (reference: webapp/webapps/
diffhandles_webapp.py:132-163).
"""

from __future__ import annotations

import json
import pathlib
import struct
from typing import Optional

import numpy as np

from diffusionhandles_tpu.geometry.mesh import Mesh


# ----------------------------------------------------------------- OBJ ----

def save_mesh_obj(path, mesh: Mesh, uvs: Optional[np.ndarray] = None,
                  face_uv_indices: Optional[np.ndarray] = None) -> None:
    """Write an OBJ. Supports per-face UV indices distinct from vertex
    indices (the feature the reference's hand-written writer exists for,
    mesh_io_obj.py:404)."""
    lines = ["# exported by diffusionhandles_tpu"]
    colors = mesh.vert_attributes.get("color")
    for i, v in enumerate(np.asarray(mesh.verts)):
        if colors is not None:
            c = np.asarray(colors)[i]
            lines.append("v {:.8g} {:.8g} {:.8g} {:.8g} {:.8g} {:.8g}"
                         .format(v[0], v[1], v[2], c[0], c[1],
                                 c[2] if len(c) > 2 else 0.0))
        else:
            lines.append("v {:.8g} {:.8g} {:.8g}".format(*v[:3]))
    if uvs is not None:
        for uv in np.asarray(uvs):
            lines.append("vt {:.8g} {:.8g}".format(uv[0], uv[1]))
    faces = np.asarray(mesh.faces)
    if uvs is not None and face_uv_indices is not None:
        fuv = np.asarray(face_uv_indices)
        for f, t in zip(faces, fuv):
            lines.append("f {}/{} {}/{} {}/{}".format(
                f[0] + 1, t[0] + 1, f[1] + 1, t[1] + 1, f[2] + 1, t[2] + 1))
    else:
        for f in faces:
            lines.append("f {} {} {}".format(f[0] + 1, f[1] + 1, f[2] + 1))
    pathlib.Path(path).write_text("\n".join(lines) + "\n")


def load_mesh_obj(path):
    """Parse an OBJ (v / v-with-color / vt / f, incl. v/vt[/vn] syntax and
    negative indices). Returns (Mesh, uvs or None, face_uv_indices or None).
    """
    verts, colors, uvs = [], [], []
    faces, face_uvs = [], []
    for raw in pathlib.Path(path).read_text().splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        tag = parts[0]
        if tag == "v":
            vals = [float(x) for x in parts[1:]]
            verts.append(vals[:3])
            if len(vals) >= 6:
                colors.append(vals[3:6])
        elif tag == "vt":
            uvs.append([float(parts[1]), float(parts[2])])
        elif tag == "f":
            idx, uvi = [], []
            for p in parts[1:]:
                comps = p.split("/")
                vi = int(comps[0])
                idx.append(vi - 1 if vi > 0 else len(verts) + vi)
                if len(comps) > 1 and comps[1]:
                    ti = int(comps[1])
                    uvi.append(ti - 1 if ti > 0 else len(uvs) + ti)
            # triangulate fans for polygons
            for k in range(1, len(idx) - 1):
                faces.append([idx[0], idx[k], idx[k + 1]])
                if len(uvi) == len(idx):
                    face_uvs.append([uvi[0], uvi[k], uvi[k + 1]])
    mesh = Mesh(verts=np.asarray(verts, np.float32),
                faces=np.asarray(faces, np.int32).reshape(-1, 3))
    if colors and len(colors) == len(verts):
        mesh.add_vert_attribute("color", np.asarray(colors, np.float32))
    uv_arr = np.asarray(uvs, np.float32) if uvs else None
    fuv_arr = (np.asarray(face_uvs, np.int32)
               if face_uvs and len(face_uvs) == len(faces) else None)
    return mesh, uv_arr, fuv_arr


# ----------------------------------------------------------------- PLY ----

def save_mesh_ply(path, mesh: Mesh) -> None:
    """Binary little-endian PLY with optional uchar vertex colors."""
    verts = np.asarray(mesh.verts, np.float32)
    faces = np.asarray(mesh.faces, np.int32)
    colors = mesh.vert_attributes.get("color")
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {len(verts)}",
              "property float x", "property float y", "property float z"]
    if colors is not None:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header += [f"element face {len(faces)}",
               "property list uchar int vertex_indices", "end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if colors is not None:
            c8 = np.clip(np.asarray(colors)[:, :3] * 255, 0,
                         255).astype(np.uint8)
            for v, c in zip(verts, c8):
                f.write(struct.pack("<fff", *v) + struct.pack("BBB", *c))
        else:
            f.write(verts.astype("<f4").tobytes())
        for face in faces:
            f.write(struct.pack("<Biii", 3, *face))


def load_mesh_ply(path) -> Mesh:
    """Binary little-endian PLY reader (x/y/z float + optional uchar rgb)."""
    with open(path, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode()
    body = data[end:]
    n_vert = n_face = 0
    vert_props = []
    cur = None
    for line in header.splitlines():
        p = line.split()
        if not p:
            continue
        if p[0] == "element":
            cur = p[1]
            if p[1] == "vertex":
                n_vert = int(p[2])
            elif p[1] == "face":
                n_face = int(p[2])
        elif p[0] == "property" and cur == "vertex" and p[1] != "list":
            vert_props.append((p[1], p[2]))
    sizes = {"float": 4, "uchar": 1, "int": 4, "double": 8}
    stride = sum(sizes[t] for t, _ in vert_props)
    verts = np.zeros((n_vert, 3), np.float32)
    colors = np.zeros((n_vert, 3), np.float32)
    has_color = any(n in ("red", "r") for _, n in vert_props)
    off = 0
    for i in range(n_vert):
        rec = body[off:off + stride]
        o = 0
        vals = {}
        for t, name in vert_props:
            if t == "float":
                vals[name] = struct.unpack_from("<f", rec, o)[0]
            elif t == "uchar":
                vals[name] = rec[o]
            elif t == "int":
                vals[name] = struct.unpack_from("<i", rec, o)[0]
            elif t == "double":
                vals[name] = struct.unpack_from("<d", rec, o)[0]
            o += sizes[t]
        verts[i] = [vals["x"], vals["y"], vals["z"]]
        if has_color:
            colors[i] = [vals.get("red", 0) / 255.0,
                         vals.get("green", 0) / 255.0,
                         vals.get("blue", 0) / 255.0]
        off += stride
    faces = np.zeros((n_face, 3), np.int32)
    for i in range(n_face):
        cnt = body[off]
        off += 1
        idx = struct.unpack_from(f"<{cnt}i", body, off)
        off += 4 * cnt
        faces[i] = idx[:3]
    mesh = Mesh(verts=verts, faces=faces)
    if has_color:
        mesh.add_vert_attribute("color", colors)
    return mesh


# ----------------------------------------------------------------- GLB ----

def save_mesh_glb(path, mesh: Mesh) -> None:
    """Minimal binary glTF 2.0 export: positions, indices, optional COLOR_0.
    (The demo UI loads these colored depth meshes,
    reference: diffhandles_webapp.py:132-163.)"""
    verts = np.asarray(mesh.verts, np.float32)
    faces = np.asarray(mesh.faces, np.uint32)
    colors = mesh.vert_attributes.get("color")

    def pad4(b, fill=b"\x00"):
        return b + fill * ((4 - len(b) % 4) % 4)

    buffers = []
    views = []
    accessors = []

    def add_buffer(arr, target, comp_type, acc_type, normalized=False):
        raw = pad4(arr.tobytes())
        offset = sum(len(b) for b in buffers)
        buffers.append(raw)
        views.append({"buffer": 0, "byteOffset": offset,
                      "byteLength": len(arr.tobytes()), "target": target})
        acc = {"bufferView": len(views) - 1, "componentType": comp_type,
               "count": int(arr.shape[0]), "type": acc_type}
        if acc_type == "VEC3" and comp_type == 5126:
            acc["min"] = [float(x) for x in arr.min(axis=0)]
            acc["max"] = [float(x) for x in arr.max(axis=0)]
        if normalized:
            acc["normalized"] = True
        accessors.append(acc)
        return len(accessors) - 1

    pos_acc = add_buffer(verts, 34962, 5126, "VEC3")
    idx_acc = add_buffer(faces.reshape(-1), 34963, 5125, "SCALAR")
    attrs = {"POSITION": pos_acc}
    if colors is not None:
        c = np.asarray(colors, np.float32)
        if c.shape[1] == 2:
            c = np.concatenate([c, np.zeros_like(c[:, :1])], axis=-1)
        attrs["COLOR_0"] = add_buffer(c[:, :3].astype(np.float32), 34962,
                                      5126, "VEC3")
    gltf = {
        "asset": {"version": "2.0", "generator": "diffusionhandles_tpu"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": attrs,
                                    "indices": idx_acc, "mode": 4}]}],
        "bufferViews": views,
        "accessors": accessors,
        "buffers": [{"byteLength": sum(len(b) for b in buffers)}],
    }
    json_chunk = pad4(json.dumps(gltf, separators=(",", ":")).encode(),
                      b" ")
    bin_chunk = b"".join(buffers)
    total = 12 + 8 + len(json_chunk) + 8 + len(bin_chunk)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(json_chunk), 0x4E4F534A))
        f.write(json_chunk)
        f.write(struct.pack("<II", len(bin_chunk), 0x004E4942))
        f.write(bin_chunk)


_GLB_COMP_DTYPES = {5120: np.int8, 5121: np.uint8, 5122: np.int16,
                    5123: np.uint16, 5125: np.uint32, 5126: np.float32}
_GLB_TYPE_DIMS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4}


def load_mesh_glb(path) -> Mesh:
    """Binary glTF 2.0 reader (positions, indices, COLOR_0/TEXCOORD_0 vertex
    attributes of the first primitive). Round-trips save_mesh_glb and reads
    single-mesh glb files from other exporters (the reference relies on
    trimesh.load_mesh for this, reference: diffhandles/mesh_io.py:17-28)."""
    with open(path, "rb") as f:
        magic, version, _total = struct.unpack("<III", f.read(12))
        if magic != 0x46546C67:
            raise ValueError(f"{path}: not a GLB file")
        json_chunk = None
        bin_chunk = b""
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            length, ctype = struct.unpack("<II", header)
            data = f.read(length)
            if ctype == 0x4E4F534A:
                json_chunk = data
            elif ctype == 0x004E4942:
                bin_chunk = data
    if json_chunk is None:
        raise ValueError(f"{path}: missing GLB JSON chunk")
    gltf = json.loads(json_chunk.decode())

    def read_accessor(idx):
        acc = gltf["accessors"][idx]
        view = gltf["bufferViews"][acc["bufferView"]]
        dtype = _GLB_COMP_DTYPES[acc["componentType"]]
        dims = _GLB_TYPE_DIMS[acc["type"]]
        count = acc["count"]
        start = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
        stride = view.get("byteStride")
        itemsize = np.dtype(dtype).itemsize * dims
        if stride and stride != itemsize:
            rows = [np.frombuffer(bin_chunk, dtype,
                                  count=dims, offset=start + i * stride)
                    for i in range(count)]
            arr = np.stack(rows)
        else:
            arr = np.frombuffer(bin_chunk, dtype,
                                count=count * dims, offset=start)
            arr = arr.reshape(count, dims) if dims > 1 else arr
        return arr

    prim = gltf["meshes"][0]["primitives"][0]
    attrs = prim["attributes"]
    verts = np.asarray(read_accessor(attrs["POSITION"]), np.float32)
    idx = read_accessor(prim["indices"]).astype(np.int32)
    faces = idx.reshape(-1, 3)
    mesh = Mesh(verts=verts, faces=faces)
    if "COLOR_0" in attrs:
        c = read_accessor(attrs["COLOR_0"]).astype(np.float32)
        acc = gltf["accessors"][attrs["COLOR_0"]]
        if acc["componentType"] == 5121:
            c = c / 255.0
        elif acc["componentType"] == 5123:
            c = c / 65535.0
        mesh.vert_attributes["color"] = c[:, :3]
    if "TEXCOORD_0" in attrs:
        mesh.vert_attributes["uv"] = read_accessor(
            attrs["TEXCOORD_0"]).astype(np.float32)
    return mesh


def save_mesh(path, mesh: Mesh, **kwargs) -> None:
    """Dispatch by extension (reference: mesh_io.py save_mesh)."""
    suffix = pathlib.Path(path).suffix.lower()
    if suffix == ".obj":
        save_mesh_obj(path, mesh, **kwargs)
    elif suffix == ".ply":
        save_mesh_ply(path, mesh)
    elif suffix == ".glb":
        save_mesh_glb(path, mesh)
    else:
        raise ValueError(f"Unsupported mesh format: {suffix}")


def load_mesh(path) -> Mesh:
    """Dispatch by extension (reference: mesh_io.py load_mesh)."""
    suffix = pathlib.Path(path).suffix.lower()
    if suffix == ".obj":
        return load_mesh_obj(path)[0]
    if suffix == ".ply":
        return load_mesh_ply(path)
    if suffix == ".glb":
        return load_mesh_glb(path)
    raise ValueError(f"Unsupported mesh format: {suffix}")
