"""Self-contained PLY reader/writer.

Covers the reference's IO surface (``utils/pc_utils.py:129-296``):
vertices with optional normals/colors, faces with optional colors, and
colormap-property variants — without the ``plyfile`` dependency (not in
this image).  Reads ascii and binary little/big-endian; writes binary
little-endian, matching the reference's ``text=False`` output.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_PLY_TO_NP = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}
_NP_TO_PLY = {
    "int8": "char", "uint8": "uchar", "int16": "short", "uint16": "ushort",
    "int32": "int", "uint32": "uint", "float32": "float", "float64": "double",
}


class PlyElement:
    def __init__(self, name: str, count: int):
        self.name = name
        self.count = count
        # (prop_name, np_dtype) or (prop_name, (count_dtype, item_dtype))
        self.properties: List[Tuple[str, object]] = []


def _parse_header(f) -> Tuple[List[PlyElement], str]:
    magic = f.readline().strip()
    if magic != b"ply":
        raise ValueError("not a PLY file")
    fmt = None
    elements: List[PlyElement] = []
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unexpected EOF in PLY header")
        parts = line.decode("ascii", "replace").strip().split()
        if not parts or parts[0] == "comment":
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append(PlyElement(parts[1], int(parts[2])))
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1].properties.append(
                    (parts[4], (_PLY_TO_NP[parts[2]], _PLY_TO_NP[parts[3]])))
            else:
                elements[-1].properties.append((parts[-1],
                                                _PLY_TO_NP[parts[1]]))
        elif parts[0] == "end_header":
            break
    if fmt is None:
        raise ValueError("PLY header missing format")
    return elements, fmt


def read_ply_data(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Read every element into ``{element: {property: array}}``.
    List properties come back as 2D arrays (fixed-length assumed)."""
    with open(path, "rb") as f:
        elements, fmt = _parse_header(f)
        if fmt == "ascii":
            body = f.read().decode("ascii").split()
            pos = 0
            out: Dict[str, Dict[str, np.ndarray]] = {}
            for el in elements:
                cols: Dict[str, list] = {p[0]: [] for p in el.properties}
                for _ in range(el.count):
                    for pname, pdtype in el.properties:
                        if isinstance(pdtype, tuple):
                            cnt = int(body[pos]); pos += 1
                            cols[pname].append(
                                [float(body[pos + j]) for j in range(cnt)])
                            pos += cnt
                        else:
                            cols[pname].append(float(body[pos])); pos += 1
                out[el.name] = {
                    k: np.asarray(v, dtype=np.float64 if not isinstance(
                        dict(el.properties)[k], tuple) else None)
                    .astype(_ascii_dtype(dict(el.properties)[k]))
                    for k, v in cols.items()}
            return out
        endian = "<" if fmt == "binary_little_endian" else ">"
        out = {}
        for el in elements:
            list_props = [p for p in el.properties if isinstance(p[1], tuple)]
            if not list_props:
                dt = np.dtype([(n, endian + t) for n, t in el.properties])
                rec = np.frombuffer(f.read(dt.itemsize * el.count), dtype=dt)
                out[el.name] = {n: rec[n].copy() for n, _ in el.properties}
            else:
                # assume homogeneous list lengths (faces): peek first count
                rows = []
                for _ in range(el.count):
                    row = {}
                    for pname, pdtype in el.properties:
                        if isinstance(pdtype, tuple):
                            cdt, idt = pdtype
                            cnt = int(np.frombuffer(
                                f.read(np.dtype(cdt).itemsize),
                                dtype=endian + cdt)[0])
                            row[pname] = np.frombuffer(
                                f.read(np.dtype(idt).itemsize * cnt),
                                dtype=endian + idt).copy()
                        else:
                            row[pname] = np.frombuffer(
                                f.read(np.dtype(pdtype).itemsize),
                                dtype=endian + pdtype)[0]
                    rows.append(row)
                out[el.name] = {
                    pname: np.stack([r[pname] for r in rows])
                    for pname, _ in el.properties}
        return out


def _ascii_dtype(pdtype):
    if isinstance(pdtype, tuple):
        return _PLY_TO_NP[pdtype[1]] if pdtype[1] in _PLY_TO_NP else pdtype[1]
    return pdtype


def read_ply(path: str, count: Optional[int] = None) -> np.ndarray:
    """Vertices (+normals when present) as ``(N, 3 or 6)``; pads with
    random repeats / downsamples to ``count`` like the reference
    (``utils/pc_utils.py:164-187``)."""
    data = read_ply_data(path)["vertex"]
    cols = [data["x"], data["y"], data["z"]]
    if "nx" in data:
        cols += [data["nx"], data["ny"], data["nz"]]
    points = np.stack(cols, axis=1).astype(np.float32)
    if count is not None:
        points = _resize_count(points, count)
    return points


def read_ply_with_color(path: str, count: Optional[int] = None):
    data = read_ply_data(path)["vertex"]
    cols = [data["x"], data["y"], data["z"]]
    if "nx" in data:
        cols += [data["nx"], data["ny"], data["nz"]]
    points = np.stack(cols, axis=1).astype(np.float32)
    colors = None
    if "red" in data:
        ccols = [data["red"], data["green"], data["blue"]]
        if "alpha" in data:
            ccols.append(data["alpha"])
        colors = np.stack(ccols, axis=1).astype(np.float32) / 255.0
    if count is not None:
        points = _resize_count(points, count)
    return points, colors


def _resize_count(points: np.ndarray, count: int) -> np.ndarray:
    from threepu.utils.pc_utils import downsample_points
    if count > points.shape[0]:
        extra = points[np.random.choice(points.shape[0],
                                        count - points.shape[0])]
        return np.concatenate([points, extra], axis=0)
    if count < points.shape[0]:
        return downsample_points(points, count)
    return points


def _write_header(f, elements: Sequence[Tuple[str, int, List[Tuple[str, str]]]]):
    f.write(b"ply\nformat binary_little_endian 1.0\n")
    f.write(b"comment produced by threepu\n")
    for name, count, props in elements:
        f.write(f"element {name} {count}\n".encode())
        for pname, pdtype in props:
            if pdtype.startswith("list:"):
                _, cdt, idt = pdtype.split(":")
                f.write(f"property list {_NP_TO_PLY[cdt]} "
                        f"{_NP_TO_PLY[idt]} {pname}\n".encode())
            else:
                f.write(f"property {_NP_TO_PLY[pdtype]} {pname}\n".encode())
    f.write(b"end_header\n")


def save_ply(points: np.ndarray, filename: str,
             colors: Optional[np.ndarray] = None,
             normals: Optional[np.ndarray] = None) -> None:
    """Write vertices (+optional normals/colors), binary little-endian
    (reference ``utils/pc_utils.py:244-285``)."""
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    props = [("x", "float32"), ("y", "float32"), ("z", "float32")]
    fields = [points[:, :3]]
    if normals is not None:
        props += [("nx", "float32"), ("ny", "float32"), ("nz", "float32")]
        fields.append(np.asarray(normals, np.float32)[:, :3])
    if colors is not None:
        colors = np.asarray(colors)
        if colors.max() <= 1:
            colors = colors * 255
        colors = colors.astype(np.uint8)
        names = ["red", "green", "blue", "alpha"][:colors.shape[1]]
        props += [(nm, "uint8") for nm in names]
        fields.append(colors)

    dt = np.dtype([(nm, t) for nm, t in props])
    rec = np.empty(n, dtype=dt)
    col = 0
    for field in fields:
        for j in range(field.shape[1]):
            rec[props[col][0]] = field[:, j]
            col += 1

    dirname = os.path.dirname(filename)
    if dirname:
        # exist_ok: concurrent writers (the CLI saves the *_input.ply
        # and output ply for one shape from a worker pool) may race on
        # the first file of a new result directory
        os.makedirs(dirname, exist_ok=True)
    with open(filename, "wb") as f:
        _write_header(f, [("vertex", n, props)])
        f.write(rec.tobytes())


def save_ply_property(points, prop, filename, property_max=None,
                      normals=None, cmap_name="Set1"):
    """Color vertices by a scalar property through a matplotlib colormap
    (reference ``utils/pc_utils.py:288-296``)."""
    from matplotlib import cm
    prop = np.asarray(prop, np.float64)
    if property_max is None:
        property_max = np.amax(prop, axis=0)
    cmap = cm.get_cmap(cmap_name)
    colors = np.asarray(cmap(prop / property_max))[:, :3]
    save_ply(points, filename, colors=colors, normals=normals)


def save_ply_with_face(points, faces, filename,
                       colors: Optional[np.ndarray] = None) -> None:
    """Vertices + triangle faces with optional per-face colors
    (reference ``utils/pc_utils.py:199-220``)."""
    points = np.asarray(points, np.float32)
    faces = np.asarray(faces, np.int32)
    vprops = [("x", "float32"), ("y", "float32"), ("z", "float32")]
    fprops = [("vertex_indices", "list:uint8:int32")]
    if colors is not None:
        colors = np.asarray(colors)
        if colors.max() <= 1:
            colors = colors * 255
        colors = colors.astype(np.uint8)
        fprops += [("red", "uint8"), ("green", "uint8"), ("blue", "uint8")]

    dirname = os.path.dirname(filename)
    if dirname:
        os.makedirs(dirname, exist_ok=True)
    with open(filename, "wb") as f:
        _write_header(f, [("vertex", points.shape[0], vprops),
                          ("face", faces.shape[0], fprops)])
        rec = np.empty(points.shape[0],
                       dtype=[("x", "f4"), ("y", "f4"), ("z", "f4")])
        rec["x"], rec["y"], rec["z"] = points[:, 0], points[:, 1], points[:, 2]
        f.write(rec.tobytes())
        for i in range(faces.shape[0]):
            f.write(np.uint8(faces.shape[1]).tobytes())
            f.write(faces[i].astype("<i4").tobytes())
            if colors is not None:
                f.write(colors[i, :3].tobytes())


def save_ply_with_face_property(points, faces, prop, property_max,
                                filename, cmap_name="Set1"):
    from matplotlib import cm
    cmap = cm.get_cmap(cmap_name)
    colors = np.asarray(cmap(np.asarray(prop, np.float64) / property_max)
                        )[:, :3]
    save_ply_with_face(points, faces, filename, colors)
