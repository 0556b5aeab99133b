"""Minimal COLMAP text-model writer/reader.

Covers what datagen_colmap needs (cf. the reference's vendored
scripts/read_write_model.py, used only through write_model with text
format): cameras.txt / images.txt / points3D.txt with SIMPLE_PINHOLE
cameras. Written from scratch against the public COLMAP text format spec.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class Camera:
    id: int
    model: str
    width: int
    height: int
    params: list


@dataclass
class Image:
    id: int
    qvec: list  # (w, x, y, z)
    tvec: list  # (x, y, z)
    camera_id: int
    name: str
    xys: list = field(default_factory=list)
    point3D_ids: list = field(default_factory=list)


@dataclass
class Point3D:
    id: int
    xyz: list
    rgb: list
    error: float = 0.0
    image_ids: list = field(default_factory=list)
    point2D_idxs: list = field(default_factory=list)


def write_model(cameras: dict, images: dict, points3D: dict, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "cameras.txt"), "w") as f:
        f.write("# Camera list with one line of data per camera:\n")
        f.write("#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n")
        f.write(f"# Number of cameras: {len(cameras)}\n")
        for cam in cameras.values():
            params = " ".join(repr(float(p)) for p in cam.params)
            f.write(f"{cam.id} {cam.model} {cam.width} {cam.height} {params}\n")
    with open(os.path.join(path, "images.txt"), "w") as f:
        f.write("# Image list with two lines of data per image:\n")
        f.write("#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n")
        f.write("#   POINTS2D[] as (X, Y, POINT3D_ID)\n")
        f.write(f"# Number of images: {len(images)}\n")
        for im in images.values():
            q = " ".join(repr(float(v)) for v in im.qvec)
            t = " ".join(repr(float(v)) for v in im.tvec)
            f.write(f"{im.id} {q} {t} {im.camera_id} {im.name}\n")
            pts = " ".join(
                f"{float(x)!r} {float(y)!r} {int(pid)}"
                for (x, y), pid in zip(im.xys, im.point3D_ids)
            )
            f.write(pts + "\n")
    with open(os.path.join(path, "points3D.txt"), "w") as f:
        f.write("# 3D point list with one line of data per point:\n")
        f.write(
            "#   POINT3D_ID, X, Y, Z, R, G, B, ERROR, TRACK[] as (IMAGE_ID, POINT2D_IDX)\n"
        )
        f.write(f"# Number of points: {len(points3D)}\n")
        for pt in points3D.values():
            xyz = " ".join(repr(float(v)) for v in pt.xyz)
            # rgb written via str() like the reference's vendored writer —
            # datagen_colmap smuggles the float AABB max through this field
            # (reference datagen_colmap.py:69-73), so ints must not be forced
            rgb = " ".join(
                str(int(v)) if float(v) == int(v) and 0 <= v <= 255 else repr(float(v))
                for v in pt.rgb
            )
            track = " ".join(
                f"{int(i)} {int(j)}" for i, j in zip(pt.image_ids, pt.point2D_idxs)
            )
            f.write(f"{pt.id} {xyz} {rgb} {pt.error!r} {track}\n")


def read_model(path: str):
    cameras, images, points = {}, {}, {}
    with open(os.path.join(path, "cameras.txt")) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            cameras[int(parts[0])] = Camera(
                id=int(parts[0]),
                model=parts[1],
                width=int(parts[2]),
                height=int(parts[3]),
                params=[float(p) for p in parts[4:]],
            )
    with open(os.path.join(path, "images.txt")) as f:
        lines = [l for l in f if not l.startswith("#")]
    for head, pts in zip(lines[0::2], lines[1::2]):
        p = head.split()
        im = Image(
            id=int(p[0]),
            qvec=[float(v) for v in p[1:5]],
            tvec=[float(v) for v in p[5:8]],
            camera_id=int(p[8]),
            name=p[9],
        )
        toks = pts.split()
        im.xys = [(float(toks[i]), float(toks[i + 1])) for i in range(0, len(toks), 3)]
        im.point3D_ids = [int(toks[i + 2]) for i in range(0, len(toks), 3)]
        images[im.id] = im
    with open(os.path.join(path, "points3D.txt")) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            p = line.split()
            points[int(p[0])] = Point3D(
                id=int(p[0]),
                xyz=[float(v) for v in p[1:4]],
                rgb=[float(v) for v in p[4:7]],
                error=float(p[7]),
                image_ids=[int(v) for v in p[8::2]],
                point2D_idxs=[int(v) for v in p[9::2]],
            )
    return cameras, images, points
