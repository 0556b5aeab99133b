"""volpy compatibility shim.

The reference embeds a Python module ``volpy``
(/root/reference/src/bindings.cpp, PYBIND11_EMBEDDED_MODULE) so datagen
scripts drive the renderer in-process. Here the framework IS Python, so
volpy becomes a thin facade over volren_tpu with the same names: Renderer,
Volume, Environment, TransferFunction, vec2..mat4, COLMAP helpers.

Scripts written against the reference's volpy ("import volpy") run after
adding this module under that name — ``bind_renderer`` installs it in
sys.modules (done automatically by the CLI script runner).
"""

from __future__ import annotations

import sys

import numpy as np

from .renderer import Renderer as _CoreRenderer
from .scene.environment import Environment as _Environment
from .scene.transferfunc import TransferFunction as _TransferFunction
from .voldata import Volume as _Volume


# ---- glm-ish vector shims: numpy arrays with .x/.y/.z/.w access ----


class _Vec(np.ndarray):
    _fields = "xyzw"

    def __new__(cls, *args):
        n = cls._n
        if len(args) == 0:
            data = np.zeros(n, np.float32)
        elif len(args) == 1 and np.isscalar(args[0]):
            data = np.full(n, args[0], np.float32)
        elif len(args) == 1:
            data = np.asarray(args[0], np.float32).reshape(n)
        else:
            data = np.asarray(args, np.float32).reshape(n)
        return data.view(cls)

    def __getattr__(self, name):
        if len(name) == 1 and name in self._fields[: self._n]:
            return float(self[self._fields.index(name)])
        raise AttributeError(name)

    def __setattr__(self, name, value):
        if len(name) == 1 and name in self._fields[: self._n]:
            self[self._fields.index(name)] = value
        else:
            super().__setattr__(name, value)

    def normalize(self):
        return self / np.linalg.norm(self)

    def length(self):
        return float(np.linalg.norm(self))


class vec2(_Vec):
    _n = 2


class vec3(_Vec):
    _n = 3


class vec4(_Vec):
    _n = 4


ivec2, ivec3, ivec4 = vec2, vec3, vec4  # float-backed shims are sufficient
uvec2, uvec3, uvec4 = vec2, vec3, vec4


def mat3(*args):
    if not args:
        return np.eye(3, dtype=np.float32)
    if len(args) == 1 and np.isscalar(args[0]):
        return np.eye(3, dtype=np.float32) * args[0]
    return np.asarray(args, np.float32).reshape(3, 3)


def mat4(*args):
    if not args:
        return np.eye(4, dtype=np.float32)
    if len(args) == 1 and np.isscalar(args[0]):
        return np.eye(4, dtype=np.float32) * args[0]
    return np.asarray(args, np.float32).reshape(4, 4)


Volume = _Volume
Environment = _Environment
TransferFunction = _TransferFunction
# buffer-protocol image type of the reference bindings (bindings.cpp:69-80);
# numpy arrays serve the same role here
ImageDataFloat = np.ndarray

_bound: dict = {"renderer": None}


def bind_renderer(renderer) -> None:
    """Install this module as ``volpy`` bound to a live renderer."""
    _bound["renderer"] = renderer
    sys.modules.setdefault("volpy", sys.modules[__name__])


class Renderer:
    """volpy.Renderer facade: property names follow bindings.cpp:150-216.

    Camera fields are exposed as class-level properties on the instance
    (the reference exposes them as statics on the single global camera)."""

    def __init__(self):
        core = _bound["renderer"] or _CoreRenderer()
        _bound["renderer"] = core
        object.__setattr__(self, "_core", core)

    # lifecycle
    def init(self, width: int = 1024, height: int = 1024):
        self._core.init(width, height)

    def commit(self):
        self._core.commit()

    def trace(self):
        self._core.trace()

    def reset(self):
        self._core.reset()

    def scale_and_move_to_unit_cube(self):
        self._core.scale_and_move_to_unit_cube()

    def render(self, spp: int):
        self._core.render(spp)

    def draw(self):
        return self._core.draw()

    @staticmethod
    def resolution():
        return vec2(*_bound["renderer"].resolution)

    def fbo_data(self):
        return self._core.fbo_data()

    def save(self, filename: str = "out.png"):
        self._core.save(filename)

    def save_with_alpha(self, filename: str = "out.png"):
        self._core.save_with_alpha(filename)

    @staticmethod
    def shutdown():
        sys.exit(0)

    # COLMAP helpers (bindings.cpp:196-206)
    @staticmethod
    def colmap_view_trans():
        return vec3(_bound["renderer"].cam.colmap_view_trans())

    @staticmethod
    def colmap_view_rot():
        q = _bound["renderer"].cam.colmap_view_rot()

        class _Q:
            w, x, y, z = (float(q[0]), float(q[1]), float(q[2]), float(q[3]))

        return _Q()

    @staticmethod
    def colmap_focal_length():
        r = _bound["renderer"]
        return r.cam.colmap_focal_length(r.resolution[1])

    @staticmethod
    def cam_aspect():
        w, h = _bound["renderer"].resolution
        return w / h

    # scalar/vector members forwarded to the core renderer
    _FORWARD = {
        "volume",
        "sample",
        "sppx",
        "bounces",
        "seed",
        "tonemap_exposure",
        "tonemap_gamma",
        "tonemapping",
        "show_environment",
        "phase",
        "density_scale",
        "emission_scale",
        "vol_clip_min",
        "vol_clip_max",
    }

    def __getattr__(self, name):
        core = object.__getattribute__(self, "_core")
        if name in Renderer._FORWARD:
            return getattr(core, name)
        if name == "albedo":
            return vec3(core.albedo)
        if name == "environment":
            return core.environment
        if name == "transferfunc":
            return core.transferfunc
        if name in ("cam_pos", "cam_dir", "cam_up"):
            return vec3(getattr(core.cam, name[4:]))
        if name == "cam_fov":
            return core.cam.fov_degree
        if name == "cam_near":
            return core.cam.near
        if name == "cam_far":
            return core.cam.far
        if name == "view_matrix":
            return core.cam.view
        raise AttributeError(name)

    def __setattr__(self, name, value):
        core = object.__getattribute__(self, "_core")
        if name in Renderer._FORWARD:
            setattr(core, name, value)
        elif name == "albedo":
            core.albedo = np.broadcast_to(np.asarray(value, np.float32), (3,)).copy()
        elif name == "environment":
            core.set_environment(value)
        elif name == "transferfunc":
            core.set_transferfunc(value)
        elif name in ("cam_pos", "cam_dir", "cam_up"):
            setattr(core.cam, name[4:], np.asarray(value, np.float32))
            if name == "cam_dir":
                core.cam.dir = core.cam.dir / np.linalg.norm(core.cam.dir)
        elif name == "cam_fov":
            core.cam.fov_degree = float(value)
        else:
            object.__setattr__(self, name, value)
