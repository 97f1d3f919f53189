"""World synthesis: robot MJCF + task geoms -> one compiled scene.

Plays the role of the reference's World/Robot classes
(reference: safe_rl_envs/safe_rl_envs/envs/world.py:51-445), rebuilt on
stdlib xml.etree (the reference uses xmltodict, which is not available and
not needed). The output is a mujoco.MjModel compiled once on the host; the
device pipeline consumes it through guardx_tpu.physics.load_model.

Key structural fact reproduced from the reference: every immovable task geom
(goal marker, hazards) is attached to its own body with two *slide* joints
<name>_x / <name>_y (reference world.py:316-323), which is how layouts are
repositioned via qpos at reset time without recompiling the model.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np
import mujoco

BASE_DIR = os.path.join(os.path.dirname(__file__), "xmls")


def rot2quat(theta):
    """Quaternion for a rotation about the Z axis only (reference world.py:46-48)."""
    return np.array([np.cos(theta / 2), 0, 0, np.sin(theta / 2)], dtype=np.float64)


def _fmt(v):
    if isinstance(v, (int, float, str)):
        return str(v)
    return " ".join(str(x) for x in np.asarray(v).flatten())


class Robot:
    """Robot base introspection: nq/nv/nu and z-height of the root body
    (reference world.py:422-445)."""

    def __init__(self, path: str):
        base = path
        if not os.path.isabs(path):
            # accept both 'xmls/point.xml' (reference convention) and bare
            # 'point.xml'
            base = os.path.join(BASE_DIR, os.path.basename(path))
        self.path = base
        self.mj_model = mujoco.MjModel.from_xml_path(base)
        self.z_height = float(self.mj_model.body("robot").pos[2])
        self.nq = self.mj_model.nq
        self.nv = self.mj_model.nv
        self.nu = self.mj_model.nu


class World:
    """Builds the scene XML: robot base + goal/hazard bodies with slide
    joints. `build()` compiles and exposes `model` / `xml_string`."""

    def __init__(self, robot_base: str, geoms: dict, objects: dict | None = None,
                 robot_xy=(0.0, 0.0), robot_rot: float = 0.0,
                 floor_size=(3.5, 3.5, 0.1)):
        self.robot = Robot(robot_base)
        self.geoms = geoms or {}
        self.objects = objects or {}
        self.robot_xy = np.asarray(robot_xy, dtype=np.float64)
        self.robot_rot = float(robot_rot)
        self.floor_size = floor_size
        self.model = None
        self.xml_string = None

    def build(self) -> mujoco.MjModel:
        tree = ET.parse(self.robot.path)
        root = tree.getroot()
        worldbody = root.find("worldbody")

        # place the robot at its start pose
        robot_body = None
        for body in worldbody.findall("body"):
            if body.get("name") == "robot":
                robot_body = body
                break
        assert robot_body is not None, "robot base XML must contain body 'robot'"
        robot_body.set(
            "pos", _fmt(np.r_[self.robot_xy, self.robot.z_height])
        )
        robot_body.set("quat", _fmt(rot2quat(self.robot_rot)))

        # ensure a floor exists
        has_floor = any(
            g.get("name") == "floor" for g in worldbody.findall("geom")
        )
        if not has_floor:
            ET.SubElement(
                worldbody, "geom",
                name="floor", type="plane", condim="3", conaffinity="1",
                size=_fmt(self.floor_size),
            )

        # movable objects (push-box etc.): free-jointed bodies
        for name, obj in self.objects.items():
            body = ET.SubElement(
                worldbody, "body", name=name,
                pos=_fmt(obj["pos"]), quat=_fmt(rot2quat(obj.get("rot", 0.0))),
            )
            ET.SubElement(body, "freejoint", name=name)
            ET.SubElement(
                body, "geom", name=name, type=obj["type"],
                size=_fmt(obj["size"]), density=_fmt(obj.get("density", 1.0)),
                rgba=_fmt(obj.get("rgba", (1, 1, 1, 1))),
                group=_fmt(obj.get("group", 0)),
            )

        # immovable task geoms: bodies with two slide joints so that reset
        # kernels reposition them through qpos (reference world.py:316-323)
        for name, geom in self.geoms.items():
            body = ET.SubElement(
                worldbody, "body", name=name,
                pos=_fmt(geom["pos"]), quat=_fmt(rot2quat(geom.get("rot", 0.0))),
            )
            ET.SubElement(
                body, "joint", type="slide", axis="1 0 0",
                name=f"{name}_x", damping="1", limited="false",
            )
            ET.SubElement(
                body, "joint", type="slide", axis="0 1 0",
                name=f"{name}_y", damping="1", limited="false",
            )
            ET.SubElement(
                body, "geom", name=name, type=geom["type"],
                size=_fmt(geom["size"]),
                rgba=_fmt(geom.get("rgba", (1, 1, 1, 1))),
                group=_fmt(geom.get("group", 0)),
                contype=_fmt(geom.get("contype", 1)),
                conaffinity=_fmt(geom.get("conaffinity", 1)),
            )

        self.xml_string = ET.tostring(root, encoding="unicode")
        # debug dump of the compiled world (reference world.py:331-332
        # writes result.xml unconditionally; here opt-in via env var to
        # keep the build side-effect free by default)
        dump = os.environ.get("GUARDX_WORLD_DUMP")
        if dump:
            path = dump if dump != "1" else "result.xml"
            with open(path, "w") as f:
                f.write(self.xml_string)
        self.model = mujoco.MjModel.from_xml_string(self.xml_string)
        return self.model
