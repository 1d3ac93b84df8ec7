"""Minimal URDF parser producing plain-Python robot descriptions.

TPU-native replacement for the reference's use of ``urdf_parser_py`` +
adam-robotics model loading (reference env_model.py:40-53, parser.py:80-82).
Only the subset of URDF consumed by the reference stack is supported:
links with <inertial>, and revolute/prismatic/fixed joints with <origin>,
<axis> and <limit>.

The parsed description is converted into array form by
:mod:`safe_mpc_tpu.models.robot`; inertial parameters become *runtime*
arrays there so that model-noise ensembles are batched parameters instead
of rewritten URDF text files (reference utils.py:126-171).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

import numpy as np

ASSETS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")


@dataclass
class UrdfInertial:
    mass: float
    com: np.ndarray           # (3,) center of mass in link frame
    inertia: np.ndarray       # (3,3) inertia tensor about the COM, link frame


@dataclass
class UrdfLink:
    name: str
    inertial: UrdfInertial | None


@dataclass
class UrdfJoint:
    name: str
    type: str                 # 'revolute' | 'prismatic' | 'fixed' | 'continuous'
    parent: str
    child: str
    origin_xyz: np.ndarray    # (3,)
    origin_rpy: np.ndarray    # (3,)
    axis: np.ndarray          # (3,)
    lower: float = 0.0
    upper: float = 0.0
    velocity: float = 0.0
    effort: float = 0.0


@dataclass
class UrdfRobot:
    name: str
    links: list[UrdfLink] = field(default_factory=list)
    joints: list[UrdfJoint] = field(default_factory=list)

    def link(self, name: str) -> UrdfLink:
        for l in self.links:
            if l.name == name:
                return l
        raise KeyError(f"link {name!r} not in URDF {self.name!r}")

    def joint(self, name: str) -> UrdfJoint:
        for j in self.joints:
            if j.name == name:
                return j
        raise KeyError(f"joint {name!r} not in URDF {self.name!r}")

    def child_joint_of(self, link_name: str) -> UrdfJoint | None:
        """First joint whose parent link is ``link_name`` (document order)."""
        for j in self.joints:
            if j.parent == link_name:
                return j
        return None

    def parent_joint_of(self, link_name: str) -> UrdfJoint | None:
        for j in self.joints:
            if j.child == link_name:
                return j
        return None

    def root_link(self) -> str:
        children = {j.child for j in self.joints}
        for l in self.links:
            if l.name not in children:
                return l.name
        raise ValueError("URDF has no root link")

    def movable_joints(self) -> list[UrdfJoint]:
        return [j for j in self.joints if j.type != "fixed"]


def _parse_vec(s: str | None, default: str = "0 0 0") -> np.ndarray:
    return np.array([float(v) for v in (s or default).split()], dtype=np.float64)


def _parse_inertial(node: ET.Element | None) -> UrdfInertial | None:
    if node is None:
        return None
    origin = node.find("origin")
    com = _parse_vec(origin.get("xyz") if origin is not None else None)
    mass_node = node.find("mass")
    mass = float(mass_node.get("value")) if mass_node is not None else 0.0
    inode = node.find("inertia")
    if inode is not None:
        ixx = float(inode.get("ixx", 0.0))
        iyy = float(inode.get("iyy", 0.0))
        izz = float(inode.get("izz", 0.0))
        ixy = float(inode.get("ixy", 0.0))
        ixz = float(inode.get("ixz", 0.0))
        iyz = float(inode.get("iyz", 0.0))
        inertia = np.array(
            [[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]], dtype=np.float64
        )
    else:
        inertia = np.zeros((3, 3))
    return UrdfInertial(mass=mass, com=com, inertia=inertia)


def parse_urdf(path_or_string: str) -> UrdfRobot:
    """Parse a URDF file path or an XML string into :class:`UrdfRobot`."""
    if "<robot" in path_or_string:
        root = ET.fromstring(path_or_string)
    else:
        root = ET.parse(path_or_string).getroot()
    robot = UrdfRobot(name=root.get("name", "robot"))
    for lnode in root.findall("link"):
        robot.links.append(
            UrdfLink(name=lnode.get("name"), inertial=_parse_inertial(lnode.find("inertial")))
        )
    for jnode in root.findall("joint"):
        origin = jnode.find("origin")
        axis = jnode.find("axis")
        limit = jnode.find("limit")
        joint = UrdfJoint(
            name=jnode.get("name"),
            type=jnode.get("type"),
            parent=jnode.find("parent").get("link"),
            child=jnode.find("child").get("link"),
            origin_xyz=_parse_vec(origin.get("xyz") if origin is not None else None),
            origin_rpy=_parse_vec(origin.get("rpy") if origin is not None else None),
            axis=_parse_vec(axis.get("xyz") if axis is not None else None, "1 0 0"),
        )
        if limit is not None:
            joint.lower = float(limit.get("lower", 0.0))
            joint.upper = float(limit.get("upper", 0.0))
            joint.velocity = float(limit.get("velocity", 0.0))
            joint.effort = float(limit.get("effort", 0.0))
        if joint.type == "continuous":
            joint.type = "revolute"
            joint.lower, joint.upper = -np.pi, np.pi
        robot.joints.append(joint)
    return robot


def asset_path(name: str) -> str:
    """Path of a bundled robot asset, e.g. ``asset_path('z1')``."""
    return os.path.join(ASSETS_DIR, f"{name}.urdf")
