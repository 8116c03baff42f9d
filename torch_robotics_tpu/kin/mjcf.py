"""MJCF model loading (optional, requires dm_control).

Counterpart of the reference ``MJCFRobotModel``
(/root/reference/torch_robotics/torch_kinematics_tree/models/utils.py:31-178
— marked "does not work correctly now" there).  This loader converts an MJCF
body tree into the same intermediate ``UrdfRobot`` structure the URDF path
uses (joint at body origin, hinge -> revolute, slide -> prismatic) and
compiles it with ``KinematicModel.from_urdf_robot``.  Body-frame ``pos``
offsets are folded into the joint origin (the reference drops them, which is
part of why its MJCF path is broken).
"""
from __future__ import annotations

from .model import KinematicModel
from .urdf import UrdfJoint, UrdfLink, UrdfRobot

__all__ = ["parse_mjcf", "kinematic_model_from_mjcf"]

_JOINT_MAP = {"hinge": "revolute", "slide": "prismatic", None: "revolute"}


def parse_mjcf(path) -> UrdfRobot:
    try:
        from dm_control import mjcf
    except ImportError as e:  # pragma: no cover
        raise ImportError("MJCF support requires dm_control") from e

    root = mjcf.from_file(str(path))
    links = [UrdfLink(name="worldbody")]
    joints = []

    def visit(body, parent_name):
        name = body.name or f"body_{len(links)}"
        links.append(UrdfLink(name=name))
        body_pos = tuple(body.pos) if body.pos is not None else (0.0, 0.0, 0.0)
        try:
            body_joints = [j for j in body.joint if j is not None]
        except TypeError:
            body_joints = [body.joint] if body.joint is not None else []
        if not body_joints:
            joints.append(UrdfJoint(
                name=f"{name}_fixed", type="fixed", parent=parent_name,
                child=name, origin_xyz=body_pos, origin_rpy=(0.0, 0.0, 0.0),
                axis=(0.0, 0.0, 0.0)))
        else:
            j = body_joints[0]
            jtype = _JOINT_MAP.get(j.type, "revolute")
            jpos = tuple(j.pos) if j.pos is not None else (0.0, 0.0, 0.0)
            origin = tuple(bp + jp for bp, jp in zip(body_pos, jpos))
            joint = UrdfJoint(
                name=j.name or f"{name}_joint", type=jtype,
                parent=parent_name, child=name,
                origin_xyz=origin, origin_rpy=(0.0, 0.0, 0.0),
                axis=tuple(j.axis) if j.axis is not None else (0.0, 0.0, 1.0))
            if j.range is not None:
                joint.has_limit = True
                joint.limit_lower = float(j.range[0])
                joint.limit_upper = float(j.range[1])
            if j.damping is not None:
                joint.damping = float(j.damping)
            joints.append(joint)
        for child in body.body:
            visit(child, name)

    for body in root.worldbody.body:
        visit(body, "worldbody")
    return UrdfRobot(name=root.model or "mjcf_robot", links=links,
                     joints=joints)


def kinematic_model_from_mjcf(path, name=None) -> KinematicModel:
    robot = parse_mjcf(path)
    return KinematicModel.from_urdf_robot(robot, name=name or robot.name)
