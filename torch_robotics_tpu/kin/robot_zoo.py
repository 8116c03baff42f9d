"""Named kinematic models compiled from vendored URDFs.

Mirrors the reference robot zoo
(/root/reference/torch_robotics/torch_kinematics_tree/models/robots.py:16-133).
Each constructor returns a compiled ``KinematicModel``.  The grasped-object
variant appends a fixed virtual link to the Panda hand instead of rewriting
the URDF on disk (reference: models/robots.py:24-53).
"""
from __future__ import annotations


from ..utils.files import get_robot_path
from .model import KinematicModel
from .urdf import UrdfJoint, UrdfLink, parse_urdf

__all__ = [
    "kuka_iiwa7", "franka_panda", "ur10", "habitat_stretch",
    "tiago_dual_holo", "tiago_dual_holo_move", "shadow_hand", "allegro_hand",
    "planar_2_link",
]


def _load(rel_path: str, name: str) -> KinematicModel:
    return KinematicModel.from_urdf(get_robot_path() / rel_path, name=name)


def kuka_iiwa7() -> KinematicModel:
    return _load("kuka_iiwa/urdf/iiwa7.urdf", "differentiable_kuka_iiwa")


def franka_panda(gripper: bool = False,
                 grasped_object=None) -> KinematicModel:
    """Franka Panda; optionally with gripper URDF or an attached grasped object.

    grasped_object: an object with ``pos`` (3,) and ``ori`` (wxyz quaternion)
    in the ``panda_hand`` frame; a fixed link named ``grasped_object`` is
    appended (reference rewrites the URDF: models/robots.py:24-53).
    """
    rel = ("franka_description/robots/panda_arm_hand.urdf" if gripper
           else "franka_description/robots/panda_arm_no_gripper.urdf")
    robot = parse_urdf(get_robot_path() / rel)
    if grasped_object is not None:
        import numpy as np

        from ..core.quaternion import q_to_euler
        pos = np.asarray(grasped_object.pos).reshape(3)
        rpy = np.asarray(q_to_euler(grasped_object.ori)).reshape(3)
        robot.joints.append(UrdfJoint(
            name="grasped_object_fixed_joint", type="fixed",
            parent="panda_hand", child="grasped_object",
            origin_xyz=tuple(pos), origin_rpy=tuple(rpy),
            axis=(0.0, 0.0, 0.0)))
        robot.links.append(UrdfLink(name="grasped_object"))
    return KinematicModel.from_urdf_robot(robot, name="differentiable_franka_panda")


def ur10(attach_gripper: bool = False) -> KinematicModel:
    rel = ("ur10/urdf/ur10_suction.urdf" if attach_gripper
           else "ur10/urdf/ur10.urdf")
    return _load(rel, "differentiable_ur10")


def habitat_stretch() -> KinematicModel:
    return _load("habitat_stretch/urdf/hab_stretch.urdf", "differentiable_stretch")


def tiago_dual_holo() -> KinematicModel:
    return _load("tiago_dual_description/tiago_dual_holobase_minimal.urdf",
                 "differentiable_tiago_dual_holo")


def tiago_dual_holo_move() -> KinematicModel:
    return _load(
        "tiago_dual_description/tiago_dual_holobase_minimal_holonomic.urdf",
        "differentiable_tiago_dual_holo_move")


def shadow_hand() -> KinematicModel:
    return _load("shadow_hand/shadow_hand.urdf", "differentiable_shadow_hand")


def allegro_hand() -> KinematicModel:
    return _load("allegro_hand/allegro_hand.urdf", "differentiable_allegro_hand")


def planar_2_link() -> KinematicModel:
    return _load("planar_manipulators/urdf/2_link_planar.urdf",
                 "differentiable_2_link_planar")
