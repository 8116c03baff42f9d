from .model import (JOINT_CONTINUOUS, JOINT_FIXED, JOINT_PRISMATIC,
                    JOINT_REVOLUTE, KinematicModel)
from .fk import (analytical_jacobian, fk_all_links, fk_link_positions,
                 fk_rot_trans, fk_with_velocities, geometric_jacobian,
                 local_joint_transforms)
from .skeleton import Skeleton, get_skeleton_from_model
from .ik import IKResult, ik_loss_per_q, ik_valid_mask, inverse_kinematics
from .urdf import UrdfJoint, UrdfLink, UrdfRobot, parse_urdf
from . import robot_zoo
