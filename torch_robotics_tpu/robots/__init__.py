from .base import RobotAPI, build_object_margins, build_self_collision_pairs
from .point_mass import RobotPointMass, RobotPointMass3D
from .planar2link import RobotPlanar2Link
from .panda import RobotPanda
from .kinematic_robot import KinematicRobot, RobotUR10
from .multi_robot import MultiRobot
