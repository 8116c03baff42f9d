"""Generate golden parity values from the reference implementation.

Runs the PyTorch reference at /root/reference (read-only) and dumps JSON
goldens into tests/golden/.  The reference's ``urdf_parser_py`` dependency is
absent in this image, so a minimal compatible shim (parsing the same URDF
fields the reference reads: models/utils.py:199-252) is registered first.

Usage: python tools/gen_golden.py
"""
from __future__ import annotations

import json
import sys
import types
from pathlib import Path
from xml.etree import ElementTree as ET

GOLDEN_DIR = Path(__file__).resolve().parent.parent / "tests" / "golden"
REFERENCE = Path("/root/reference")


# ----------------------------------------------------------------------------
# urdf_parser_py shim: just enough for torch_robotics' URDFRobotModel
# ----------------------------------------------------------------------------
class _Obj:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _parse_urdf(path):
    tree = ET.parse(path)
    root = tree.getroot()

    def vec(s, default="0 0 0"):
        return [float(v) for v in (s or default).split()]

    links = []
    for le in root.findall("link"):
        inertial = None
        ie = le.find("inertial")
        if ie is not None:
            mass_e = ie.find("mass")
            origin_e = ie.find("origin")
            inertia_e = ie.find("inertia")
            inertial = _Obj(
                mass=float(mass_e.get("value")) if mass_e is not None else 1.0,
                origin=_Obj(position=vec(origin_e.get("xyz") if origin_e is not None else None),
                            rotation=vec(origin_e.get("rpy") if origin_e is not None else None))
                if origin_e is not None else None,
                inertia=_Obj(**{k: float(inertia_e.get(k, 0.0))
                                for k in ["ixx", "ixy", "ixz", "iyy", "iyz", "izz"]})
                if inertia_e is not None else None,
            )
        links.append(_Obj(name=le.get("name"), inertial=inertial))

    joints = []
    for je in root.findall("joint"):
        origin_e = je.find("origin")
        axis_e = je.find("axis")
        limit_e = je.find("limit")
        dynamics_e = je.find("dynamics")
        joints.append(_Obj(
            name=je.get("name"),
            type=je.get("type"),
            parent=je.find("parent").get("link"),
            child=je.find("child").get("link"),
            origin=_Obj(
                position=vec(origin_e.get("xyz") if origin_e is not None else None),
                rotation=vec(origin_e.get("rpy") if origin_e is not None else None),
            ),
            axis=vec(axis_e.get("xyz")) if axis_e is not None else None,
            limit=_Obj(
                effort=float(limit_e.get("effort", 0.0)),
                lower=float(limit_e.get("lower", 0.0)),
                upper=float(limit_e.get("upper", 0.0)),
                velocity=float(limit_e.get("velocity", 0.0)),
            ) if limit_e is not None else None,
            dynamics=_Obj(damping=float(dynamics_e.get("damping", 0.0)))
            if dynamics_e is not None else None,
        ))
    return _Obj(links=links, joints=joints)


def install_shim():
    stub = types.ModuleType("urdf_parser_py")
    stub_urdf = types.ModuleType("urdf_parser_py.urdf")
    stub_urdf.URDF = type("URDF", (), {
        "from_xml_file": staticmethod(_parse_urdf)})
    for name in ["Joint", "Link", "Visual", "Collision", "Box", "Pose"]:
        setattr(stub_urdf, name, type(name, (), {}))
    stub.urdf = stub_urdf
    sys.modules["urdf_parser_py"] = stub
    sys.modules["urdf_parser_py.urdf"] = stub_urdf


def main():
    sys.path.insert(0, str(REFERENCE))
    install_shim()
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)

    import numpy as np
    import torch

    torch.manual_seed(0)
    ta = {"device": "cpu", "dtype": torch.float32}

    def dump(name, obj):
        path = GOLDEN_DIR / f"{name}.json"
        path.write_text(json.dumps(obj))
        print(f"wrote {path}")

    # ------------------------------------------------------------------
    # 1. primitive SDFs
    # ------------------------------------------------------------------
    from torch_robotics.environments.primitives import (
        MultiBoxField, MultiSphereField, MultiSharpBoxField, ObjectField)

    rng = np.random.RandomState(0)
    x2 = rng.uniform(-1, 1, size=(64, 2)).astype(np.float32)
    x3 = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)

    sph_c = rng.uniform(-1, 1, size=(5, 2)).astype(np.float32)
    sph_r = rng.uniform(0.1, 0.4, size=(5,)).astype(np.float32)
    spheres = MultiSphereField(sph_c, sph_r, tensor_args=ta)

    box_c = rng.uniform(-1, 1, size=(4, 2)).astype(np.float32)
    box_s = rng.uniform(0.1, 0.5, size=(4, 2)).astype(np.float32)
    boxes = MultiBoxField(box_c, box_s, tensor_args=ta)
    sharp = MultiSharpBoxField(box_c, box_s, tensor_args=ta)

    obj = ObjectField([spheres, boxes])
    theta = 0.7
    obj.set_position_orientation(
        pos=[0.3, -0.2, 0.0], ori=[np.cos(theta / 2), 0, 0, np.sin(theta / 2)])

    xt = torch.tensor(x2)
    dump("primitives_2d", {
        "x": x2.tolist(),
        "sphere_centers": sph_c.tolist(), "sphere_radii": sph_r.tolist(),
        "box_centers": box_c.tolist(), "box_sizes": box_s.tolist(),
        "sdf_spheres": spheres.compute_signed_distance(xt).tolist(),
        "sdf_rounded_boxes": boxes.compute_signed_distance(xt).tolist(),
        "sdf_sharp_boxes": sharp.compute_signed_distance(xt).tolist(),
        "obj_pos": [0.3, -0.2, 0.0],
        "obj_ori": [float(np.cos(theta / 2)), 0, 0, float(np.sin(theta / 2))],
        "sdf_posed_object": obj.compute_signed_distance(xt).tolist(),
    })

    sph3_c = rng.uniform(-1, 1, size=(6, 3)).astype(np.float32)
    sph3_r = rng.uniform(0.1, 0.3, size=(6,)).astype(np.float32)
    spheres3 = MultiSphereField(sph3_c, sph3_r, tensor_args=ta)
    box3_c = rng.uniform(-1, 1, size=(3, 3)).astype(np.float32)
    box3_s = rng.uniform(0.2, 0.5, size=(3, 3)).astype(np.float32)
    boxes3 = MultiBoxField(box3_c, box3_s, tensor_args=ta)
    xt3 = torch.tensor(x3)
    dump("primitives_3d", {
        "x": x3.tolist(),
        "sphere_centers": sph3_c.tolist(), "sphere_radii": sph3_r.tolist(),
        "box_centers": box3_c.tolist(), "box_sizes": box3_s.tolist(),
        "sdf_spheres": spheres3.compute_signed_distance(xt3).tolist(),
        "sdf_rounded_boxes": boxes3.compute_signed_distance(xt3).tolist(),
    })

    # ------------------------------------------------------------------
    # 2. environment SDF + grid SDF (EnvDense2D)
    # ------------------------------------------------------------------
    from torch_robotics.environments import EnvDense2D, EnvSpheres3D

    env = EnvDense2D(precompute_sdf_obj_fixed=False, tensor_args=ta)
    sdf_analytic = env.compute_sdf(torch.tensor(x2)).tolist()

    env_grid = EnvDense2D(precompute_sdf_obj_fixed=True, sdf_cell_size=0.01,
                          tensor_args=ta)
    sdf_grid = env_grid.grid_map_sdf_obj_fixed(torch.tensor(x2)).tolist()
    dump("env_dense2d_sdf", {
        "x": x2.tolist(),
        "sdf_analytic": sdf_analytic,
        "sdf_grid_cell001": sdf_grid,
    })

    env3 = EnvSpheres3D(precompute_sdf_obj_fixed=False, tensor_args=ta)
    dump("env_spheres3d_sdf", {
        "x": x3.tolist(),
        "sdf_analytic": env3.compute_sdf(torch.tensor(x3)).tolist(),
    })

    # ------------------------------------------------------------------
    # 3. PlanningTask costs with point-mass robot in EnvDense2D
    # ------------------------------------------------------------------
    from torch_robotics.robots.robot_point_mass import RobotPointMass
    from torch_robotics.tasks.tasks import PlanningTask

    robot = RobotPointMass(tensor_args=ta)
    task = PlanningTask(env=env, robot=robot, tensor_args=ta,
                        obstacle_cutoff_margin=0.01)
    trajs = torch.tensor(rng.uniform(-0.9, 0.9, size=(8, 16, 2)).astype(np.float32))
    cost = task.compute_collision_cost(trajs)
    coll = task.compute_collision(trajs)
    dump("task_pointmass_dense2d", {
        "trajs": trajs.tolist(),
        "collision_cost": cost.tolist(),
        "collision": coll.to(torch.float32).tolist(),
    })

    # ------------------------------------------------------------------
    # 4. Panda FK / link poses (needs the URDF shim)
    # ------------------------------------------------------------------
    from torch_robotics.torch_kinematics_tree.models.robots import (
        DifferentiableFrankaPanda, DifferentiableUR10)

    panda = DifferentiableFrankaPanda(gripper=False, device="cpu")
    q = torch.tensor(rng.uniform(-1.5, 1.5, size=(16, panda._n_dofs)).astype(np.float32))
    link_tensor = panda.compute_forward_kinematics_all_links(q)
    dump("panda_fk", {
        "q": q.tolist(),
        "link_names": panda.get_link_names(),
        "link_tensor": link_tensor.tolist(),
        "joint_lower": panda.get_joint_limit_array()[0].tolist(),
        "joint_upper": panda.get_joint_limit_array()[1].tolist(),
    })

    ur10 = DifferentiableUR10(device="cpu")
    q_u = torch.tensor(rng.uniform(-2.0, 2.0, size=(8, ur10._n_dofs)).astype(np.float32))
    link_tensor_u = ur10.compute_forward_kinematics_all_links(q_u)
    dump("ur10_fk", {
        "q": q_u.tolist(),
        "link_names": ur10.get_link_names(),
        "link_tensor": link_tensor_u.tolist(),
    })

    # Habitat Stretch: mixed revolute/prismatic/continuous joints
    from torch_robotics.torch_kinematics_tree.models.robots import (
        DifferentiableHabitatStretch)
    stretch = DifferentiableHabitatStretch(device="cpu")
    q_s = torch.tensor(rng.uniform(-0.5, 0.5,
                                   size=(6, stretch._n_dofs)).astype(np.float32))
    dump("stretch_fk", {
        "q": q_s.tolist(),
        "link_names": stretch.get_link_names(),
        "link_tensor": stretch.compute_forward_kinematics_all_links(q_s).tolist(),
    })

    # Branching kinematic trees (hands, dual-arm Tiago) + KUKA iiwa —
    # parity for the parent-indexed (non-chain) FK topologies
    from torch_robotics.torch_kinematics_tree.models.robots import (
        DifferentiableShadowHand, DifferentiableAllegroHand,
        DifferentiableTiagoDualHolo, DifferentiableKUKAiiwa)
    rng_tree = np.random.RandomState(7)    # own stream: keeps the shared
    # rng sequence (and every golden generated after this point) unchanged
    for cls, name, scale in [(DifferentiableShadowHand, "shadow_hand_fk", 0.3),
                             (DifferentiableAllegroHand, "allegro_hand_fk", 0.3),
                             (DifferentiableTiagoDualHolo, "tiago_dual_fk", 0.8),
                             (DifferentiableKUKAiiwa, "kuka_iiwa7_fk", 1.5)]:
        rb = cls(device="cpu")
        q_r = torch.tensor(rng_tree.uniform(
            -scale, scale, size=(6, rb._n_dofs)).astype(np.float32))
        dump(name, {
            "q": q_r.tolist(),
            "link_names": rb.get_link_names(),
            "link_tensor":
                rb.compute_forward_kinematics_all_links(q_r).tolist(),
        })

    # ------------------------------------------------------------------
    # 5. Panda task costs in EnvSpheres3D (full embodied pipeline)
    # ------------------------------------------------------------------
    from torch_robotics.robots.robot_panda import RobotPanda

    robot_panda = RobotPanda(tensor_args=ta)
    task3 = PlanningTask(env=env3, robot=robot_panda, tensor_args=ta,
                         obstacle_cutoff_margin=0.03)
    q_traj = torch.tensor(
        rng.uniform(-1.0, 1.0, size=(4, 8, robot_panda.q_dim)).astype(np.float32))
    cost3 = task3.compute_collision_cost(q_traj)
    coll3 = task3.compute_collision(q_traj)
    fk_pos = robot_panda.fk_map_collision(q_traj)
    dump("task_panda_spheres3d", {
        "q": q_traj.tolist(),
        "fk_collision_pos": fk_pos.tolist(),
        "collision_cost": cost3.tolist(),
        "collision": coll3.to(torch.float32).tolist(),
        "link_idxs_object_coll": robot_panda.link_idxs_for_object_collision_checking,
        "link_idxs_self_coll": robot_panda.link_idxs_for_self_collision_checking,
        "self_pair_idxs": [list(p) for p in
                           robot_panda.df_collision_self.idxs_links_distance_matrix],
        "self_margin": robot_panda.df_collision_self.cutoff_margin.tolist(),
        "object_margins":
            robot_panda.link_margins_for_object_collision_checking_tensor.tolist(),
    })

    # ------------------------------------------------------------------
    # 6. trajectory metrics + interpolation
    # ------------------------------------------------------------------
    from torch_robotics.trajectory.metrics import (
        compute_path_length, compute_smoothness, compute_variance_waypoints)
    from torch_robotics.trajectory.utils import (
        finite_difference_vector, interpolate_traj_via_points)

    trajs_m = torch.tensor(rng.uniform(-1, 1, size=(4, 10, 2)).astype(np.float32))
    dump("trajectory_metrics", {
        "trajs": trajs_m.tolist(),
        "path_length": compute_path_length(trajs_m, robot).tolist(),
        "smoothness": compute_smoothness(trajs_m, robot).tolist(),
        "variance_waypoints": float(compute_variance_waypoints(trajs_m, robot)),
        "interp_3": interpolate_traj_via_points(trajs_m, 3).tolist(),
        "fd_forward": finite_difference_vector(trajs_m, dt=0.1, method="forward").tolist(),
        "fd_central": finite_difference_vector(trajs_m, dt=0.1, method="central").tolist(),
    })


if __name__ == "__main__":
    main()
