"""A/B: Gauss-Newton factorization reuse (stale-D second iteration).

CLAUDE.md's end-of-round-4 conclusion: the block-tridiagonal solve is ~72%
of the headline GN step and the m=14 sweep kernel is at its measured
issue-bound floor — the next lever is ALGORITHMIC.  Candidate: warm-started
MPC steps change the Hessian D little between consecutive GN iterations, so
iteration 2 could solve with iteration 1's FACTORS (substitution alone is
~10% of the sweep's equations: 3m^2 vs ~m^3/2 + m^3/6 + 2m^2 per step) —
IF the stale-D direction does not cost quality.

This bench answers the QUALITY question first, at two workloads:
1. headline MPC (Panda/EnvSpheres3D, B=1024, H=64, 2 GN iters/step,
   8 steps): per-step collision cost + final distance to goal, standard
   vs stale-D-second-iteration;
2. config-3-style batch solve (B=512, 48 iters): refactor every k-th
   iteration for k in {1, 2, 4}; final cost + fraction-free.

The stale-D variant here runs the SAME solve kernel (no perf win yet) —
a substitution-only kernel is only worth building if quality holds.

Run: python benchmarks/gn_reuse_ab.py [--small]
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/trt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def make_steps(task, params):
    """(standard 2-iter reopt, stale-D 2-iter reopt) closures over the
    lanes terms hook — same internals as solve/gpmp2.py
    _gpmp2_step_lanes_impl, with the solve's D operand switchable."""
    from torch_robotics_tpu.ops.pallas_btridiag import solve_lanes_auto
    from torch_robotics_tpu.solve.gp_prior import gp_prior_terms

    lanes_terms = task.collision_residuals.obstacle_terms_lanes
    lam_inv = None  # set per params

    def terms_and_D(theta, start, goal, p):
        B, H, m = theta.shape
        d = m // 2
        lam = 1.0 / (p.sigma_coll ** 2)
        q_cols = jnp.transpose(theta[..., :d], (2, 1, 0)).reshape(d, H * B)
        g_obs_l, H_obs_l, cost = lanes_terms(q_cols, lam, h=H)
        g_gp, D, U = gp_prior_terms(theta, start, goal, p.dt, p.sigma_start,
                                    p.sigma_gp, p.sigma_goal_prior)
        b_l = -(jnp.transpose(g_gp, (1, 2, 0)) + g_obs_l)
        eye = jnp.eye(m, dtype=theta.dtype)
        D_l = D[..., None] + H_obs_l + p.solver_delta * eye[..., None]
        U_pad = jnp.concatenate([U, jnp.zeros_like(U[:1])], axis=0)
        return b_l, D_l, U_pad[..., None], cost

    def reopt(theta, start, goal, p, reuse):
        b1, D1, U_l, _ = terms_and_D(theta, start, goal, p)
        x1 = solve_lanes_auto(D1, U_l, b1)
        theta1 = theta + p.step_size * jnp.transpose(x1, (2, 0, 1))
        b2, D2, _, cost2 = terms_and_D(theta1, start, goal, p)
        x2 = solve_lanes_auto(D1 if reuse else D2, U_l, b2)
        theta2 = theta1 + p.step_size * jnp.transpose(x2, (2, 0, 1))
        return theta2, jnp.sum(cost2, axis=0)

    return reopt


def mpc_ab(task, robot, B, H, n_steps, small):
    from torch_robotics_tpu.solve import GPMP2Params
    from torch_robotics_tpu.solve.gp_prior import straight_line_trajs

    d = robot.q_dim
    gp = GPMP2Params(n_support_points=H, dt=0.04, opt_iters=2,
                     sigma_start=1e-3, sigma_gp=1e-1, sigma_goal_prior=1e-3,
                     sigma_coll=1e-4, step_size=1.0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    u1 = jax.random.uniform(k1, (B, d))
    u2 = jax.random.uniform(k2, (B, d))
    q_start = robot.q_min + 0.25 * (robot.q_max - robot.q_min) * (1 + u1) / 2
    q_goal = robot.q_max - 0.25 * (robot.q_max - robot.q_min) * (1 + u2) / 2
    start = jnp.concatenate([q_start, jnp.zeros_like(q_start)], axis=-1)
    goal = jnp.concatenate([q_goal, jnp.zeros_like(q_goal)], axis=-1)
    theta0 = straight_line_trajs(start, goal, H)

    reopt = make_steps(task, gp)
    out = {}
    for tag, reuse in (("standard", False), ("stale_D_iter2", True)):
        @jax.jit
        def rollout(theta, x):
            def body(carry, _):
                th, xx = carry
                th2, cost = reopt(th, xx, goal, gp, reuse)
                x_next = th2[:, 1, :]
                th_shift = jnp.concatenate([th2[:, 1:], th2[:, -1:]], axis=1)
                return (th_shift, x_next), (cost.mean(), x_next)
            (_, x_fin), (costs, _) = jax.lax.scan(
                body, (theta, x), None, length=n_steps)
            return costs, x_fin
        costs, x_fin = rollout(theta0, start)
        dist = float(jnp.linalg.norm(
            x_fin[:, :d] - goal[:, :d], axis=-1).mean())
        out[tag] = {"mean_coll_cost_final": float(costs[-1]),
                    "mean_coll_cost_trace": [round(float(c), 2)
                                             for c in np.asarray(costs)],
                    "mean_dist_to_goal": round(dist, 4)}
        print("mpc", tag, json.dumps(out[tag]), flush=True)
    return out


def batch_solve_ab(task, robot, B, H, iters, small):
    from torch_robotics_tpu.solve import GPMP2Params
    from torch_robotics_tpu.solve.gp_prior import sample_gp_prior_trajs

    d = robot.q_dim
    gp = GPMP2Params(n_support_points=H, dt=0.04, opt_iters=iters,
                     sigma_start=1e-3, sigma_gp=1e-1, sigma_goal_prior=1e-3,
                     sigma_coll=5e-3, step_size=0.9, sigma_gp_init=0.2)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    qs, _ = task.random_coll_free_q(k1, n_samples=B, max_samples=B * 64)
    qg, _ = task.random_coll_free_q(k2, n_samples=B, max_samples=B * 64)
    start = jnp.concatenate([qs, jnp.zeros_like(qs)], -1)
    goal = jnp.concatenate([qg, jnp.zeros_like(qg)], -1)
    theta0 = jax.vmap(lambda s, g, k: sample_gp_prior_trajs(
        k, s, g, H, 1, gp.dt, gp.sigma_gp_init)[0])(
        start, goal, jax.random.split(k3, B))

    from torch_robotics_tpu.ops.pallas_btridiag import solve_lanes_auto
    from torch_robotics_tpu.solve.gp_prior import gp_prior_terms
    lanes_terms = task.collision_residuals.obstacle_terms_lanes

    def one_iter(theta, D_prev, refac):
        """refac: per-iteration boolean operand; D_use selected with
        jnp.where (the fresh D is a free byproduct of the terms eval —
        only the FACTORIZATION would be skipped by a production
        substitution-only kernel)."""
        Bb, Hh, m = theta.shape
        dd = m // 2
        lam = 1.0 / (gp.sigma_coll ** 2)
        q_cols = jnp.transpose(theta[..., :dd], (2, 1, 0)).reshape(
            dd, Hh * Bb)
        g_obs_l, H_obs_l, cost = lanes_terms(q_cols, lam, h=Hh)
        g_gp, D, U = gp_prior_terms(theta, start, goal, gp.dt,
                                    gp.sigma_start, gp.sigma_gp,
                                    gp.sigma_goal_prior)
        b_l = -(jnp.transpose(g_gp, (1, 2, 0)) + g_obs_l)
        eye = jnp.eye(m, dtype=theta.dtype)
        D_l = D[..., None] + H_obs_l + gp.solver_delta * eye[..., None]
        U_pad = jnp.concatenate([U, jnp.zeros_like(U[:1])], axis=0)
        D_use = jnp.where(refac, D_l, D_prev)
        x_l = solve_lanes_auto(D_use, U_pad[..., None], b_l)
        theta2 = theta + gp.step_size * jnp.transpose(x_l, (2, 0, 1))
        return theta2, D_use, jnp.sum(cost, axis=0)

    out = {}
    m_state = 2 * d
    for k_refac in (1, 2, 4):
        sched = (jnp.arange(iters) % k_refac) == 0       # first is True

        @jax.jit
        def solve(theta, sched=sched):
            # derive the D carry's vma/type from theta (CLAUDE.md lesson 8)
            D0 = jnp.zeros((H, m_state, m_state, theta.shape[0]),
                           theta.dtype) + 0.0 * theta[0, 0, 0]

            def body(carry, refac):
                th, Dp = carry
                th2, Du, cost = one_iter(th, Dp, refac)
                return (th2, Du), cost
            (th, _), costs = jax.lax.scan(body, (theta, D0), sched)
            return th, costs[-1]
        t0 = time.perf_counter()
        th, cost = solve(theta0)
        np.asarray(cost)
        frac = float(task.compute_fraction_free_trajs(th))
        out[f"refactor_every_{k_refac}"] = {
            "final_cost_mean": float(cost.mean()),
            "fraction_free": round(frac, 4)}
        print("solve", k_refac, json.dumps(out[f"refactor_every_{k_refac}"]),
              flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    from torch_robotics_tpu.envs import EnvSpheres3D
    from torch_robotics_tpu.robots import RobotPanda
    from torch_robotics_tpu.tasks import PlanningTask

    env = EnvSpheres3D(precompute_sdf_obj_fixed=False)
    robot = RobotPanda.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.03)

    B = 64 if args.small else 1024
    H = 16 if args.small else 64
    mpc_ab(task, robot, B, H, n_steps=3 if args.small else 8,
           small=args.small)

    task3 = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.03)
    batch_solve_ab(task3, robot, B=32 if args.small else 256,
                   H=16 if args.small else 32,
                   iters=8 if args.small else 48, small=args.small)


if __name__ == "__main__":
    main()
