"""Throughput + quality numbers for the iLQR and sGPMP solvers.

Both capabilities existed since round 2 but had no consumer or perf row
(VERDICT round 2, item 6).  This bench runs them on the config-3 workload
(Panda / EnvSpheres3D):

- batched iLQR: dynamically-feasible trajectories (double-integrator
  states), chained-timing solves/s, an explicit feasibility residual
  ``max |x_{t+1} - (Phi x_t + B u_t)|`` (must be ~1e-6 — the states are
  produced BY the rollout), and fraction collision-free;
- receding-horizon iLQR MPC: control-warm-started re-optimization, the
  dynamically-feasible analogue of solve/mpc.py;
- sGPMP: sampling-based posterior smoothing at the same shapes.

Run: python benchmarks/ilqr_sgpmp_bench.py [--small]
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

EPS = 1e-30


def timed_fetch(fn, *args, n=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def feasibility_residual(trajs, controls, dt):
    """max |x_{t+1} - (Phi x_t + B u_t)| over the batch (double integrator)."""
    d = trajs.shape[-1] // 2
    q, qd = trajs[..., :d], trajs[..., d:]
    q_next = q[..., :-1, :] + dt * qd[..., :-1, :] \
        + 0.5 * dt * dt * controls
    qd_next = qd[..., :-1, :] + dt * controls
    err_q = jnp.abs(trajs[..., 1:, :d] - q_next).max()
    err_qd = jnp.abs(trajs[..., 1:, d:] - qd_next).max()
    return float(jnp.maximum(err_q, err_qd))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    from torch_robotics_tpu.envs import EnvSpheres3D
    from torch_robotics_tpu.robots import RobotPanda
    from torch_robotics_tpu.solve.ilqr import ILQRParams, ilqr_solve
    from torch_robotics_tpu.solve.sampling import SGPMPParams, sgpmp_solve
    from torch_robotics_tpu.solve.gp_prior import sample_gp_prior_trajs
    from torch_robotics_tpu.tasks import PlanningTask

    env = EnvSpheres3D()
    robot = RobotPanda.create()
    # 0.06 cutoff: the receding-horizon loop needs a repulsion buffer wider
    # than the executed step length — at 0.03 the first fast transit steps
    # graze obstacles the hinge never saw (exec-free 0.42 -> ~0.6+ at 0.06)
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.06)
    d = robot.q_dim
    B = 32 if args.small else 512
    H = 16 if args.small else 32
    iters = 10 if args.small else 30

    # collision-free starts AND goals (a goal sampled inside an obstacle
    # makes fraction_free/goal-distance meaningless); goals are free
    # configurations near the starts, reachable within the horizon
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    qs, _ = task.random_coll_free_q(k1, n_samples=B, max_samples=B * 64)
    # goals inset 0.01 rad from the joint limits: a goal exactly ON a
    # hard stop makes the tracker graze out-of-limits by ~1e-3 rad,
    # which trajectory validators count as infeasible
    pert = jnp.clip(qs + 0.6 * jax.random.normal(k2, (16, B, d)),
                    robot.q_min + 0.01, robot.q_max - 0.01)
    free = (task.compute_collision(pert.reshape(-1, d)) == 0).reshape(16, B)
    # first collision-free perturbation per problem (falls back to the
    # start itself if none of the 16 candidates is free)
    idx = jnp.argmax(free, axis=0)
    any_free = free.max(axis=0)
    qg = jnp.where(any_free[:, None],
                   pert[idx, jnp.arange(B)], qs)
    start = jnp.concatenate([qs, jnp.zeros_like(qs)], -1)
    goal = jnp.concatenate([qg, jnp.zeros_like(qg)], -1)
    results = {}

    # ---- batched iLQR -----------------------------------------------------
    p = ILQRParams(n_support_points=H, dt=0.04, opt_iters=iters,
                   sigma_coll=2e-3, sigma_goal_prior=5e-3,
                   sigma_limits=5e-3, r_control=1e-6)
    limits = (robot.q_min, robot.q_max)
    solve = jax.jit(lambda s, g: ilqr_solve(task.collision_residuals, s, g, p,
                                            q_limits=limits))
    _, res = timed_fetch(solve, start, goal)

    # throughput via CHAINED solves (difference two chain lengths inside one
    # dispatch): timed_fetch bills the fixed dispatch + axon tunnel RTT to
    # the solve — profiled round 5 as ~22 ms/solve of pure timing artifact
    # (chained per-iteration cost is ~1.5 ms with a ~0 intercept: 2.72 /
    # 15.41 / 45.55 ms/solve at 2/10/30 iters), the same trap CLAUDE.md
    # documents for block_until_ready
    def chain(M):
        @jax.jit
        def run(s):
            def body(ss, _):
                r = ilqr_solve(task.collision_residuals, ss, goal, p,
                               q_limits=limits)
                return ss + EPS * r.costs[:, None], None
            ss, _ = jax.lax.scan(body, s, None, length=M)
            return ss[0, 0]
        return run

    t_lo, _ = timed_fetch(chain(1), start)
    t_hi, _ = timed_fetch(chain(3), start)
    dt_s = (t_hi - t_lo) / 2
    frac_free = task.compute_fraction_free_trajs(res.trajs)
    goal_dist = float(jnp.linalg.norm(
        res.trajs[:, -1, :d] - goal[:, :d], axis=-1).mean())
    results["ilqr_batch"] = {
        "batch": B, "horizon": H, "iters": iters,
        "solves_per_s": round(B / dt_s, 1),
        "dynamics_feasibility_max_err": feasibility_residual(
            res.trajs, res.controls, p.dt),
        "fraction_free": round(frac_free, 3),
        "mean_final_goal_dist": round(goal_dist, 3),
    }
    print("ilqr_batch", json.dumps(results["ilqr_batch"]), flush=True)

    # ---- receding-horizon iLQR MPC: plan & track --------------------------
    # tracking a converged plan's waypoints (x_ref windows) instead of
    # pulling straight at the goal point: a point-attractor regulator drags
    # the arm THROUGH any obstacle its pull line crosses (exec-free 0.42),
    # while tracking inherits the plan's detours (exec-free == plan free).
    # The control cost matters too: near-free controls (r=1e-6) make the
    # executed loop non-contractive (velocities diverged, dist 1.4 -> 19.7)
    n_mpc = 3 if args.small else 30
    H_trk = 8 if args.small else 16
    p_mpc = ILQRParams(n_support_points=H_trk, dt=0.04, opt_iters=3,
                       sigma_coll=2e-3, sigma_goal_prior=5e-3,
                       sigma_goal_running=0.05, sigma_limits=5e-3,
                       r_control=1e-3)

    @jax.jit
    def mpc_rollout_ilqr(start, goal, plan_trajs):
        pad = jnp.broadcast_to(goal[:, None],
                               (B, H_trk + n_mpc, 2 * d))
        ref_full = jnp.concatenate([plan_trajs, pad], axis=1)

        def body(carry, t):
            x, u_warm = carry
            refs = jax.lax.dynamic_slice_in_dim(
                ref_full, t + 1, H_trk, axis=1)
            res = ilqr_solve(task.collision_residuals, x, goal, p_mpc,
                             u_init=u_warm, x_ref=refs, q_limits=limits)
            x_next = res.trajs[..., 1, :]
            u_next = jnp.concatenate(
                [res.controls[..., 1:, :], res.controls[..., -1:, :]], -2)
            return (x_next, u_next), x_next
        u0 = jnp.zeros(start.shape[:-1] + (H_trk - 1, d))
        (_, _), xs_exec = jax.lax.scan(body, (start, u0),
                                       jnp.arange(n_mpc))
        return xs_exec                                 # (n_mpc, B, 2d)

    # the batch row's converged solve IS the plan
    dt_m, xs_exec = timed_fetch(mpc_rollout_ilqr, start, goal, res.trajs)
    dists = jnp.linalg.norm(xs_exec[..., :d] - goal[None, :, :d], axis=-1)
    exec_trajs = jnp.swapaxes(xs_exec[..., :d], 0, 1)  # (B, n_mpc, d)
    results["ilqr_mpc"] = {
        "batch": B, "mpc_steps": n_mpc, "iters_per_step": 3,
        "solves_per_s": round(B * n_mpc / dt_m, 1),
        "mean_final_goal_dist": round(float(dists[-1].mean()), 3),
        "median_final_goal_dist": round(float(jnp.median(dists[-1])), 4),
        "fraction_free_executed": round(
            task.compute_fraction_free_trajs(exec_trajs), 3),
    }
    print("ilqr_mpc", json.dumps(results["ilqr_mpc"]), flush=True)

    # ---- sGPMP (multi-particle, reference-preset weights) -----------------
    # the stochastic planner's global coverage comes from DIVERSE prior
    # particles per problem (the update itself is local); collision weight
    # sigma_coll=1e-5 follows the reference preset (env_grid_circles_2d.py
    # get_sgpmp_params) so candidate ranking is collision-dominated
    n_part = 2 if args.small else 8
    sp = SGPMPParams(n_support_points=H, dt=0.04,
                     opt_iters=20 if args.small else 100,
                     num_samples=16, sigma_coll=1e-5, temperature=1.0,
                     sigma_gp_sample=0.2)
    kp = jax.random.split(jax.random.PRNGKey(2), B)
    theta0 = jax.vmap(
        lambda k, s, g: sample_gp_prior_trajs(k, s, g, H, n_part, sp.dt, 0.2)
    )(kp, start, goal)                               # (B, n_part, H, 2d)
    start_p = jnp.repeat(start, n_part, axis=0)
    goal_p = jnp.repeat(goal, n_part, axis=0)
    theta0 = theta0.reshape(B * n_part, H, 2 * d)
    coll0, _ = task.trajs_collision_masks(theta0[..., :d])
    free0 = (~coll0).reshape(B, n_part)
    sfn = jax.jit(lambda th: sgpmp_solve(
        task.collision_residuals, th, start_p, goal_p, sp,
        key=jax.random.PRNGKey(1)))
    dt_g, res_g = timed_fetch(sfn, theta0)
    coll_mask, _ = task.trajs_collision_masks(res_g.trajs[..., :d])
    free_p = (~coll_mask).reshape(B, n_part)
    results["sgpmp"] = {
        "batch": B, "particles": n_part, "horizon": H,
        "iters": sp.opt_iters, "samples_per_iter": sp.num_samples,
        "particle_solves_per_s": round(B * n_part / dt_g, 1),
        "problems_per_s": round(B / dt_g, 1),
        "init_fraction_free_particles": round(float(free0.mean()), 3),
        "fraction_free_particles": round(float(free_p.mean()), 3),
        "init_fraction_problems_with_free": round(
            float(free0.any(axis=1).mean()), 3),
        "fraction_problems_with_free": round(
            float(free_p.any(axis=1).mean()), 3),
    }
    print("sgpmp", json.dumps(results["sgpmp"]), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
