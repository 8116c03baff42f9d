"""Benchmark: Panda MPC solves/s on the local accelerator.

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline"}
first, then a second JSON line with the FK-rollouts/s/chip protocol metric
(BASELINE.md measurement protocol).

Protocol (BASELINE.md): a "solve" is one receding-horizon MPC re-optimization
of an H=64, 7-DoF Panda trajectory with sphere-SDF collision costs
(EnvSpheres3D), warm-started, 2 Gauss-Newton iterations per step, batched over
B independent scenario problems on one chip.  The north-star target is 1,000
solves/s on a 16-chip v5e slice = 62.5 solves/s/chip; vs_baseline is measured
against the per-chip share.
"""
from __future__ import annotations

import json
import subprocess
import sys
import time
import traceback

import jax
import jax.numpy as jnp

# persistent compilation cache: repeated bench runs skip the (slow) first
# compile where the backend supports it
jax.config.update("jax_compilation_cache_dir", "/tmp/trt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

B = 1024          # scenario batch per chip
H = 64            # horizon (support points)
N_STEPS = 8       # timed MPC steps per measurement
N_REPEATS = 3
TARGET_PER_CHIP = 1000.0 / 16.0
# FK protocol target (BASELINE.md): BASELINE.json specifies "measured" with
# no number, so the round-1 measured value is the recorded baseline the
# metric is compared against
FK_BASELINE_PER_CHIP = 1_464_273.0

# backend-probe bounds: round-4's driver bench died at axon backend init
# with a transient UNAVAILABLE (BENCH_r04.json rc=1) — probe in a
# subprocess (isolates hangs: a judge-side bare jax.devices() was seen to
# hang >120 s) and retry before building any graphs
PROBE_TIMEOUT_S = 240
PROBE_ATTEMPTS = 3
PROBE_RETRY_SLEEP_S = 45


def _fail(stage: str, err: str) -> None:
    """Emit a structured JSON error line (driver artifact stays parseable)."""
    print(json.dumps({
        "metric": "panda_mpc_solves_per_s_per_chip",
        "value": None,
        "unit": "solves/s/chip",
        "vs_baseline": None,
        "error": "%s: %s" % (stage, err[-2000:]),
    }))
    sys.exit(1)


def probe_backend() -> None:
    """Bounded, retried backend-availability probe in a subprocess.

    A hung or UNAVAILABLE accelerator runtime surfaces here as a clean
    structured failure (or a recovery after retry) instead of an unbounded
    hang / raw traceback at the first eager dispatch in main().
    """
    last = ""
    for attempt in range(PROBE_ATTEMPTS):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); print('OK', len(d))"],
                capture_output=True, text=True, timeout=PROBE_TIMEOUT_S)
            if r.returncode == 0 and "OK" in r.stdout:
                return
            last = (r.stderr or r.stdout or "").strip()
        except subprocess.TimeoutExpired:
            last = "backend probe timed out after %ds" % PROBE_TIMEOUT_S
        if attempt < PROBE_ATTEMPTS - 1:
            time.sleep(PROBE_RETRY_SLEEP_S)
    _fail("backend_probe", last)


def main():
    from torch_robotics_tpu.envs import EnvSpheres3D
    from torch_robotics_tpu.robots import RobotPanda
    from torch_robotics_tpu.solve import GPMP2Params
    from torch_robotics_tpu.solve.mpc import MPCParams, MPCState, mpc_step
    from torch_robotics_tpu.tasks import PlanningTask

    env = EnvSpheres3D(precompute_sdf_obj_fixed=False)
    robot = RobotPanda.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.03)
    d = robot.q_dim

    gp = GPMP2Params(n_support_points=H, dt=0.04, opt_iters=2,
                     sigma_start=1e-3, sigma_gp=1e-1, sigma_goal_prior=1e-3,
                     sigma_coll=1e-4, step_size=1.0)
    params = MPCParams(gpmp2=gp, iters_per_step=2)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (B, d))
    u2 = jax.random.uniform(k2, (B, d))
    q_start = robot.q_min + 0.25 * (robot.q_max - robot.q_min) * (1 + u1) / 2
    q_goal = robot.q_max - 0.25 * (robot.q_max - robot.q_min) * (1 + u2) / 2
    start = jnp.concatenate([q_start, jnp.zeros_like(q_start)], axis=-1)
    goal = jnp.concatenate([q_goal, jnp.zeros_like(q_goal)], axis=-1)

    from torch_robotics_tpu.solve.gp_prior import straight_line_trajs
    theta0 = straight_line_trajs(start, goal, H)
    state = MPCState(theta=theta0, x=start)

    import numpy as np

    # the B=1024 protocol batch is processed as sequential knee-sized
    # chunks inside the jit, like the pod path (parallel/mesh.py
    # _POD_CHUNK).  The knee moved when the fused Pallas terms kernel
    # removed the terms stage's HBM traffic (ops/pallas_terms.py): chunk
    # sweep at H=64 after the kernel measured 241k @ 128 / 282k @ 256 /
    # 272k @ 512 / 280k @ 1024 solves/s (was 167.6k @ 128 peak before).
    # Re-swept after the W-persisting sweep (round 5): 300.7k @ 128 /
    # 316.6k @ 256 / 296.1k @ 512 / 289.1k @ 1024 — 256 stays the knee
    CHUNK = 256

    def run_steps_fn(n_steps):
        @jax.jit
        def run_steps(state):
            n_c = B // CHUNK
            goal_c = goal.reshape(n_c, CHUNK, -1)

            def one(args):
                state_c, g_c = args
                def body(s, _):
                    s_next, info = mpc_step(task.collision_residuals, s, g_c,
                                            params)
                    return s_next, info["collision_cost"].mean()
                return jax.lax.scan(body, state_c, None, length=n_steps)

            state_r = MPCState(
                theta=state.theta.reshape(n_c, CHUNK, H, -1),
                x=state.x.reshape(n_c, CHUNK, -1))
            s_out, costs = jax.lax.map(one, (state_r, goal_c))
            return s_out, costs.mean(axis=0)
        return run_steps

    # warm up (compile) + sanity
    state_w, costs = run_steps_fn(N_STEPS)(state)
    costs = np.asarray(costs)          # real round-trip drain
    assert bool(jnp.all(jnp.isfinite(state_w.theta))), "bench produced NaNs"

    # chained-difference timing: run K_LO and K_HI MPC steps in one
    # dispatch each and difference — cancels the fixed dispatch + tunnel
    # RTT that block_until_ready timing bills to the solve (~3 ms/step at
    # N_STEPS=8), same methodology as the FK metric below
    def timed_steps(n_steps):
        fn = run_steps_fn(n_steps)
        s, c = fn(state)
        np.asarray(c)
        best = float("inf")
        for _ in range(N_REPEATS):
            t0 = time.perf_counter()
            s, c = fn(state)
            np.asarray(c)
            best = min(best, time.perf_counter() - t0)
        return best

    K_LO_S, K_HI_S = N_STEPS, 3 * N_STEPS
    per_step_s = (timed_steps(K_HI_S) - timed_steps(K_LO_S)) \
        / (K_HI_S - K_LO_S)
    best = B / per_step_s

    print(json.dumps({
        "metric": "panda_mpc_solves_per_s_per_chip",
        "value": round(best, 1),
        "unit": "solves/s/chip (B=%d, H=%d, 2 GN iters/solve,"
                " chained timing)" % (B, H),
        "vs_baseline": round(best / TARGET_PER_CHIP, 2),
    }))

    # second protocol metric: FK rollouts/s/chip (BASELINE.md).  Uses the
    # lanes FK (43x the AoS path: (B,3,3) rotations tile-pad ~40x on TPU)
    # and chained-difference timing (block_until_ready does not reliably
    # drain the remote axon queue — see benchmarks/chained_timing.py).

    from torch_robotics_tpu.ops.lanes_fk import fk_positions_lanes
    B_fk = 65536
    q = jax.random.uniform(jax.random.PRNGKey(1), (B_fk, d),
                           minval=robot.q_min, maxval=robot.q_max)

    def chained_fk(K):
        @jax.jit
        def loop(q):
            def body(qq, _):
                t = fk_positions_lanes(robot.model, qq)
                # coupling too small to change values, defeats DCE; the
                # sum touches EVERY output element so no link's position
                # computation can be dead-code-eliminated (a single-element
                # coupling let XLA drop non-ancestor links' outputs)
                return qq + 1e-30 * jnp.sum(t, axis=(1, 2))[:, None], None
            qq, _ = jax.lax.scan(body, q, None, length=K)
            return qq[0, 0]
        return loop

    def timed(fn):
        np.asarray(fn(q))          # warm up / compile; real round-trip drain
        best = float("inf")
        for _ in range(N_REPEATS + 2):
            t0 = time.perf_counter()
            np.asarray(fn(q))
            best = min(best, time.perf_counter() - t0)
        return best

    # wide K spread: the K-difference cancels dispatch+RTT, and a large
    # K_HI - K_LO keeps tunnel-latency jitter small relative to the
    # differenced kernel time (run-to-run spread was +-20% at K_HI=32)
    K_LO, K_HI = 4, 64
    per_batch_s = (timed(chained_fk(K_HI)) - timed(chained_fk(K_LO))) \
        / (K_HI - K_LO)
    print(json.dumps({
        "metric": "panda_fk_rollouts_per_s_per_chip",
        "value": round(B_fk / per_batch_s, 0),
        "unit": "FK rollouts/s/chip (lanes FK, B=%d, chained timing)" % B_fk,
        "vs_baseline": round(B_fk / per_batch_s / FK_BASELINE_PER_CHIP, 2),
    }))


if __name__ == "__main__":
    probe_backend()
    try:
        main()
    except Exception:  # noqa: BLE001 — structured artifact over raw traceback
        _fail("bench", traceback.format_exc())
