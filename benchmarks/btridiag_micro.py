"""Micro-benchmark of the block-tridiagonal solver at bench shapes.

Times solve_lanes_core at (H=64, m=14) across batch sizes.  If wall-clock is
flat in B, each scan step is per-op-overhead bound (the VPU is idle), which
is the premise of the partitioned (wider-lane) reformulations.

Run: python benchmarks/btridiag_micro.py
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/trt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp


def make_system(key, H, m, B, dtype=jnp.float32):
    """SPD block-tridiagonal system resembling the GPMP2 normal equations."""
    k1, k2 = jax.random.split(key)
    A = jax.random.normal(k1, (H, m, m, B), dtype)
    D = jnp.einsum("hikb,hjkb->hijb", A, A) / m \
        + 10.0 * jnp.eye(m, dtype=dtype)[None, :, :, None]
    U = jnp.broadcast_to(
        (-0.5 * jnp.eye(m, dtype=dtype))[None, :, :, None], (H, m, m, 1))
    b = jax.random.normal(k2, (H, m, B), dtype)
    return D, U, b


def time_solver(fn, D, U, b, repeats=5):
    out = fn(D, U, b)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(D, U, b)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    from torch_robotics_tpu.solve.btridiag_lanes import solve_lanes_core
    H, m = 64, 14
    solve = jax.jit(solve_lanes_core)
    print("H=%d m=%d  solve_lanes_core" % (H, m))
    for B in (256, 1024, 4096):   # 16384 OOMs HBM (solver buffers ~6 GB)
        D, U, b = make_system(jax.random.PRNGKey(0), H, m, B)
        dt, _ = time_solver(solve, D, U, b)
        print("  B=%5d  %7.2f ms   %8.1f solves/s  %6.1f us/scan-step"
              % (B, dt * 1e3, B / dt, dt * 1e6 / (2 * H)))


if __name__ == "__main__":
    main()
