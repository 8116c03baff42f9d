import numpy as np
import pytest

from torch_robotics_tpu.native import KdTree, native_available


def brute_nearest(pts, q):
    return int(np.argmin(np.linalg.norm(np.asarray(pts) - q, axis=-1)))


def test_kdtree_matches_brute_force():
    rng = np.random.RandomState(0)
    dim = 7
    tree = KdTree(dim)
    pts = []
    for i in range(2000):
        p = rng.uniform(-3, 3, dim).astype(np.float32)
        idx = tree.insert(p)
        assert idx == i
        pts.append(p)
        if i % 100 == 0:
            q = rng.uniform(-3, 3, dim).astype(np.float32)
            i_tree = tree.nearest(q)
            i_ref = brute_nearest(pts, q)
            d_tree = np.linalg.norm(pts[i_tree] - q)
            d_ref = np.linalg.norm(pts[i_ref] - q)
            np.testing.assert_allclose(d_tree, d_ref, rtol=1e-6)
    assert len(tree) == 2000
    np.testing.assert_allclose(tree.get_point(5), pts[5])


def test_native_build_succeeds():
    # g++ is part of the baked toolchain; the native path should be active
    assert native_available()
