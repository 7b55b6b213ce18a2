import numpy as np
import jax.numpy as jnp

from vloam_tpu.lidar.hashgrid import build_cell_grid, cell_grid_knn


def test_cell_grid_knn_matches_bruteforce_within_radius(rng):
    pts = rng.uniform(-20, 20, (5000, 3)).astype(np.float32)
    mask = np.ones(5000, bool)
    mask[4500:] = False
    q = rng.uniform(-18, 18, (300, 3)).astype(np.float32)
    grid = build_cell_grid(jnp.asarray(pts), jnp.asarray(mask), 1.0, cap=32)
    d, near = cell_grid_knn(grid, jnp.asarray(q), k=5)
    d, near = np.asarray(d), np.asarray(near)

    D = np.sum((q[:, None] - pts[None]) ** 2, axis=-1)
    D[:, ~mask] = np.inf
    want_i = np.argsort(D, axis=1)[:, :5]
    want_d = np.take_along_axis(D, want_i, axis=1)

    # within the guaranteed radius (cell size), results must agree exactly
    for k in range(300):
        for j in range(5):
            if want_d[k, j] < 1.0:
                assert abs(d[k, j] - want_d[k, j]) < 1e-4, (k, j)
                assert np.allclose(near[k, j], pts[want_i[k, j]], atol=1e-6)
        # the 1m-radius gate decision must agree
        got_gate = d[k, 4] < 1.0
        want_gate = want_d[k, 4] < 1.0
        assert got_gate == want_gate


def test_cell_grid_dense_cells_capacity(rng):
    # points denser than capacity: nearest ones may be dropped, but at the
    # map's voxel-filtered density (>=0.8m spacing) capacity is sufficient
    pts = (np.mgrid[0:8, 0:8, 0:8].reshape(3, -1).T * 0.9).astype(np.float32)
    mask = np.ones(len(pts), bool)
    grid = build_cell_grid(jnp.asarray(pts), jnp.asarray(mask), 1.0, cap=16)
    q = jnp.asarray(pts[:50] + 0.05)
    d, near = cell_grid_knn(grid, q, k=5)
    d = np.asarray(d)
    assert (d[:, 0] < 0.01).all()  # each query finds its own point
    assert np.isfinite(d[:, 4]).all()
    assert (d[:, 4] < 4.0).all()  # real neighbors, not sentinels


def test_cell_grid_sparse_returns_sentinels(rng):
    pts = np.asarray([[0.0, 0, 0], [0.2, 0, 0]], np.float32)
    grid = build_cell_grid(jnp.asarray(pts), jnp.ones(2, bool), 1.0, cap=8)
    d, near = cell_grid_knn(grid, jnp.asarray([[0.1, 0, 0]], np.float32), k=5)
    d = np.asarray(d)
    assert d[0, 0] < 0.011 and d[0, 1] < 0.011
    assert (d[0, 2:] > 1.0e3).all()  # sentinel distances fail the 1m gate
