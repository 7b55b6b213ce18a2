import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from vloam_tpu.config import LaserMappingConfig
from vloam_tpu.parallel.sharded import data_mesh, shard_batch
from vloam_tpu.parallel.sharded_mapping import sharded_map_alignment


def make_structured_world(rng, n_planes=8, n_lines=8, pts_per=400):
    """Map points on random planes and lines + the scan points that should
    land on them under the true pose."""
    map_pts, queries = [], []
    for _ in range(n_planes):
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        # two tangents
        a = np.cross(n, [1, 0.3, 0.2])
        a /= np.linalg.norm(a)
        b = np.cross(n, a)
        origin = rng.uniform(-15, 15, 3)
        uv = rng.uniform(-4, 4, (pts_per, 2))
        pts = origin + uv[:, :1] * a + uv[:, 1:] * b
        map_pts.append(pts)
        queries.append(origin + rng.uniform(-3, 3, (40, 2))[:, :1] * a
                       + rng.uniform(-3, 3, (40, 2))[:, 1:] * b)
    for _ in range(n_lines):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        origin = rng.uniform(-15, 15, 3)
        s = rng.uniform(-5, 5, (pts_per // 4, 1))
        map_pts.append(origin + s * d)
        queries.append(origin + rng.uniform(-4, 4, (10, 1)) * d)
    return np.concatenate(map_pts), np.concatenate(queries)


def test_sharded_map_alignment_recovers_pose(rng):
    cfg = LaserMappingConfig()
    map_surf, q_surf = make_structured_world(rng, n_planes=10, n_lines=0)
    map_corner, q_corner = make_structured_world(rng, n_planes=0, n_lines=12)

    q_true = R.from_rotvec([0.015, -0.02, 0.01])
    t_true = np.array([0.2, -0.15, 0.1])
    # scan points = world points pulled back into the (displaced) sensor frame
    c_stack = q_true.inv().apply(q_corner - t_true)
    s_stack = q_true.inv().apply(q_surf - t_true)

    mesh = data_mesh()
    x0 = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    x = sharded_map_alignment(
        mesh,
        jnp.asarray(c_stack, jnp.float32), jnp.ones(len(c_stack), bool),
        jnp.asarray(s_stack, jnp.float32), jnp.ones(len(s_stack), bool),
        shard_batch(jnp.asarray(map_corner, jnp.float32), mesh),
        shard_batch(jnp.ones(len(map_corner), bool), mesh),
        shard_batch(jnp.asarray(map_surf, jnp.float32), mesh),
        shard_batch(jnp.ones(len(map_surf), bool), mesh),
        x0, cfg,
    )
    x = np.asarray(x, np.float64)
    np.testing.assert_allclose(x[4:], t_true, atol=0.02)
    rot_err = (R.from_quat(x[:4] / np.linalg.norm(x[:4])).inv() * q_true).magnitude()
    assert rot_err < 5e-3, rot_err
