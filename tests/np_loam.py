"""Clean-room numpy implementation of LOAM scan-registration semantics,
written directly from the algorithm spec (SURVEY.md §3.3) for cross-checking
the vectorized JAX kernel. Sequential and simple on purpose."""

import numpy as np


def assign_rings_np(xyz, n_scans):
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    angle = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    if n_scans == 64:
        sid = np.where(
            angle >= -8.83,
            np.trunc((2.0 - angle) * 3.0 + 0.5),
            32 + np.trunc((-8.83 - angle) * 2.0 + 0.5),
        ).astype(int)
        ok = (angle <= 2.0) & (angle >= -24.33) & (sid >= 0) & (sid <= 50)
    elif n_scans == 32:
        sid = np.trunc((angle + 92.0 / 3.0) * 3.0 / 4.0).astype(int)
        ok = (sid >= 0) & (sid < 32)
    elif n_scans == 16:
        sid = np.trunc((angle + 15.0) / 2.0 + 0.5).astype(int)
        ok = (sid >= 0) & (sid < 16)
    else:
        raise ValueError
    return sid, ok


def rel_time_np(xyz, valid_range, valid_full):
    """Sequential halfPassed azimuth interpolation."""
    n = len(xyz)
    ori_all = -np.arctan2(xyz[:, 1], xyz[:, 0])
    first = int(np.argmax(valid_range))
    last = n - 1 - int(np.argmax(valid_range[::-1]))
    start = ori_all[first]
    end = ori_all[last] + 2 * np.pi
    if end - start > 3 * np.pi:
        end -= 2 * np.pi
    elif end - start < np.pi:
        end += 2 * np.pi
    out = np.zeros(n)
    half = False
    for i in range(n):
        if not valid_full[i]:
            continue
        ori = ori_all[i]
        if not half:
            if ori < start - np.pi / 2:
                ori += 2 * np.pi
            elif ori > start + 3 * np.pi / 2:
                ori -= 2 * np.pi
            if ori - start > np.pi:
                half = True
        else:
            ori += 2 * np.pi
            if ori < end - 3 * np.pi / 2:
                ori += 2 * np.pi
            elif ori > end + np.pi / 2:
                ori -= 2 * np.pi
        out[i] = (ori - start) / (end - start)
    return out


def curvature_np(ring_pts, cnt):
    r = len(ring_pts)
    c = np.zeros(r)
    for i in range(5, min(cnt, r) - 5):
        d = ring_pts[i - 5 : i + 6].sum(axis=0) - 11.0 * ring_pts[i]
        c[i] = float(d @ d)
    return c


def select_ring_np(pts, curv, cnt, n_sectors=6, thr=0.1, gap_sq=0.05,
                   n_sharp=2, n_less_sharp=20, n_flat=4):
    """Greedy per-ring selection; returns label array (2/1/-1/0)."""
    r = len(pts)
    label = np.zeros(r, int)
    picked = np.zeros(r, bool)
    start, end = 5, cnt - 6
    if end - start < 6:
        return label

    def suppress(ind):
        picked[ind] = True
        for l in range(1, 6):
            if ind + l >= r:
                break
            d = pts[ind + l] - pts[ind + l - 1]
            if d @ d > gap_sq:
                break
            picked[ind + l] = True
        for l in range(1, 6):
            if ind - l < 0:
                break
            d = pts[ind - l] - pts[ind - l + 1]
            if d @ d > gap_sq:
                break
            picked[ind - l] = True

    for j in range(n_sectors):
        sp = start + (end - start) * j // n_sectors
        ep = start + (end - start) * (j + 1) // n_sectors - 1
        idx = np.arange(sp, ep + 1)
        order = idx[np.argsort(curv[sp : ep + 1], kind="stable")]
        # corners: descending curvature
        n_pick = 0
        for ind in order[::-1]:
            if picked[ind] or curv[ind] <= thr:
                continue
            n_pick += 1
            if n_pick > n_less_sharp:
                break
            label[ind] = 2 if n_pick <= n_sharp else 1
            suppress(ind)
        # flats: ascending curvature
        n_pick = 0
        for ind in order:
            if picked[ind] or curv[ind] >= thr:
                continue
            label[ind] = -1
            n_pick += 1
            if n_pick >= n_flat:
                break
            suppress(ind)
    return label
