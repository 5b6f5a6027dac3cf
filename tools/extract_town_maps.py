#!/usr/bin/env python
"""Offline town-geometry extraction.

Reads the binary road-mask images shipped with the reference
(/root/reference/PythonAPI/agents/navigation/Town0{1,2}.png, used there for
sidewalk tests via hardcoded world offsets, agent.py:23-27,268-281) plus the
traffic-light coordinate tables (misc/light_town{1,2}.txt) and distills them
into a compact **vector** description of each town: junction nodes, road
segment centerline polylines, road half-width, light positions.

The output JSON (lbc_tpu/maps/assets/townXX.json) is the canonical map asset
of this repo — everything downstream (rasters, waypoint lattices, lane
graphs, spawn points) is regenerated from these vectors by lbc_tpu.maps.
This script only needs to run when regenerating assets and requires the
reference checkout; the repo itself stays standalone.

Usage: python tools/extract_town_maps.py [--reference /root/reference]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
from PIL import Image
from scipy import ndimage

WORLD_OFFSETS = {  # pixel = 5 * (world - offset); agent.py:23-27
    'Town01': (-52.059906005859375, -52.04995942115784),
    'Town02': (-57.459808349609375, 55.3907470703125),
}
PIXELS_PER_METER = 5.0


def zhang_suen_thin(mask: np.ndarray, max_iter=200) -> np.ndarray:
    """Binary thinning to a 1-px skeleton (vectorised Zhang-Suen)."""
    img = mask.astype(np.uint8).copy()

    def neighbours(a):
        p2 = np.roll(a, -1, 0)
        p3 = np.roll(np.roll(a, -1, 0), 1, 1)
        p4 = np.roll(a, 1, 1)
        p5 = np.roll(np.roll(a, 1, 0), 1, 1)
        p6 = np.roll(a, 1, 0)
        p7 = np.roll(np.roll(a, 1, 0), -1, 1)
        p8 = np.roll(a, -1, 1)
        p9 = np.roll(np.roll(a, -1, 0), -1, 1)
        return p2, p3, p4, p5, p6, p7, p8, p9

    for _ in range(max_iter):
        changed = False
        for step in (0, 1):
            p2, p3, p4, p5, p6, p7, p8, p9 = neighbours(img)
            ring = [p2, p3, p4, p5, p6, p7, p8, p9, p2]
            a = sum(((ring[k] == 0) & (ring[k + 1] == 1)).astype(np.uint8)
                    for k in range(8))
            b = p2 + p3 + p4 + p5 + p6 + p7 + p8 + p9
            if step == 0:
                cond = (p2 * p4 * p6 == 0) & (p4 * p6 * p8 == 0)
            else:
                cond = (p2 * p4 * p8 == 0) & (p2 * p6 * p8 == 0)
            remove = (img == 1) & (a == 1) & (b >= 2) & (b <= 6) & cond
            if remove.any():
                img[remove] = 0
                changed = True
        if not changed:
            break
    return img.astype(bool)


NBR = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def skeleton_graph(skel: np.ndarray):
    """Vectorize the skeleton into (node centers, edges-as-pixel-paths).

    Robust component approach: node pixels are skeleton pixels with degree
    != 2 (dilated so nearby junction pixels merge into one node cluster);
    every connected component of the remaining skeleton is a simple path
    whose pixels we order by walking from one end.
    """
    deg = ndimage.convolve(skel.astype(np.uint8), np.ones((3, 3), np.uint8),
                           mode='constant')
    deg = np.where(skel, deg - 1, 0)
    node_seed = skel & (deg != 2)
    # merge junction pixels within ~1 m into one node cluster
    node_mask = ndimage.binary_dilation(
        node_seed, structure=np.ones((3, 3)), iterations=3) & skel
    lbl, n_nodes = ndimage.label(node_mask, structure=np.ones((3, 3)))
    centers = [np.array(c) for c in ndimage.center_of_mass(
        node_seed, lbl, range(1, n_nodes + 1))]
    # fall back to cluster centroid when a cluster holds no seed pixel
    cluster_cent = ndimage.center_of_mass(node_mask, lbl,
                                          range(1, n_nodes + 1))
    for i, c in enumerate(centers):
        if np.any(np.isnan(c)):
            centers[i] = np.array(cluster_cent[i])

    edge_mask = skel & ~node_mask
    elbl, n_edges = ndimage.label(edge_mask, structure=np.ones((3, 3)))

    H, W = skel.shape
    edges = []
    for eid in range(1, n_edges + 1):
        rs, cs = np.nonzero(elbl == eid)
        if len(rs) < 2:
            continue
        pix = set(zip(rs.tolist(), cs.tolist()))

        def seg_neighbors(p):
            return [(p[0] + dr, p[1] + dc) for dr, dc in NBR
                    if (p[0] + dr, p[1] + dc) in pix]

        ends = [p for p in pix if len(seg_neighbors(p)) <= 1]
        start = ends[0] if ends else next(iter(pix))
        # walk the path
        path = [start]
        seen = {start}
        cur = start
        while True:
            nxt = [q for q in seg_neighbors(cur) if q not in seen]
            if not nxt:
                break
            # prefer 4-adjacent step
            nxt.sort(key=lambda q: abs(q[0] - cur[0]) + abs(q[1] - cur[1]))
            cur = nxt[0]
            seen.add(cur)
            path.append(cur)

        def adjacent_node(p):
            best = 0
            found = -1
            for dr, dc in NBR + [(0, 0)]:
                r, c = p[0] + dr, p[1] + dc
                if 0 <= r < H and 0 <= c < W and lbl[r, c] > 0:
                    found = lbl[r, c] - 1
            return found

        na = adjacent_node(path[0])
        nb = adjacent_node(path[-1])
        if na < 0 or nb < 0:
            continue  # floating fragment
        # prepend/append node centers so the polyline reaches the junction
        full = [tuple(centers[na])] + path + [tuple(centers[nb])]
        edges.append(([na, nb], full))

    return centers, edges


def _path_len(path):
    p = np.asarray(path, float)
    return float(np.sum(np.hypot(*np.diff(p, axis=0).T)))


def cleanup_graph(centers, edges, min_spur_px=60):
    """Drop short dead-end spurs (thinning artifacts) and splice the two
    edges of every degree-2 node into one polyline. Town01/02 have no real
    dead-end roads, so any remaining degree-1 stub is an artifact."""
    edges = list(edges)
    changed = True
    while changed:
        changed = False
        deg = {}
        for ends, _ in edges:
            for n in ends:
                deg[n] = deg.get(n, 0) + 1
        # 1) drop short spurs ending at a degree-1 node
        kept = []
        for ends, path in edges:
            a, b = ends
            spur = ((deg.get(a, 0) == 1 or deg.get(b, 0) == 1)
                    and _path_len(path) < min_spur_px)
            if spur:
                changed = True
            else:
                kept.append((ends, path))
        edges = kept
        # 2) splice degree-2 nodes
        deg = {}
        for ends, _ in edges:
            for n in ends:
                deg[n] = deg.get(n, 0) + 1
        for node, d in list(deg.items()):
            if d != 2:
                continue
            touching = [i for i, (ends, _) in enumerate(edges)
                        if node in ends]
            if len(touching) != 2:
                continue  # self-loop through the node; leave it
            i, j = touching
            (ea, pa), (eb, pb) = edges[i], edges[j]
            pa = list(pa) if ea[1] == node else list(pa)[::-1]
            a_other = ea[0] if ea[1] == node else ea[1]
            pb = list(pb) if eb[0] == node else list(pb)[::-1]
            b_other = eb[1] if eb[0] == node else eb[0]
            merged = pa + pb[1:]
            edges = [e for k, e in enumerate(edges) if k not in (i, j)]
            edges.append(([a_other, b_other], merged))
            changed = True
            break  # degrees changed; recompute

    # compact node ids
    used = sorted({n for ends, _ in edges for n in ends})
    remap = {n: i for i, n in enumerate(used)}
    new_centers = [centers[n] for n in used]
    new_edges = [([remap[a], remap[b]], path) for (a, b), path in edges]
    return new_centers, new_edges


def rdp(points: np.ndarray, eps: float) -> np.ndarray:
    """Ramer-Douglas-Peucker polyline simplification."""
    if len(points) < 3:
        return points
    start, end = points[0], points[-1]
    d = end - start
    norm = np.hypot(*d)
    if norm < 1e-9:
        dist = np.hypot(*(points - start).T)
    else:
        dist = np.abs(np.cross(d, points - start)) / norm
    idx = int(np.argmax(dist))
    if dist[idx] > eps:
        left = rdp(points[:idx + 1], eps)
        right = rdp(points[idx:], eps)
        return np.vstack([left[:-1], right])
    return np.array([start, end])


def extract_town(ref: Path, town: str):
    img = np.array(Image.open(
        ref / 'PythonAPI' / 'agents' / 'navigation' / f'{town}.png'))
    mask = img[..., 0] > 128

    dt = ndimage.distance_transform_edt(mask)
    print(f'{town}: mask {mask.shape}, road px {mask.sum()}')

    skel = zhang_suen_thin(mask)
    print(f'{town}: skeleton px {skel.sum()}')

    nodes_px, edges_px = skeleton_graph(skel)
    nodes_px, edges_px = cleanup_graph(nodes_px, edges_px)

    ox, oy = WORLD_OFFSETS[town]

    def to_world(rc):
        r, c = rc
        return [round(c / PIXELS_PER_METER + ox, 2),
                round(r / PIXELS_PER_METER + oy, 2)]

    nodes = [to_world(c) for c in nodes_px]

    edges = []
    half_widths = []
    for (ends, path) in edges_px:
        path = np.array(path, float)
        if len(path) < 2:
            continue
        length_px = np.sum(np.hypot(*np.diff(path, axis=0).T))
        if length_px < 15:  # < 3 m stub between junction clusters
            continue
        hw = float(np.median([dt[int(r), int(c)] for r, c in
                              path[::max(1, len(path) // 20)]]))
        half_widths.append(hw)
        simp = rdp(path, eps=1.2)
        edges.append({
            'nodes': [int(e) for e in ends],
            'points': [to_world(p) for p in simp],
            'half_width_m': round(hw / PIXELS_PER_METER, 2),
        })

    lane_width = round(2 * np.median(half_widths) / PIXELS_PER_METER / 2, 2)
    print(f'{town}: {len(nodes)} nodes, {len(edges)} edges, '
          f'median half-width {np.median(half_widths) / 5:.2f} m')

    lights = []
    idx = {'Town01': '1', 'Town02': '2'}[town]
    light_file = ref / 'misc' / f'light_town{idx}.txt'
    for line in light_file.read_text().strip().splitlines():
        x, y = map(float, line.split())
        lights.append([x, y])

    return {
        'name': town,
        'world_offset': [ox, oy],
        'pixels_per_meter': PIXELS_PER_METER,
        'mask_shape': list(mask.shape),
        'lane_width_m': lane_width,
        'nodes': nodes,
        'edges': edges,
        'lights': lights,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reference', default='/root/reference')
    ap.add_argument('--out', default=str(Path(__file__).resolve().parents[1]
                                         / 'lbc_tpu' / 'maps' / 'assets'))
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for town in ('Town01', 'Town02'):
        data = extract_town(Path(args.reference), town)
        path = out / f'{town.lower()}.json'
        path.write_text(json.dumps(data))
        print(f'wrote {path} ({path.stat().st_size // 1024} KiB)')


if __name__ == '__main__':
    main()
