"""Scene clustering: partition the match graph for hierarchical mapping.

Reference: src/colmap/scene/scene_clustering.h:43-96 — hierarchical
normalized multi-way cut (Metis) of the image match graph with
`image_overlap` shared images between sibling clusters.

TPU-stack design: the normalized cut is computed spectrally — the Fiedler
vector of the normalized graph Laplacian (scipy sparse eigensolver; the
graph is host-scale) drives recursive bisection; overlap images are the
strongest cross-cut neighbors, like the reference's overlapping-image
transfer.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class SceneClusteringOptions:
    """Reference: SceneClustering::Options (scene_clustering.h:46)."""

    branching: int = 2
    image_overlap: int = 50
    leaf_max_num_images: int = 500


@dataclasses.dataclass
class Cluster:
    image_ids: List[int]
    children: List["Cluster"] = dataclasses.field(default_factory=list)

    def leaves(self) -> List["Cluster"]:
        if not self.children:
            return [self]
        out = []
        for c in self.children:
            out.extend(c.leaves())
        return out


def _fiedler_bisect(ids: List[int], weights: Dict[Tuple[int, int], float]
                    ) -> Tuple[List[int], List[int]]:
    """Spectral bisection via the Fiedler vector of the normalized Laplacian."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    n = len(ids)
    idx = {iid: i for i, iid in enumerate(ids)}
    rows, cols, vals = [], [], []
    for (a, b), w in weights.items():
        if a in idx and b in idx:
            rows += [idx[a], idx[b]]
            cols += [idx[b], idx[a]]
            vals += [w, w]
    W = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    deg = np.asarray(W.sum(1)).reshape(-1)
    deg = np.maximum(deg, 1e-9)
    Dm = sp.diags(1.0 / np.sqrt(deg))
    L = sp.eye(n) - Dm @ W @ Dm
    try:
        evals, evecs = spla.eigsh(L, k=2, which="SM", maxiter=2000,
                                  tol=1e-4)
        fiedler = evecs[:, np.argsort(evals)[1]]
    except Exception:
        fiedler = np.asarray(range(n), float)  # fallback: arbitrary split
    order = np.argsort(fiedler)
    half = n // 2
    left = [ids[i] for i in order[:half]]
    right = [ids[i] for i in order[half:]]
    return left, right


def cluster_scene(image_ids: Sequence[int],
                  edge_weights: Dict[Tuple[int, int], float],
                  options: SceneClusteringOptions = SceneClusteringOptions()
                  ) -> Cluster:
    """Recursive partition; returns the cluster tree (reference:
    SceneClustering::Partition)."""
    weights = {tuple(sorted(k)): float(v) for k, v in edge_weights.items()}

    def build(ids: List[int]) -> Cluster:
        node = Cluster(image_ids=list(ids))
        if len(ids) <= options.leaf_max_num_images:
            return node
        parts = [ids]
        while len(parts) < options.branching:
            big = max(range(len(parts)), key=lambda i: len(parts[i]))
            l, r = _fiedler_bisect(parts[big], weights)
            if not l or not r:
                break
            parts[big:big + 1] = [l, r]
        if len(parts) < 2:
            return node
        node.children = [build(p) for p in parts]
        return node

    root = build(list(image_ids))

    # add overlapping images to the leaves (reference: image_overlap)
    if options.image_overlap > 0:
        adj: Dict[int, List[Tuple[int, float]]] = {}
        for (a, b), w in weights.items():
            adj.setdefault(a, []).append((b, w))
            adj.setdefault(b, []).append((a, w))
        for leaf in root.leaves():
            members = set(leaf.image_ids)
            cross: Dict[int, float] = {}
            for iid in leaf.image_ids:
                for nbr, w in adj.get(iid, ()):
                    if nbr not in members:
                        cross[nbr] = cross.get(nbr, 0.0) + w
            extra = sorted(cross.items(), key=lambda kv: -kv[1])
            leaf.image_ids.extend(
                [iid for iid, _ in extra[: options.image_overlap]])
    return root


def edge_weights_from_database(database, min_num_inliers: int = 15
                               ) -> Dict[Tuple[int, int], float]:
    """Match-graph edge weights = verified inlier counts."""
    out = {}
    for pair, g in database.read_all_two_view_geometries().items():
        n = len(g["inlier_matches"])
        if n >= min_num_inliers:
            out[pair] = float(n)
    return out
