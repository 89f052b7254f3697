"""Feature-level correspondence graph with CSR storage.

Reference: src/colmap/scene/correspondence_graph.h:42-110 — per (image,
feature) the flat range of corresponding (image, feature) pairs, plus
per-pair correspondence counts. Host-side numpy (vectorized build); the
mapper reads slices out of it to form device batches.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


class CorrespondenceGraph:
    def __init__(self):
        # per image: dict of raw match arrays keyed by other image
        self._matches: Dict[Tuple[int, int], np.ndarray] = {}
        self._num_observations: Dict[int, int] = {}
        self._num_correspondences: Dict[int, int] = {}
        self.finalized = False

    # -- build phase --------------------------------------------------------
    def add_image(self, image_id: int, num_features: int):
        self._num_observations[image_id] = num_features

    def add_correspondences(self, image_id1: int, image_id2: int, matches: np.ndarray):
        """matches: (K, 2) feature index pairs (columns follow arg order)."""
        if image_id1 == image_id2:
            return
        if image_id1 > image_id2:
            image_id1, image_id2 = image_id2, image_id1
            matches = matches[:, ::-1]
        self._matches[(image_id1, image_id2)] = np.asarray(matches, np.int64)

    def finalize(self):
        """Build per-image CSR: feature -> [(other_image, other_feat)]."""
        per_image_edges: Dict[int, List[np.ndarray]] = {i: [] for i in self._num_observations}
        for (i1, i2), m in self._matches.items():
            if len(m) == 0:
                continue
            e1 = np.empty((len(m), 3), np.int64)
            e1[:, 0] = m[:, 0]
            e1[:, 1] = i2
            e1[:, 2] = m[:, 1]
            per_image_edges[i1].append(e1)
            e2 = np.empty((len(m), 3), np.int64)
            e2[:, 0] = m[:, 1]
            e2[:, 1] = i1
            e2[:, 2] = m[:, 0]
            per_image_edges[i2].append(e2)

        self._csr: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for image_id, chunks in per_image_edges.items():
            nf = self._num_observations[image_id]
            if chunks:
                edges = np.concatenate(chunks, axis=0)
                order = np.argsort(edges[:, 0], kind="stable")
                edges = edges[order]
                offsets = np.searchsorted(edges[:, 0], np.arange(nf + 1))
                self._csr[image_id] = (offsets, edges[:, 1], edges[:, 2])
                self._num_correspondences[image_id] = len(edges)
            else:
                self._csr[image_id] = (
                    np.zeros(nf + 1, np.int64),
                    np.zeros(0, np.int64),
                    np.zeros(0, np.int64),
                )
                self._num_correspondences[image_id] = 0
        self.finalized = True

    # -- queries -------------------------------------------------------------
    def image_ids(self):
        return list(self._num_observations)

    def num_correspondences_for_image(self, image_id: int) -> int:
        return self._num_correspondences.get(image_id, 0)

    def num_correspondences_between(self, image_id1: int, image_id2: int) -> int:
        if image_id1 > image_id2:
            image_id1, image_id2 = image_id2, image_id1
        m = self._matches.get((image_id1, image_id2))
        return 0 if m is None else len(m)

    def image_pairs(self):
        return list(self._matches.keys())

    def find_correspondences(self, image_id: int, point2D_idx: int):
        """-> (other_image_ids (K,), other_feat_idx (K,)) numpy views."""
        offsets, imgs, feats = self._csr[image_id]
        a, b = offsets[point2D_idx], offsets[point2D_idx + 1]
        return imgs[a:b], feats[a:b]

    def find_correspondences_all(self, image_id: int):
        """CSR arrays for a whole image: (offsets (F+1,), imgs (E,), feats (E,))."""
        return self._csr[image_id]

    def has_correspondences(self, image_id: int, point2D_idx: int) -> bool:
        offsets, _, _ = self._csr[image_id]
        return offsets[point2D_idx + 1] > offsets[point2D_idx]

    def find_transitive_correspondences(self, image_id: int, point2D_idx: int,
                                        transitivity: int = 2):
        """BFS up to `transitivity` hops (reference: FindTransitiveCorrespondences)."""
        seen = {(image_id, int(point2D_idx))}
        frontier = [(image_id, int(point2D_idx))]
        out_imgs, out_feats = [], []
        for _ in range(transitivity):
            nxt = []
            for (ii, ff) in frontier:
                imgs, feats = self.find_correspondences(ii, ff)
                for oi, of in zip(imgs, feats):
                    key = (int(oi), int(of))
                    if key not in seen:
                        seen.add(key)
                        nxt.append(key)
                        out_imgs.append(int(oi))
                        out_feats.append(int(of))
            frontier = nxt
            if not frontier:
                break
        return np.array(out_imgs, np.int64), np.array(out_feats, np.int64)
