"""Feature matching + geometric verification pipeline: pairs -> database.

Re-design of the reference matcher/verifier worker pipeline
(reference: src/colmap/controllers/feature_matching_utils.cc:69-440 and the
per-strategy factories in controllers/feature_matching.h:64-120) for TPU:

- Descriptors of a pair block are packed into fixed-capacity device arrays
  and matched with ONE batched int8 GEMM program (`match_pairs_batch` — the
  MXU path replacing SiftMatchGPU).
- Geometric verification runs as a batched two-view RANSAC over the block
  (`estimate_two_view_geometry` vmapped over pairs), replacing the
  per-pair VerifierWorker threads.
- Results are written to SQLite in one transaction per block, like the
  reference's batched DB writes.

The pair-block axis is the sharding axis for multi-chip matching.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colmap_tpu.estimators import two_view_geometry as tvg
from colmap_tpu.features import matching as matching_mod
from colmap_tpu.features import pairing as pairing_mod
from colmap_tpu.features.sift import affine_to_keypoints
from colmap_tpu.scene.database import Database
from colmap_tpu.sensor import models as camera_models

logger = logging.getLogger("colmap_tpu")


@dataclasses.dataclass
class FeatureMatchingOptions:
    matching: matching_mod.MatchingOptions = dataclasses.field(
        default_factory=matching_mod.MatchingOptions)
    verification: tvg.TwoViewGeometryOptions = dataclasses.field(
        default_factory=tvg.TwoViewGeometryOptions)
    guided_matching: bool = False
    max_num_matches: int = 32768  # reference: sift.h:136
    # fixed per-image descriptor capacity for the batched pair program
    feature_capacity: int = 8192
    block_pairs: int = 32  # pairs per device batch
    min_num_inliers: int = 15
    # multi-device distribution (TPU analog of the reference's multi-GPU
    # matcher workers, controllers/feature_matching_utils.cc + comma GPU
    # lists in feature/sift.h:44-46): >1 shards each pair block's leading
    # axis over a jax.sharding.Mesh — every chip matches + verifies its
    # slice of the block with the same program. 0 = all local devices;
    # 1 = single-device (default).
    num_devices: int = 1


class _ImageData:
    """Host-side per-image cache of descriptors/keypoints/rays."""

    def __init__(self, db: Database, cameras: Dict[int, dict]):
        self.db = db
        self.cameras = cameras
        self.images = db.read_images()
        self._cache: Dict[int, dict] = {}

    def get(self, image_id: int) -> dict:
        if image_id not in self._cache:
            desc = self.db.read_descriptors(image_id)
            kp = self.db.read_keypoints(image_id)
            xy, _, _ = affine_to_keypoints(kp)
            cam = self.cameras[self.images[image_id]["camera_id"]]
            params = camera_models.pad_params(list(cam["params"]))
            rays = np.asarray(camera_models.cam_from_img(
                cam["model_id"], jnp.asarray(params), jnp.asarray(xy)))
            i_fx, i_fy, _, _ = camera_models._FXFY_CXCY[
                camera_models.CameraModelId(cam["model_id"])]
            focal = 0.5 * (cam["params"][i_fx] + cam["params"][i_fy])
            self._cache[image_id] = {
                "desc": desc, "xy": xy.astype(np.float32),
                "rays": rays.astype(np.float32), "focal": float(focal),
            }
        return self._cache[image_id]


def _pad_to(arr: np.ndarray, cap: int) -> Tuple[np.ndarray, np.ndarray]:
    n = min(len(arr), cap)
    out = np.zeros((cap,) + arr.shape[1:], arr.dtype)
    out[:n] = arr[:n]
    valid = np.zeros(cap, bool)
    valid[:n] = True
    return out, valid


@dataclasses.dataclass
class MatchingStats:
    num_matched_pairs: int = 0
    num_verified_pairs: int = 0
    num_inlier_matches: int = 0


def match_and_verify_blocks(
    database: Database,
    pair_blocks: Iterable[Sequence[Tuple[int, int]]],
    options: FeatureMatchingOptions = FeatureMatchingOptions(),
    seed: int = 0,
    controller=None,
) -> MatchingStats:
    """Match + verify all pair blocks and persist matches/two-view geometries.

    `controller` (util.controller.BaseController) injects Stop/Pause
    between blocks."""
    cameras = database.read_cameras()
    data = _ImageData(database, cameras)
    cap = options.feature_capacity
    stats = MatchingStats()
    key = jax.random.PRNGKey(seed)

    match_opts = options.matching
    verify_opts = options.verification

    # multi-device: shard the pair axis of every block over the mesh
    # (parallel/sharded_matching design, wired into the product path)
    from colmap_tpu.sfm.incremental_mapper import resolve_num_devices

    n_dev = resolve_num_devices(options.num_devices)
    pair_sharding = None
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec
        from colmap_tpu.parallel.mesh import DATA_AXIS, make_mesh

        mesh = make_mesh(n_dev)
        pair_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))

    def put(tree):
        if pair_sharding is None:
            return tree
        return jax.tree.map(
            lambda x: jax.device_put(x, pair_sharding), tree)

    # batched verification program (vmap over the pair axis); image sizes
    # enable watermark detection (reference: detect_watermark default on)
    @jax.jit
    def verify_batch(keys, rays1, rays2, pix1, pix2, valid, focal,
                     sizes1, sizes2):
        return jax.vmap(
            lambda k, r1, r2, p1, p2, v, f, s1, s2:
            tvg.estimate_two_view_geometry(
                k, r1, r2, p1, p2, v, f, verify_opts, sizes1=s1, sizes2=s2)
        )(keys, rays1, rays2, pix1, pix2, valid, focal, sizes1, sizes2)

    for block in pair_blocks:
        if controller is not None and controller.check_if_stopped():
            break
        block = list(block)
        if not block:
            continue
        # pad the pair axis so it splits evenly across devices (padding
        # rows have no valid features -> empty matches, skipped on host)
        B_full = len(block)
        if n_dev > 1:
            B_full = -(-len(block) // n_dev) * n_dev
        # ---- batched matching over the block ----
        d1 = np.zeros((B_full, cap, 128), np.uint8)
        d2 = np.zeros_like(d1)
        v1 = np.zeros((B_full, cap), bool)
        v2 = np.zeros_like(v1)
        for i, (a, b) in enumerate(block):
            da = data.get(a)["desc"]
            db_ = data.get(b)["desc"]
            d1[i, :min(len(da), cap)] = da[:cap]
            d2[i, :min(len(db_), cap)] = db_[:cap]
            v1[i, :min(len(da), cap)] = True
            v2[i, :min(len(db_), cap)] = True
        b1 = matching_mod.prepare_descriptors(
            d1.reshape(-1, 128), v1.reshape(-1))
        b1 = jax.tree.map(lambda x: x.reshape((B_full, cap) + x.shape[1:]), b1)
        b2 = matching_mod.prepare_descriptors(
            d2.reshape(-1, 128), v2.reshape(-1))
        b2 = jax.tree.map(lambda x: x.reshape((B_full, cap) + x.shape[1:]), b2)
        b1, b2 = put(b1), put(b2)
        midx = np.asarray(matching_mod.match_pairs_batch_auto(
            b1, b2, match_opts))

        # ---- collect per-pair correspondences (host) ----
        pair_matches = []
        for i, (a, b) in enumerate(block):
            m = matching_mod.matches_to_pairs(midx[i])
            if len(m) > options.max_num_matches:
                m = m[: options.max_num_matches]
            pair_matches.append(m)
            if len(m) > 0:
                database.write_matches(a, b, m)
                stats.num_matched_pairs += 1

        # ---- batched verification ----
        mcap = max(16, max((len(m) for m in pair_matches), default=16))
        mcap = int(2 ** np.ceil(np.log2(mcap)))
        B = B_full
        rays1 = np.zeros((B, mcap, 2), np.float32)
        rays2 = np.zeros_like(rays1)
        pix1 = np.zeros_like(rays1)
        pix2 = np.zeros_like(rays1)
        mvalid = np.zeros((B, mcap), bool)
        focal = np.ones(B, np.float32)
        sizes1 = np.ones((B, 2), np.float32)
        sizes2 = np.ones((B, 2), np.float32)
        images_meta = data.images
        for i, ((a, b), m) in enumerate(zip(block, pair_matches)):
            if len(m) == 0:
                continue
            da, db_ = data.get(a), data.get(b)
            n = min(len(m), mcap)
            rays1[i, :n] = da["rays"][m[:n, 0]]
            rays2[i, :n] = db_["rays"][m[:n, 1]]
            pix1[i, :n] = da["xy"][m[:n, 0]]
            pix2[i, :n] = db_["xy"][m[:n, 1]]
            mvalid[i, :n] = True
            focal[i] = np.sqrt(da["focal"] * db_["focal"])
            cam_a = cameras[images_meta[a]["camera_id"]]
            cam_b = cameras[images_meta[b]["camera_id"]]
            sizes1[i] = (cam_a["width"], cam_a["height"])
            sizes2[i] = (cam_b["width"], cam_b["height"])

        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, B)
        res = verify_batch(*put((keys, jnp.asarray(rays1),
                                 jnp.asarray(rays2), jnp.asarray(pix1),
                                 jnp.asarray(pix2), jnp.asarray(mvalid),
                                 jnp.asarray(focal), jnp.asarray(sizes1),
                                 jnp.asarray(sizes2))))
        res = jax.tree.map(np.asarray, res)

        # optional guided matching: re-match with the epipolar constraint
        # (reference: guided_matcher workers, feature_matching_utils.cc)
        guided = {}
        if options.guided_matching:
            for i, ((a, b), m) in enumerate(zip(block, pair_matches)):
                if len(m) == 0 or int(res.num_inliers[i]) < options.min_num_inliers:
                    continue
                da, db_ = data.get(a), data.get(b)
                xy1 = np.zeros((cap, 2), np.float32)
                xy2 = np.zeros((cap, 2), np.float32)
                xy1[: min(len(da["xy"]), cap)] = da["xy"][:cap]
                xy2[: min(len(db_["xy"]), cap)] = db_["xy"][:cap]
                gm = matching_mod.guided_match_descriptors(
                    jax.tree.map(lambda x: x[i], b1),
                    jax.tree.map(lambda x: x[i], b2),
                    jnp.asarray(xy1), jnp.asarray(xy2),
                    jnp.asarray(res.F[i], jnp.float32),
                    max_epipolar_error=verify_opts.max_error_px,
                    options=match_opts)
                gmp = matching_mod.matches_to_pairs(np.asarray(gm))
                if len(gmp) > len(m):
                    guided[i] = gmp[: options.max_num_matches]

        for i, ((a, b), m) in enumerate(zip(block, pair_matches)):
            ni = int(res.num_inliers[i])
            if len(m) == 0 or ni < options.min_num_inliers:
                continue
            if int(res.config[i]) == int(tvg.TwoViewConfig.WATERMARK):
                continue  # reference: watermark pairs are not used
            if i in guided:
                inlier_matches = guided[i]
            else:
                inl = res.inlier_mask[i][: len(m)]
                inlier_matches = m[inl[: len(m)]]
            pose = res.cam2_from_cam1[i]
            database.write_two_view_geometry(
                a, b, inlier_matches,
                config=int(res.config[i]),
                F=res.F[i], E=res.E[i], H=res.H[i],
                qvec=pose[:4], tvec=pose[4:],
            )
            stats.num_verified_pairs += 1
            stats.num_inlier_matches += len(inlier_matches)

        database.commit()
    return stats


# ---------------------------------------------------------------------------
# Strategy entry points (reference: controllers/feature_matching.h:64-120)
# ---------------------------------------------------------------------------


def _chunk(pairs: List[Tuple[int, int]], n: int):
    for i in range(0, len(pairs), n):
        yield pairs[i:i + n]


def match_exhaustive(database: Database,
                     options: FeatureMatchingOptions = FeatureMatchingOptions(),
                     pairing: Optional[pairing_mod.ExhaustivePairingOptions] = None,
                     seed: int = 0) -> MatchingStats:
    ids = sorted(database.read_images().keys())
    blocks = pairing_mod.exhaustive_pairs(
        ids, pairing or pairing_mod.ExhaustivePairingOptions())
    return match_and_verify_blocks(database, blocks, options, seed)


def match_sequential(database: Database,
                     options: FeatureMatchingOptions = FeatureMatchingOptions(),
                     pairing: Optional[pairing_mod.SequentialPairingOptions] = None,
                     seed: int = 0) -> MatchingStats:
    images = database.read_images()
    ids = [iid for iid, _ in sorted(images.items(), key=lambda kv: kv[1]["name"])]
    popts = pairing or pairing_mod.SequentialPairingOptions()
    pairs = pairing_mod.sequential_pairs(ids, popts)
    if popts.loop_detection:
        # vocab-tree loop closure (reference: SequentialPairGenerator,
        # feature/pairing.h:89-110) — retrieval pairs join the temporal set
        loop = pairing_mod.sequential_loop_detection_pairs(
            database, ids, popts, seed=seed)
        pairs = sorted(set(pairs) | set(loop))
    return match_and_verify_blocks(
        database, _chunk(pairs, options.block_pairs), options, seed)


def match_spatial(database: Database,
                  options: FeatureMatchingOptions = FeatureMatchingOptions(),
                  pairing: Optional["pairing_mod.SpatialPairingOptions"] = None,
                  seed: int = 0) -> MatchingStats:
    pairs = pairing_mod.spatial_pairs_from_database(
        database, pairing or pairing_mod.SpatialPairingOptions())
    return match_and_verify_blocks(
        database, _chunk(pairs, options.block_pairs), options, seed)


def match_pairs(database: Database, pairs: List[Tuple[int, int]],
                options: FeatureMatchingOptions = FeatureMatchingOptions(),
                seed: int = 0) -> MatchingStats:
    """Imported pair list (reference: ImportedPairGenerator)."""
    return match_and_verify_blocks(
        database, _chunk(pairs, options.block_pairs), options, seed)


def match_vocab_tree(database: Database,
                     options: FeatureMatchingOptions = FeatureMatchingOptions(),
                     vocab_tree_path: Optional[str] = None,
                     num_neighbors: int = 5,
                     seed: int = 0) -> MatchingStats:
    """Vocab-tree retrieval matching (reference: VocabTreeFeatureMatcher,
    controllers/feature_matching.h). Builds (or loads) the visual index,
    retrieves each image's neighbors, matches those pairs."""
    from colmap_tpu.retrieval import visual_index as vi_mod

    if vocab_tree_path:
        vi = vi_mod.VisualIndex.load(vocab_tree_path)
    else:
        vi = vi_mod.build_vocab_tree_from_database(
            database, vi_mod.VisualIndexOptions(), seed=seed)
    pairs = vi_mod.vocab_tree_pairs(database, vi, num_neighbors)
    return match_and_verify_blocks(
        database, _chunk(pairs, options.block_pairs), options, seed)


def match_transitive(database: Database,
                     options: FeatureMatchingOptions = FeatureMatchingOptions(),
                     num_iterations: int = 3,
                     seed: int = 0) -> MatchingStats:
    """Transitive closure matching (reference: TransitiveFeatureMatcher)."""
    total = MatchingStats()
    for _ in range(num_iterations):
        existing = [k for k in database.read_all_two_view_geometries()]
        new_pairs = pairing_mod.transitive_pairs(existing)
        new_pairs = [p for p in new_pairs
                     if database.read_matches(*p) is None]
        if not new_pairs:
            break
        st = match_and_verify_blocks(
            database, _chunk(new_pairs, options.block_pairs), options, seed)
        total.num_matched_pairs += st.num_matched_pairs
        total.num_verified_pairs += st.num_verified_pairs
        total.num_inlier_matches += st.num_inlier_matches
    return total
