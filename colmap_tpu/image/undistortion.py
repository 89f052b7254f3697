"""Image + reconstruction undistortion.

Reference: src/colmap/image/undistortion.h:40-119 (UndistortCameraOptions,
UndistortCamera, UndistortImage, COLMAPUndistorter). Produces the pinhole
workspace consumed by MVS: undistorted images + a transformed reconstruction
whose cameras are PINHOLE.
"""

from __future__ import annotations

import copy
import dataclasses
import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from colmap_tpu.image import warp as warp_mod
from colmap_tpu.scene.reconstruction import Camera, Reconstruction
from colmap_tpu.sensor import models as cm


@dataclasses.dataclass
class UndistortCameraOptions:
    """Reference: UndistortCameraOptions (image/undistortion.h:40)."""

    blank_pixels: float = 0.0  # 0 => no blank pixels (crop), 1 => keep all
    min_scale: float = 0.2
    max_scale: float = 2.0
    max_image_size: int = -1
    roi_min_x: float = 0.0
    roi_min_y: float = 0.0
    roi_max_x: float = 1.0
    roi_max_y: float = 1.0


def undistort_camera(options: UndistortCameraOptions, camera: Camera) -> Camera:
    """Compute the undistorted PINHOLE camera.

    Reference: UndistortCamera (undistortion.cc) — scales the pinhole frame
    so the blank-pixel policy holds along the image borders.
    """
    params = camera.padded_params()
    mid = camera.model_id
    i_fx, i_fy, i_cx, i_cy = cm._FXFY_CXCY[cm.CameraModelId(mid)]
    fx = float(camera.params[i_fx])
    fy = float(camera.params[i_fy])
    w, h = camera.width, camera.height

    # undistorted camera starts as the pinhole core of the source camera
    ucam = Camera(camera_id=camera.camera_id,
                  model_id=int(cm.CameraModelId.PINHOLE),
                  width=w, height=h,
                  params=np.array([fx, fy, w / 2.0, h / 2.0], np.float64))

    # sample border points, unproject through the distorted model to find
    # the scale range (reference walks the borders the same way)
    nb = 50
    xs = np.linspace(0.5, w - 0.5, nb)
    ys = np.linspace(0.5, h - 0.5, nb)
    border = np.concatenate([
        np.stack([xs, np.full(nb, 0.5)], -1),
        np.stack([xs, np.full(nb, h - 0.5)], -1),
        np.stack([np.full(nb, 0.5), ys], -1),
        np.stack([np.full(nb, w - 0.5), ys], -1),
    ]).astype(np.float32)
    uv = np.asarray(cm.cam_from_img(mid, jnp.asarray(params), jnp.asarray(border)))

    cx, cy = w / 2.0, h / 2.0
    # scale factors that map undistorted rays back inside the image
    with np.errstate(divide="ignore", invalid="ignore"):
        sx = np.abs((border[:, 0] - cx) / (fx * uv[:, 0]))
        sy = np.abs((border[:, 1] - cy) / (fy * uv[:, 1]))
    s = np.concatenate([sx[np.isfinite(sx)], sy[np.isfinite(sy)]])
    if len(s) == 0:
        return ucam
    # blank_pixels=0 -> shrink to min scale (no blank), 1 -> grow to max
    smin, smax = float(np.min(s)), float(np.max(s))
    scale = smin + options.blank_pixels * (smax - smin)
    scale = float(np.clip(scale, options.min_scale, options.max_scale))
    new_params = np.array([fx * scale, fy * scale, cx, cy], np.float64)

    if options.max_image_size > 0 and max(w, h) > options.max_image_size:
        r = options.max_image_size / max(w, h)
        ucam.width = int(round(w * r))
        ucam.height = int(round(h * r))
        new_params[:2] *= r
        new_params[2] = ucam.width / 2.0
        new_params[3] = ucam.height / 2.0
    ucam.params = new_params
    return ucam


def undistort_image(options: UndistortCameraOptions, image: np.ndarray,
                    camera: Camera,
                    ucam: Optional[Camera] = None) -> Tuple[np.ndarray, Camera]:
    """Undistort one image; returns (undistorted image, pinhole camera)."""
    if ucam is None:
        ucam = undistort_camera(options, camera)
    out = warp_mod.warp_between_cameras(
        jnp.asarray(image, jnp.float32),
        camera.model_id, jnp.asarray(camera.padded_params()),
        ucam.model_id, jnp.asarray(ucam.padded_params()),
        (ucam.height, ucam.width))
    return np.asarray(out), ucam


def undistort_reconstruction(options: UndistortCameraOptions,
                             rec: Reconstruction) -> Reconstruction:
    """Transform a reconstruction to undistorted PINHOLE cameras.

    Reference: COLMAPUndistorter rewriting sparse/ (undistortion.cc). The
    2D observations are re-projected into the undistorted frame.
    """
    out = copy.deepcopy(rec)
    ucams = {}
    for cid, cam in rec.cameras.items():
        ucams[cid] = undistort_camera(options, cam)
        out.cameras[cid] = ucams[cid]
    for iid, img in out.images.items():
        if len(img.xys) == 0:
            continue
        cam = rec.cameras[img.camera_id]
        ucam = ucams[img.camera_id]
        uv = cm.cam_from_img(cam.model_id,
                             jnp.asarray(cam.padded_params()),
                             jnp.asarray(img.xys, jnp.float32))
        xy_u = cm.img_from_cam(ucam.model_id,
                               jnp.asarray(ucam.padded_params()), uv)
        img.xys = np.asarray(xy_u, np.float64)
    return out


@dataclasses.dataclass
class UndistorterOptions(UndistortCameraOptions):
    pass


def run_undistorter(rec: Reconstruction, image_dir: str, output_path: str,
                    options: UndistortCameraOptions = UndistortCameraOptions()
                    ) -> Reconstruction:
    """COLMAP-layout undistortion workspace: images/ + sparse/ + stereo/.

    Reference: COLMAPUndistorter::Run (undistortion.cc) and the workspace
    layout in doc/format.rst:160-188.
    """
    from colmap_tpu.scene import reconstruction_io
    from colmap_tpu.sensor import bitmap as bitmap_mod

    os.makedirs(os.path.join(output_path, "images"), exist_ok=True)
    os.makedirs(os.path.join(output_path, "sparse"), exist_ok=True)
    for sub in ("depth_maps", "normal_maps"):
        os.makedirs(os.path.join(output_path, "stereo", sub), exist_ok=True)

    urec = undistort_reconstruction(options, rec)
    ucams = {cid: urec.cameras[cid] for cid in urec.cameras}
    for iid, img in rec.images.items():
        if not img.registered:
            continue
        bmp = bitmap_mod.read_bitmap(os.path.join(image_dir, img.name))
        und, _ = undistort_image(options, bmp.data, rec.cameras[img.camera_id],
                                 ucams[img.camera_id])
        dst = os.path.join(output_path, "images", img.name)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        bitmap_mod.write_bitmap(dst, und)
    reconstruction_io.write_model(urec, os.path.join(output_path, "sparse"),
                                  ext=".bin")
    return urec


def run_pmvs_undistorter(rec: Reconstruction, image_dir: str,
                         output_path: str,
                         options: UndistortCameraOptions = UndistortCameraOptions()):
    """CMVS/PMVS workspace export (reference: PMVSUndistorter,
    image/undistortion.h:94): pmvs/visualize/%08d.jpg undistorted images,
    pmvs/txt/%08d.txt P-matrix files ("CONTOUR" header), vis.dat from the
    covisibility of the sparse model, and a default option file."""
    import numpy as np

    from colmap_tpu.sensor import bitmap as bitmap_mod

    base = os.path.join(output_path, "pmvs")
    for sub in ("visualize", "txt", "models"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)

    reg = [iid for iid in sorted(rec.images)
           if rec.images[iid].registered]
    idx_of = {iid: k for k, iid in enumerate(reg)}
    ucams = {cid: undistort_camera(options, cam)
             for cid, cam in rec.cameras.items()}

    def quat_to_R(q):
        w, x, y, z = q / np.linalg.norm(q)
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])

    for iid in reg:
        img = rec.images[iid]
        k = idx_of[iid]
        bmp = bitmap_mod.read_bitmap(os.path.join(image_dir, img.name))
        und, ucam = undistort_image(options, bmp.data,
                                    rec.cameras[img.camera_id],
                                    ucams[img.camera_id])
        bitmap_mod.write_bitmap(
            os.path.join(base, "visualize", f"{k:08d}.jpg"), und)
        fx, fy, cx, cy = ucam.params[:4]
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        R = quat_to_R(img.cam_from_world[:4])
        t = img.cam_from_world[4:7]
        P = K @ np.concatenate([R, t[:, None]], axis=1)
        with open(os.path.join(base, "txt", f"{k:08d}.txt"), "w") as fp:
            fp.write("CONTOUR\n")
            for row in P:
                fp.write(f"{row[0]} {row[1]} {row[2]} {row[3]}\n")

    # vis.dat: covisibility via shared 3D points
    shared = {}
    for pt in rec.points3D.values():
        track = [idx_of[iid] for iid, _ in pt.track if iid in idx_of]
        for a in track:
            for b in track:
                if a != b:
                    shared.setdefault(a, set()).add(b)
    with open(os.path.join(base, "vis.dat"), "w") as fp:
        fp.write("VISDATA\n")
        fp.write(f"{len(reg)}\n")
        for k in range(len(reg)):
            vis = sorted(shared.get(k, ()))
            fp.write(f"{k} {len(vis)} " + " ".join(map(str, vis)) + "\n")

    with open(os.path.join(base, "option-all"), "w") as fp:
        fp.write("level 1\ncsize 2\nthreshold 0.7\nwsize 7\n"
                 "minImageNum 3\nCPU 4\nsetEdge 0\nuseBound 0\n"
                 "useVisData 1\nsequence -1\n"
                 f"timages -1 0 {len(reg)}\noimages 0\n")


def run_cmp_mvs_undistorter(rec: Reconstruction, image_dir: str,
                            output_path: str,
                            options: UndistortCameraOptions = UndistortCameraOptions()):
    """CMP-MVS workspace export (reference: CMPMVSUndistorter):
    %05d.jpg undistorted images + %05d_P.txt P matrices."""
    import numpy as np

    from colmap_tpu.sensor import bitmap as bitmap_mod

    os.makedirs(output_path, exist_ok=True)
    reg = [iid for iid in sorted(rec.images) if rec.images[iid].registered]
    ucams = {cid: undistort_camera(options, cam)
             for cid, cam in rec.cameras.items()}
    for k, iid in enumerate(reg):
        img = rec.images[iid]
        bmp = bitmap_mod.read_bitmap(os.path.join(image_dir, img.name))
        und, ucam = undistort_image(options, bmp.data,
                                    rec.cameras[img.camera_id],
                                    ucams[img.camera_id])
        bitmap_mod.write_bitmap(os.path.join(output_path, f"{k + 1:05d}.jpg"),
                                und)
        fx, fy, cx, cy = ucam.params[:4]
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        q = img.cam_from_world[:4] / np.linalg.norm(img.cam_from_world[:4])
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        P = K @ np.concatenate([R, img.cam_from_world[4:7][:, None]], axis=1)
        with open(os.path.join(output_path, f"{k + 1:05d}_P.txt"), "w") as fp:
            fp.write("CONTOUR\n")
            for row in P:
                fp.write(f"{row[0]} {row[1]} {row[2]} {row[3]}\n")
