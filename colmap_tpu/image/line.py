"""Line segment detection.

Reference: src/colmap/image/line.cc:34-69 — wrapper over the vendored LSD
detector (thirdparty/LSD), used by the Manhattan-world coordinate-frame
estimation. Host-side: OpenCV's detector when available, with a
Canny+HoughLinesP fallback (and a no-op fallback without cv2).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class LineSegment:
    start: np.ndarray  # (2,)
    end: np.ndarray  # (2,)

    @property
    def direction(self) -> np.ndarray:
        d = self.end - self.start
        n = np.linalg.norm(d)
        return d / n if n > 0 else d

    @property
    def length(self) -> float:
        return float(np.linalg.norm(self.end - self.start))


def detect_line_segments(image: np.ndarray, min_length: float = 20.0):
    """Detect 2D line segments in a grayscale image (uint8 or [0,1] f32).

    Returns a list of LineSegment (reference: DetectLineSegments).
    """
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    try:
        import cv2
    except Exception:  # pragma: no cover
        return []

    segments = []
    lsd = None
    try:
        lsd = cv2.createLineSegmentDetector()
    except Exception:
        lsd = None
    if lsd is not None:
        try:
            lines = lsd.detect(img)[0]
        except Exception:
            lines = None
        if lines is not None:
            for l in lines.reshape(-1, 4):
                seg = LineSegment(start=np.array(l[:2], float),
                                  end=np.array(l[2:], float))
                if seg.length >= min_length:
                    segments.append(seg)
            return segments

    edges = cv2.Canny(img, 50, 150)
    lines = cv2.HoughLinesP(edges, 1, np.pi / 180, threshold=50,
                            minLineLength=int(min_length), maxLineGap=4)
    if lines is not None:
        for l in lines.reshape(-1, 4):
            segments.append(LineSegment(start=np.array(l[:2], float),
                                        end=np.array(l[2:], float)))
    return segments
