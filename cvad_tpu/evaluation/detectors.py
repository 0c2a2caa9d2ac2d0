"""Person-detection backends for bbox localization.

Rebuilds the backend ladder of ``avenue_training_script_bbox.py:30-48,157-326``:
yolov5 -> OpenCV-DNN -> motion/contour fallback.  In this framework every
backend is a plain callable ``frame -> [Detection]`` behind one registry;
the motion/contour detector (the only always-available backend) has both a
cv2 implementation and a pure-numpy one, so localization works with zero
optional dependencies.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class Detection:
    bbox: List[int]  # [x1, y1, x2, y2]
    confidence: float

    @property
    def center(self):
        return ((self.bbox[0] + self.bbox[2]) // 2,
                (self.bbox[1] + self.bbox[3]) // 2)


def _cv2():
    try:
        import cv2

        return cv2
    except Exception:
        return None


def detect_persons_motion(frame: np.ndarray, max_out: int = 3
                          ) -> List[Detection]:
    """Contour/edge fallback detector (reference ``:281-312``): Canny edges
    -> external contours -> person-shaped boxes (area > 100, w > 10, h > 20,
    aspect 1.2-4.0), capped at 3."""
    cv2 = _cv2()
    if cv2 is not None:
        gray = frame if frame.ndim == 2 else cv2.cvtColor(frame, cv2.COLOR_RGB2GRAY)
        blur = cv2.GaussianBlur(gray, (21, 21), 0)
        edges = cv2.Canny(blur, 50, 150)
        contours, _ = cv2.findContours(edges, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        persons = []
        for contour in contours:
            if cv2.contourArea(contour) > 100:
                x, y, w, h = cv2.boundingRect(contour)
                ar = h / w if w > 0 else 0
                if w > 10 and h > 20 and 1.2 < ar < 4.0:
                    persons.append(Detection([x, y, x + w, y + h], 0.5))
        return persons[:max_out]
    return _detect_motion_numpy(frame, max_out)


def _detect_motion_numpy(frame: np.ndarray, max_out: int) -> List[Detection]:
    """No-cv2 approximation: gradient-magnitude blobs via scipy
    connected-component labeling.  Returns no detections when scipy is also
    absent (the ladder degrades to zero boxes rather than crashing)."""
    try:
        from scipy import ndimage
    except ImportError:
        return []

    gray = frame if frame.ndim == 2 else frame.mean(axis=-1)
    gray = gray.astype(np.float32)
    gy, gx = np.gradient(gray)
    mag = np.hypot(gx, gy)
    mask = mag > max(mag.mean() + 2 * mag.std(), 1e-3)
    labels, n = ndimage.label(mask)
    persons = []
    for sl in ndimage.find_objects(labels):
        y, x = sl
        w, h = x.stop - x.start, y.stop - y.start
        if w > 10 and h > 20 and 1.2 < (h / max(w, 1)) < 4.0 and w * h > 100:
            persons.append(Detection([x.start, y.start, x.stop, y.stop], 0.5))
    persons.sort(key=lambda d: (d.bbox[2] - d.bbox[0]) * (d.bbox[3] - d.bbox[1]),
                 reverse=True)
    return persons[:max_out]


def detect_persons_opencv_dnn(frame: np.ndarray, net=None, conf: float = 0.2
                              ) -> List[Detection]:
    """OpenCV-DNN YOLO backend (reference ``:234-279``).  Requires a
    preloaded `net` (weights are not downloadable in air-gapped setups —
    the reference tried to download them at init, ``:191-208``)."""
    cv2 = _cv2()
    if cv2 is None or net is None:
        return []
    h, w = frame.shape[:2]
    blob = cv2.dnn.blobFromImage(frame, 1 / 255.0, (416, 416), swapRB=True,
                                 crop=False)
    net.setInput(blob)
    outputs = net.forward(net.getUnconnectedOutLayersNames())
    boxes, confs = [], []
    for output in outputs:
        for det in output:
            scores = det[5:]
            cid = int(np.argmax(scores))
            c = float(scores[cid])
            if cid == 0 and c > conf:
                cx, cy = int(det[0] * w), int(det[1] * h)
                bw, bh = int(det[2] * w), int(det[3] * h)
                boxes.append([cx - bw // 2, cy - bh // 2, bw, bh])
                confs.append(c)
    idx = cv2.dnn.NMSBoxes(boxes, confs, conf, 0.2)
    out = []
    if len(idx) > 0:
        for i in np.asarray(idx).flatten():
            x, y, bw, bh = boxes[i]
            out.append(Detection([x, y, x + bw, y + bh], confs[i]))
    return out


_REGISTRY: Dict[str, Callable] = {}


def register_detector(name: str, fn: Callable) -> None:
    _REGISTRY[name] = fn


register_detector("motion", detect_persons_motion)


def get_detector(backend: str = "auto") -> Callable:
    """Resolve a detector callable.  'auto' follows the reference's ladder
    but lands on the always-available motion detector in this environment
    (yolov5 hub weights are not downloadable offline)."""
    if backend in _REGISTRY:
        return _REGISTRY[backend]
    if backend == "auto":
        return setup_detector("auto")[0]
    raise KeyError(f"unknown detector backend {backend!r}; "
                   f"registered: {sorted(_REGISTRY)}")


def setup_detector(backend: str = "auto", weights_dir: Optional[str] = None):
    """Backend-selection ladder (reference ``avenue_training_script_bbox.py
    :30-48,157-208``): yolov5 -> OpenCV-DNN (local weights only; the
    reference downloaded configs at init, which an air-gapped deployment
    cannot) -> motion/contour fallback.  Returns (callable, backend_name)."""
    if backend in ("auto", "yolov5"):
        try:  # torch.hub yolov5 — requires network/cached hub; usually absent
            import torch

            model = torch.hub.load("ultralytics/yolov5", "yolov5s",
                                   verbose=False)

            def yolo(frame, _m=model):
                res = _m(frame)
                persons = []
                for *xyxy, conf, cls in res.xyxy[0].tolist():
                    if int(cls) == 0 and conf > 0.2:
                        persons.append(Detection([int(v) for v in xyxy], conf))
                return persons

            return yolo, "yolov5"
        except Exception:
            if backend == "yolov5":
                raise RuntimeError("yolov5 backend unavailable (no hub access)")
    if backend in ("auto", "opencv"):
        cv2 = _cv2()
        if cv2 is not None and weights_dir:
            import os

            cfg = os.path.join(weights_dir, "yolov4-tiny.cfg")
            wts = os.path.join(weights_dir, "yolov4-tiny.weights")
            if os.path.exists(cfg) and os.path.exists(wts):
                net = cv2.dnn.readNetFromDarknet(cfg, wts)
                return (lambda frame: detect_persons_opencv_dnn(frame, net),
                        "opencv")
        if backend == "opencv":
            raise RuntimeError("opencv-dnn backend needs local yolov4 weights")
    return detect_persons_motion, "motion"
