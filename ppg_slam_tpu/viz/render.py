"""Minimal deterministic software 3-D renderer for the offline viewer.

The reference viewer draws the map with OpenGL/Pangolin
(/root/reference/system/src/Viewer.cpp:66-231). This headless equivalent
projects world geometry through a look-at view + pinhole projection and
rasterizes with PIL — same scene content (points / lines / camera frusta),
no GL dependency, byte-deterministic output for tests.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw

Color = Tuple[int, int, int]

BG = (255, 255, 255)  # reference: glClearColor(1,1,1,1), Viewer.cpp:190


def look_at(eye: np.ndarray, target: np.ndarray, up: np.ndarray
            ) -> Tuple[np.ndarray, np.ndarray]:
    """(R, t) mapping world -> view coords, view +z pointing at the target
    (same handedness as pangolin::ModelViewLookAt consumed by a pinhole
    projection with +z forward)."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    n = np.linalg.norm(fwd)
    if n < 1e-12:
        fwd = np.array([0.0, 0.0, 1.0])
    else:
        fwd = fwd / n
    upn = np.asarray(up, np.float64)
    right = np.cross(fwd, upn)
    rn = np.linalg.norm(right)
    if rn < 1e-9:  # up parallel to forward: pick any orthogonal
        upn = np.array([0.0, -1.0, 0.0]) if abs(fwd[1]) < 0.9 \
            else np.array([1.0, 0.0, 0.0])
        right = np.cross(fwd, upn)
        rn = np.linalg.norm(right)
    right = right / rn
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd])  # rows: view axes in world coords
    t = -R @ eye
    return R.astype(np.float32), t.astype(np.float32)


def _blend(c: Color, alpha: float) -> Color:
    """Alpha-blend a color onto the white background (emulates
    glBlendFunc(SRC_ALPHA, ONE_MINUS_SRC_ALPHA) on the cleared canvas)."""
    a = float(min(max(alpha, 0.0), 1.0))
    return tuple(int(round(BG[i] * (1.0 - a) + c[i] * a)) for i in range(3))


class Canvas3D:
    """Rasterizes 3-D primitives through a fixed view into a PIL image."""

    def __init__(self, width: int = 1024, height: int = 768,
                 focal: float = 500.0, znear: float = 0.1):
        self.w, self.h = int(width), int(height)
        self.f = float(focal)
        self.cx, self.cy = self.w / 2.0, self.h / 2.0
        self.znear = float(znear)
        self.img = Image.new("RGB", (self.w, self.h), BG)
        self.draw = ImageDraw.Draw(self.img)
        self.R = np.eye(3, dtype=np.float32)
        self.t = np.zeros(3, np.float32)

    def set_view(self, eye, target, up) -> None:
        self.R, self.t = look_at(eye, target, up)

    # ------------------------------------------------------------------
    def project(self, pts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(N,3) world -> (N,2) pixel coords + (N,) visibility mask."""
        pts = np.asarray(pts, np.float32).reshape(-1, 3)
        pv = pts @ self.R.T + self.t
        z = pv[:, 2]
        ok = z > self.znear
        zs = np.where(ok, z, 1.0)
        u = self.f * pv[:, 0] / zs + self.cx
        v = self.f * pv[:, 1] / zs + self.cy
        uv = np.stack([u, v], axis=1)
        ok &= (u > -4 * self.w) & (u < 5 * self.w) \
            & (v > -4 * self.h) & (v < 5 * self.h)
        return uv, ok

    # ------------------------------------------------------------------
    def points(self, pts: np.ndarray, color: Color, size: int = 2,
               alpha: Optional[np.ndarray] = None) -> None:
        uv, ok = self.project(pts)
        r = max(size // 2, 1)
        for i in np.nonzero(ok)[0]:
            c = color if alpha is None else _blend(color, float(alpha[i]))
            x, y = uv[i]
            self.draw.ellipse([x - r, y - r, x + r, y + r], fill=c)

    def lines(self, a: np.ndarray, b: np.ndarray, color: Color,
              width: int = 1, alpha: Optional[np.ndarray] = None) -> None:
        """Segments a[i] -> b[i], both (N,3) world coords."""
        ua, oka = self.project(a)
        ub, okb = self.project(b)
        ok = oka & okb
        for i in np.nonzero(ok)[0]:
            c = color if alpha is None else _blend(color, float(alpha[i]))
            self.draw.line([tuple(ua[i]), tuple(ub[i])], fill=c, width=width)

    def axes(self, Rwc: np.ndarray, Ow: np.ndarray, scale: float = 0.1,
             width: int = 1) -> None:
        """RGB coordinate axes of a pose (reference keyframe glyph,
        Viewer.cpp:651-676)."""
        Ow = np.asarray(Ow, np.float32)
        for k, col in enumerate([(255, 0, 0), (0, 255, 0), (0, 0, 255)]):
            tip = Ow + scale * np.asarray(Rwc, np.float32)[:, k]
            self.lines(Ow[None], tip[None], col, width=width)

    def frustum(self, Rwc: np.ndarray, Ow: np.ndarray, color: Color,
                w: float = 0.08, width: int = 2) -> None:
        """Camera wireframe pyramid (reference DrawCurrentCamera,
        Viewer.cpp:749-797; w=0.4 scaled down for map scale)."""
        h, z = w * 0.75, w * 0.6
        corners_c = np.array([[w, h, z], [w, -h, z], [-w, -h, z], [-w, h, z]],
                             np.float32)
        Rwc = np.asarray(Rwc, np.float32)
        Ow = np.asarray(Ow, np.float32)
        corners = corners_c @ Rwc.T + Ow
        apex = np.repeat(Ow[None], 4, axis=0)
        self.lines(apex, corners, color, width=width)
        self.lines(corners, np.roll(corners, 1, axis=0), color, width=width)

    # ------------------------------------------------------------------
    def array(self) -> np.ndarray:
        return np.asarray(self.img, np.uint8)

    def save(self, path: str) -> None:
        self.img.save(path)


def draw_text_bar(image: np.ndarray, text: str, bar_h: int = 20
                  ) -> np.ndarray:
    """Append a black text bar below the image (reference DrawTextInfo,
    Viewer.cpp:370-408)."""
    h, w = image.shape[:2]
    out = np.zeros((h + bar_h, w, 3), np.uint8)
    out[:h] = image
    im = Image.fromarray(out)
    ImageDraw.Draw(im).text((5, h + 4), text, fill=(255, 255, 255))
    return np.asarray(im, np.uint8)
