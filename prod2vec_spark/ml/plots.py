"""M7 tuning-analysis plots (reference
/root/reference/pipeline/tuning_analysis/plot_helpers.py:12-114:
seaborn regplot + kdeplot rendered to PNG and uploaded to S3).

Engine: the tuning-results table is tiny (one row per trial), so
plotting is a driver-edge concern — ``toPandas()`` the table, render,
write PNG artifacts.  matplotlib is used when importable; otherwise a
dependency-free rasterizer (stdlib zlib/struct) draws the same
scatter + least-squares-fit chart, so the artifact contract (one PNG
per hyperparameter) holds even in minimal containers.  Nothing here
touches the data plane.
"""

from __future__ import annotations

import os
import struct
import zlib

from pyspark.sql import DataFrame

_BG = (255, 255, 255)
_AXIS = (70, 70, 70)
_POINT = (31, 119, 180)
_FIT = (214, 39, 40)
_MARGIN = 36


def _write_png(path: str, pixels: bytearray, w: int, h: int) -> None:
    """Minimal valid 8-bit RGB PNG (no filters beyond None)."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    raw = b"".join(
        b"\x00" + bytes(pixels[y * w * 3 : (y + 1) * w * 3]) for y in range(h)
    )
    with open(path, "wb") as f:
        f.write(
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )


def _put(pixels: bytearray, w: int, h: int, x: int, y: int, rgb) -> None:
    if 0 <= x < w and 0 <= y < h:
        i = (y * w + x) * 3
        pixels[i : i + 3] = bytes(rgb)


def _scatter_png(path: str, xs: list[float], ys: list[float], w: int = 360, h: int = 270) -> None:
    """Scatter + least-squares fit line — the regplot shape of
    plot_helpers.py:12-63, rasterized without dependencies."""
    pixels = bytearray(bytes(_BG) * (w * h))
    # axes
    for x in range(_MARGIN, w - 8):
        _put(pixels, w, h, x, h - _MARGIN, _AXIS)
    for y in range(8, h - _MARGIN + 1):
        _put(pixels, w, h, _MARGIN, y, _AXIS)

    if xs:
        x0, x1 = min(xs), max(xs)
        y0, y1 = min(ys), max(ys)
        xr = (x1 - x0) or 1.0
        yr = (y1 - y0) or 1.0

        def px(v: float) -> int:
            return _MARGIN + int((v - x0) / xr * (w - _MARGIN - 16))

        def py(v: float) -> int:
            return (h - _MARGIN) - int((v - y0) / yr * (h - _MARGIN - 16))

        # least-squares fit (the regplot line)
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        sxx = sum((x - mx) ** 2 for x in xs)
        if sxx > 0:
            slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sxx
            for xpix in range(_MARGIN, w - 16):
                xv = x0 + (xpix - _MARGIN) / (w - _MARGIN - 16) * xr
                _put(pixels, w, h, xpix, py(my + slope * (xv - mx)), _FIT)
        for xv, yv in zip(xs, ys):
            cx, cy = px(xv), py(yv)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    _put(pixels, w, h, cx + dx, cy + dy, _POINT)
    _write_png(path, pixels, w, h)


def save_tuning_plots(results: DataFrame, out_dir: str) -> list[str]:
    """One objective-vs-hyperparameter PNG per tuned parameter
    (plot_helpers.py:12-63 `plot_tuning_correlations`).  Returns the
    written paths."""
    os.makedirs(out_dir, exist_ok=True)
    pdf = results.select(
        "embedding_dim", "learning_rate", "FinalObjectiveValue"
    ).toPandas()
    ys = [float(v) for v in pdf["FinalObjectiveValue"]]
    paths = []
    for xcol in ["embedding_dim", "learning_rate"]:
        path = os.path.join(out_dir, f"objective_vs_{xcol}.png")
        xs = [float(v) for v in pdf[xcol]]
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(5, 3.75))
            ax.scatter(xs, ys)
            if len(xs) > 1:
                n = len(xs)
                mx, my = sum(xs) / n, sum(ys) / n
                sxx = sum((x - mx) ** 2 for x in xs)
                if sxx > 0:
                    slope = sum(
                        (x - mx) * (y - my) for x, y in zip(xs, ys)
                    ) / sxx
                    ax.plot([min(xs), max(xs)], [my + slope * (min(xs) - mx), my + slope * (max(xs) - mx)])
            ax.set_xlabel(xcol)
            ax.set_ylabel("FinalObjectiveValue")
            fig.savefig(path)
            plt.close(fig)
        except ImportError:
            _scatter_png(path, xs, ys)
        paths.append(path)
    return paths
