"""Raster pyramid + zonal statistics over encoded tiles.

Two classic geospatial raster operators the reference's GeoTrellis stack gets from
its raster library (reference context: the ingest module's tile handling and the
raster<->vector overlay of the adiff renderer), re-expressed Ray-Data-first over
this engine's opaque encoded-tile blobs (functions/image.py codec):

- **Overview pyramid build** (gdaladdo-style): children shuffle ONCE, encoded
  (compressed-domain shuffle — pixels are only inflated post-shuffle inside the
  per-parent group task), each 2x2 child block becomes one half-resolution parent
  tile. The parent key is pure arithmetic on the child's grid coordinates, so the
  whole level is one ``groupby(parent).map_groups`` — no driver state, no global
  sort; at 10^12 tiles each level is a single bounded hash shuffle of compressed
  blobs and the level sizes shrink 4x geometrically.
- **Zonal statistics** (mean pixel value per zone): decode actors emit per-tile
  INTEGRAL channel sums (uint8 pixels sum exactly in int64), a tiny
  ``groupby(cell).sum`` merges them — the combiner shape: pixels never shuffle,
  only (cell, 5 int64) partial rows do.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import image as IMG

CHILD_NORM = 32  # children normalized to this square before mosaicking
PARENT_SIDE = 32  # parent tile side (mosaic 64x64 box-downsampled 2x)


def child_grid(doc_id: np.ndarray) -> dict[str, np.ndarray]:
    """Deterministic tile-grid coordinates for a derived image: 16x16 mosaic pages."""
    d = doc_id.astype(np.int64)
    tx = d % 16
    ty = (d // 16) % 16
    page = d // 256
    return {"page": page, "tx": tx, "ty": ty,
            "parent": page * 64 + (ty // 2) * 8 + (tx // 2)}


def box_down2(px: np.ndarray) -> np.ndarray:
    """Exact 2x box downsample of (2h, 2w, 3) uint8 -> (h, w, 3) uint8 (floor mean —
    integer arithmetic, so the pytest equivalence is bit-exact, no float rounding)."""
    a = px.astype(np.uint16)
    s = a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]
    return (s // 4).astype(np.uint8)


def build_parent(children: list[tuple[int, int, bytes]]) -> tuple[np.ndarray, int]:
    """children: (tx, ty, blob) with arbitrary sizes -> (PARENT_SIDE² parent pixels,
    n_children). Each child is bilinear-normalized to CHILD_NORM², placed at its
    quadrant of the 2x2 mosaic (missing quadrants stay zero), then box-downsampled."""
    mosaic = np.zeros((2 * CHILD_NORM, 2 * CHILD_NORM, 3), np.uint8)
    n = 0
    for tx, ty, blob in children:
        px, _fmt = IMG.decode(blob)
        if px.shape[:2] != (CHILD_NORM, CHILD_NORM):
            px = IMG.resize_bilinear(px, CHILD_NORM, CHILD_NORM)
        qy, qx = (ty % 2) * CHILD_NORM, (tx % 2) * CHILD_NORM
        mosaic[qy : qy + CHILD_NORM, qx : qx + CHILD_NORM] = px
        n += 1
    return box_down2(mosaic), n


def pyramid_group(g: pd.DataFrame) -> pd.DataFrame:
    """groupby(parent).map_groups kernel: one parent tile per 2x2 child block."""
    children = list(zip(g["tx"].tolist(), g["ty"].tolist(), g["bytes"].tolist()))
    px, n = build_parent(children)
    parent = int(g["parent"].iloc[0])
    return pd.DataFrame(
        {
            "page": [np.int64(g["page"].iloc[0])],
            "ptx": [np.int64((parent % 64) % 8)],
            "pty": [np.int64((parent % 64) // 8)],
            "n_children": [np.int64(n)],
            "blob": [IMG.encode(px, "qz")],
        }
    )


class ZonalSums:
    """Actor-pool decode stage for zonal statistics: per tile, exact int64 channel
    sums + pixel count, keyed by the tile's cell. Stateless codec, but an actor pool
    keeps the inflate buffers warm; downstream is a tiny groupby(cell).sum."""

    def __call__(self, t: pa.Table) -> pa.Table:
        cells = t["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_px = np.empty(len(cells), np.int64)
        sums = np.empty((len(cells), 3), np.int64)
        for i, blob in enumerate(t["bytes"]):
            px, _ = IMG.decode(blob.as_py())
            n_px[i] = px.shape[0] * px.shape[1]
            sums[i] = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        return pa.table(
            {
                "cell": pa.array(cells),
                "n_tiles": pa.array(np.ones(len(cells), np.int64)),
                "n_px": pa.array(n_px),
                "sum_r": pa.array(sums[:, 0]),
                "sum_g": pa.array(sums[:, 1]),
                "sum_b": pa.array(sums[:, 2]),
            }
        )


class PixelHistogram:
    """Actor-pool decode stage for corpus-wide pixel statistics: per tile, a
    16-bin histogram per RGB channel (int64 counts) — one 48-value partial row
    per tile; pixels never leave the actor. Downstream is a (channel, bin)
    groupby-sum of 48-row partials."""

    BINS = 16

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        hists = np.zeros((n, 3, self.BINS), np.int64)
        for i, blob in enumerate(t["bytes"]):
            px, _ = IMG.decode(blob.as_py())
            flat = px.reshape(-1, 3) >> 4  # 256 -> 16 bins
            for ch in range(3):
                hists[i, ch] = np.bincount(flat[:, ch], minlength=self.BINS)
        # fold the batch to one row per (channel, bin)
        batch = hists.sum(axis=0)  # (3, BINS)
        ch = np.repeat(np.arange(3, dtype=np.int64), self.BINS)
        bins = np.tile(np.arange(self.BINS, dtype=np.int64), 3)
        return pa.table(
            {"channel": pa.array(ch), "bin": pa.array(bins),
             "n_px": pa.array(batch.reshape(-1))}
        )


class TileAugment:
    """Actor-pool augmentation stage (the vision-training augment step):
    deterministic per-tile transforms keyed by a hash of the image id — bit 0
    horizontal flip, bit 1 vertical flip, bit 2 central crop to the middle
    half — then lossless re-encode. Augmented pixels are produced and consumed
    inside the actor; the output ships re-encoded blobs + integral checksums
    so correctness is verifiable without another decode hop."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        out_bytes, masks, ws, hs, sums = [], [], [], [], []
        for image_id, blob in zip(ids, t["bytes"]):
            px, _ = IMG.decode(blob.as_py())
            mask = zlib.crc32(image_id.encode()) & 7
            if mask & 1:
                px = px[:, ::-1]
            if mask & 2:
                px = px[::-1, :]
            if mask & 4:
                h, w = px.shape[:2]
                px = px[h // 4 : h // 4 + h // 2, w // 4 : w // 4 + w // 2]
            px = np.ascontiguousarray(px)
            out_bytes.append(IMG.encode(px, "rawz"))
            masks.append(mask)
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            sums.append(int(px.sum(dtype=np.int64)))
        return pa.table(
            {"image_id": t["image_id"],
             "bytes": pa.array(out_bytes, pa.binary()),
             "aug_mask": pa.array(np.array(masks, np.int64)),
             "w": pa.array(np.array(ws, np.int64)),
             "h": pa.array(np.array(hs, np.int64)),
             "pixel_sum": pa.array(np.array(sums, np.int64))}
        )
