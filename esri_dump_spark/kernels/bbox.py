"""BBox quadsplit (G9) — the reference's adaptive partitioner seed.

Parity target: /root/reference/lib/geometry.ts:265-275 — exact output
order SW, SE, NW, NE with half-width/half-height splits. Reused in the
engine as the spatial skew-refinement splitter (split a hot cell's
envelope until per-partition row counts fit).
"""

from __future__ import annotations

from typing import NamedTuple

__all__ = ["BBox", "split_bbox", "quadtree_partition"]


class BBox(NamedTuple):
    xmin: float
    ymin: float
    xmax: float
    ymax: float


def split_bbox(bbox: BBox) -> list[BBox]:
    """Split an envelope into 4 equal quadrants: SW, SE, NW, NE."""
    bbox = BBox(*bbox)
    half_w = (bbox.xmax - bbox.xmin) / 2.0
    half_h = (bbox.ymax - bbox.ymin) / 2.0
    return [
        BBox(bbox.xmin, bbox.ymin, bbox.xmin + half_w, bbox.ymin + half_h),
        BBox(bbox.xmin + half_w, bbox.ymin, bbox.xmax, bbox.ymin + half_h),
        BBox(bbox.xmin, bbox.ymin + half_h, bbox.xmin + half_w, bbox.ymax),
        BBox(bbox.xmin + half_w, bbox.ymin + half_h, bbox.xmax, bbox.ymax),
    ]


def quadtree_partition(bbox: BBox, count_fn, max_records: int,
                       max_depth: int = 24) -> list[BBox]:
    """Replay the reference's LIFO envelope refinement loop.

    ``count_fn(bbox) -> int`` plays the server's role (how many rows
    intersect this envelope). Envelopes whose count reaches
    ``max_records`` are split into 4 and re-queued; others are emitted.
    This is driver-side planning logic — the resulting leaf envelopes
    become the partition manifest for the distributed scan.
    """
    out: list[BBox] = []
    stack: list[tuple[BBox, int]] = [(BBox(*bbox), 0)]
    while stack:
        env, depth = stack.pop()
        n = count_fn(env)
        if n >= max_records and depth < max_depth:
            for sub in split_bbox(env):
                stack.append((sub, depth + 1))
        elif n > 0:
            out.append(env)
    return out
