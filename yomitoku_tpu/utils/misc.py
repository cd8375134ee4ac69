"""Geometry and small host utilities.

Reference parity: yomitoku/utils/misc.py.  These scalar predicates are the
backbone of the semantic table parsing layer; semantics (thresholds,
tie-breaking, integer truncation) are preserved exactly.  The batched numpy
variants for the O(n^2) aggregation paths (``overlap_ratio_matrix``,
``containment_matrix``) live in this module too.
"""

import math
import os
from collections import deque

import cv2
import networkx as nx
import numpy as np


def load_charset(charset_path):
    with open(charset_path, "r", encoding="utf-8") as f:
        return f.read()


def filter_by_flag(elements, flags):
    assert len(elements) == len(flags)
    return [e for e, keep in zip(elements, flags) if keep]


def save_image(img, path):
    success, buffer = cv2.imencode(".jpg", img)
    basedir = os.path.dirname(path)
    if basedir:
        os.makedirs(basedir, exist_ok=True)
    if not success:
        raise ValueError("Failed to encode image")
    with open(path, "wb") as f:
        f.write(buffer.tobytes())


def calc_intersection(rect_a, rect_b):
    """Integer intersection rectangle of two xyxy rects, or None."""
    ax1, ay1, ax2, ay2 = map(int, rect_a)
    bx1, by1, bx2, by2 = map(int, rect_b)
    ix1, iy1 = max(ax1, bx1), max(ay1, by1)
    ix2, iy2 = min(ax2, bx2), min(ay2, by2)
    if max(0, ix2 - ix1) == 0 or max(0, iy2 - iy1) == 0:
        return None
    return [ix1, iy1, ix2, iy2]


def calc_overlap_ratio(rect_a, rect_b):
    """Fraction of rect_b's area covered by the intersection with rect_a."""
    intersection = calc_intersection(rect_a, rect_b)
    if intersection is None:
        return 0, None
    ix1, iy1, ix2, iy2 = intersection
    bx1, by1, bx2, by2 = rect_b
    b_area = (bx2 - bx1) * (by2 - by1)
    overlap_area = (ix2 - ix1) * (iy2 - iy1)
    return overlap_area / b_area, intersection


def is_contained(rect_a, rect_b, threshold=0.8):
    """True when rect_b is (mostly) inside rect_a — overlap ratio > threshold."""
    ratio, _ = calc_overlap_ratio(rect_a, rect_b)
    return ratio > threshold


def overlap_ratio_matrix(boxes_a, boxes_b):
    """Vectorized pairwise calc_overlap_ratio: (n, 4) x (m, 4) xyxy ->
    (n, m) fraction of b's area covered by a∩b.  Same int-truncation
    semantics as calc_intersection; degenerate intersections/boxes -> 0.

    The per-pair Python helpers cost ~4 us each — detector outputs can
    reach thousands of boxes, and O(n^2) scalar loops over them took
    ~19 s/page in the cell detector before this existed."""
    a = np.trunc(np.asarray(boxes_a, np.float64)).astype(np.int64)
    b = np.trunc(np.asarray(boxes_b, np.float64)).astype(np.int64)
    if a.size == 0 or b.size == 0:
        return np.zeros((len(a), len(b)), np.float64)
    ix1 = np.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = np.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = np.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = np.minimum(a[:, None, 3], b[None, :, 3])
    iw = np.maximum(0, ix2 - ix1)
    ih = np.maximum(0, iy2 - iy1)
    inter = iw * ih
    # NOTE: ratio uses rect_b's ORIGINAL (un-truncated) area, matching
    # calc_overlap_ratio, which truncates only the intersection rect.
    bf = np.asarray(boxes_b, np.float64)
    b_area = (bf[:, 2] - bf[:, 0]) * (bf[:, 3] - bf[:, 1])
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(
            (inter > 0) & (b_area[None, :] > 0),
            inter / b_area[None, :],
            0.0,
        )
    return ratio


def containment_matrix(boxes_a, boxes_b, threshold=0.8):
    """(n, m) bool: is_contained(a_i, b_j) — b_j mostly inside a_i."""
    return overlap_ratio_matrix(boxes_a, boxes_b) > threshold


def calc_iou(rect_a, rect_b):
    intersection = calc_intersection(rect_a, rect_b)
    if intersection is None:
        return 0
    ix1, iy1, ix2, iy2 = intersection
    ax1, ay1, ax2, ay2 = rect_a
    bx1, by1, bx2, by2 = rect_b
    inter = (ix2 - ix1) * (iy2 - iy1)
    a_area = (ax2 - ax1) * (ay2 - ay1)
    b_area = (bx2 - bx1) * (by2 - by1)
    return inter / (a_area + b_area - inter)


def is_intersected_horizontal(rect_a, rect_b, threshold=0.5):
    """Vertical-interval overlap >= threshold * min height."""
    _, ay1, _, ay2 = map(int, rect_a)
    _, by1, _, by2 = map(int, rect_b)
    overlap = max(0, min(ay2, by2) - max(ay1, by1))
    min_height = min(ay2 - ay1, by2 - by1)
    return (overlap / min_height) >= threshold


def is_intersected_vertical(rect_a, rect_b):
    """Any horizontal-interval overlap at all."""
    ax1, _, ax2, _ = map(int, rect_a)
    bx1, _, bx2, _ = map(int, rect_b)
    return max(0, min(ax2, bx2) - max(ax1, bx1)) != 0


def quad_to_xyxy(quad):
    xs = [p[0] for p in quad]
    ys = [p[1] for p in quad]
    return min(xs), min(ys), max(xs), max(ys)


def convert_table_array(table):
    """TableStructure -> 2-D array of cell contents (1-indexed rows/cols)."""
    arr = [["" for _ in range(table.n_col)] for _ in range(table.n_row)]
    for cell in table.cells:
        r0, c0 = cell.row - 1, cell.col - 1
        for i in range(r0, r0 + cell.row_span):
            for j in range(c0, c0 + cell.col_span):
                arr[i][j] = cell.contents
    return arr


def convert_table_array_to_dict(table_array, header_row=1):
    n_rows = len(table_array)
    n_cols = len(table_array[0])
    header_cols = []
    for i in range(n_cols):
        header = [table_array[j][i] for j in range(header_row)]
        header_cols.append("_".join(header) if header else f"col_{i}")
    out = []
    for i in range(header_row, n_rows):
        out.append({header_cols[j]: table_array[i][j] for j in range(n_cols)})
    return out


def clamp(t, lo, hi):
    return max(lo, min(hi, t))


def point_distance(p, q):
    return math.hypot(p[0] - q[0], p[1] - q[1])


def point_to_segment_distance(px, py, ax, ay, bx, by):
    """Shortest distance from point (px,py) to segment (ax,ay)-(bx,by)."""
    abx, aby = bx - ax, by - ay
    denom = abx * abx + aby * aby
    if denom == 0:
        return math.hypot(px - ax, py - ay)
    t = clamp(((px - ax) * abx + (py - ay) * aby) / denom, 0.0, 1.0)
    return math.hypot(px - (ax + t * abx), py - (ay + t * aby))


def right_edge_to_left_edge_dist(A, B):
    """Corner-to-edge distances between A's right edge and B's left edge.

    Returns the four max-paired distances used by the adjacency rules
    (reference utils/misc.py:224).
    """
    ax1, ay1, ax2, ay2 = A
    bx1, by1, bx2, by2 = B
    d1 = point_to_segment_distance(ax2, ay1, bx1, by1, bx1, by2)  # A top-right -> B left
    d2 = point_to_segment_distance(ax2, ay2, bx1, by1, bx1, by2)  # A bot-right -> B left
    d3 = point_to_segment_distance(bx1, by1, ax2, ay1, ax2, ay2)  # B top-left -> A right
    d4 = point_to_segment_distance(bx1, by2, ax2, ay1, ax2, ay2)  # B bot-left -> A right
    return max(d1, d4), max(d2, d3), max(d3, d4), max(d1, d2)


def top_edge_to_bottom_edge_dist(A, B):
    """Corner-to-edge distances between A's bottom edge and B's top edge."""
    ax1, ay1, ax2, ay2 = A
    bx1, by1, bx2, by2 = B
    d1 = point_to_segment_distance(ax1, ay2, bx1, by1, bx2, by1)  # A bot-left -> B top
    d2 = point_to_segment_distance(ax2, ay2, bx1, by1, bx2, by1)  # A bot-right -> B top
    d3 = point_to_segment_distance(bx1, by1, ax1, ay2, ax2, ay2)  # B top-left -> A bot
    d4 = point_to_segment_distance(bx2, by1, ax1, ay2, ax2, ay2)  # B top-right -> A bot
    return max(d1, d4), max(d2, d3), max(d3, d4), max(d1, d2)


def overlap_interval(i1, i2, j1, j2):
    return max(0.0, min(i2, j2) - max(i1, j1))


def gap_interval(interval_a, interval_b):
    """Shortest gap between two 1-D intervals (0 when they overlap)."""
    a1, a2 = interval_a
    b1, b2 = interval_b
    if b2 < a1:
        return a1 - b2
    if a2 < b1:
        return b1 - a2
    return 0.0


def is_right_adjacent(
    box_a,
    box_b,
    dist_threshold=15,
    overlap_ratio_th=0.1,
    ignore_dist_threshold=10,
    rule="soft",
):
    """Is box_b the right-neighbor of box_a? (reference utils/misc.py:299)

    Rules: "soft" allows 1:1/1:N/N:1/N:M joins, "hard" only 1:1, "nest"
    only the child-side corner condition.
    """
    ax1, ay1, ax2, ay2 = box_a
    bx1, by1, bx2, by2 = box_b

    if bx1 < ax1:  # B must start right of A's left edge
        return False
    if overlap_interval(ay1, ay2, by1, by2) < overlap_ratio_th * min(
        ay2 - ay1, by2 - by1
    ):
        return False
    # Diagonal-touch exclusions.
    if point_distance((ax2, ay2), (bx1, by1)) < ignore_dist_threshold:
        return False
    if point_distance((ax2, ay1), (bx1, by2)) < ignore_dist_threshold:
        return False

    d1, d2, d3, d4 = right_edge_to_left_edge_dist(box_a, box_b)
    if rule == "hard":
        return (
            point_distance((ax2, ay1), (bx1, by1)) < dist_threshold
            and point_distance((ax2, ay2), (bx1, by2)) < dist_threshold
        )
    if rule == "soft":
        return min(d1, d2, d3, d4) < dist_threshold
    if rule == "nest":
        return d3 < dist_threshold
    return False


def is_bottom_adjacent(
    box_a,
    box_b,
    dist_threshold=15,
    overlap_ratio_th=0.1,
    ignore_dist_threshold=10,
    rule="soft",
):
    """Is box_b the bottom-neighbor of box_a? (reference utils/misc.py:356)"""
    ax1, ay1, ax2, ay2 = box_a
    bx1, by1, bx2, by2 = box_b

    if by1 < ay1:
        return False
    if overlap_interval(ax1, ax2, bx1, bx2) < overlap_ratio_th * min(
        ax2 - ax1, bx2 - bx1
    ):
        return False
    if point_distance((ax2, ay2), (bx1, by1)) < ignore_dist_threshold:
        return False
    if point_distance((ax1, ay2), (bx2, by1)) < ignore_dist_threshold:
        return False

    d1, d2, d3, d4 = top_edge_to_bottom_edge_dist(box_a, box_b)
    if rule == "hard":
        return (
            point_distance((ax1, ay2), (bx1, by1)) < dist_threshold
            and point_distance((ax2, ay2), (bx2, by1)) < dist_threshold
        )
    if rule == "soft":
        return min(d1, d2, d3, d4) < dist_threshold
    if rule == "nest":
        return d3 < dist_threshold
    if rule == "child":
        hard = (
            point_distance((ax1, ay2), (bx1, by1)) < dist_threshold
            and point_distance((ax2, ay2), (bx2, by1)) < dist_threshold
        )
        return (not hard) and d3 < dist_threshold
    return False


def get_line_with_head(dag: nx.DiGraph, head, dir_value: str):
    """BFS from ``head`` following edges tagged dir == dir_value."""
    line_nodes = []
    queue = deque([head])
    while queue:
        u = queue.popleft()
        if u not in dag.nodes:
            continue
        line_nodes.append(u)
        for v in dag.successors(u):
            if dag[u][v].get("dir") == dir_value:
                queue.append(v)
    return line_nodes
