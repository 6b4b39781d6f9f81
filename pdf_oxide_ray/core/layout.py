"""Layout analysis (L1-L8): clustering, XY-Cut, reading order, tables,
adaptive parameters.

Re-implements the computation of the reference's layout stack:

* L1 chars->words "DBSCAN" BFS clustering
  (``/root/reference/src/layout/clustering.rs:233-345``)
* L2 words->lines clustering (``clustering.rs:353-416``)
* L3 XY-Cut recursive page segmentation with Gaussian-smoothed projection
  profiles (``/root/reference/src/layout/column_detector.rs:79-520``,
  Meunier ICDAR'05 sigma=2.0, valley < 0.35*avg)
* L4 tree reading order (``/root/reference/src/layout/reading_order.rs:33-53``)
* L5 graph reading order: pairwise ``precedes`` -> Kahn topological sort
  (``reading_order.rs:107-199``)
* L7 table detection from vertical/horizontal alignment grids
  (``/root/reference/src/layout/table_detector.rs:61-200``)
* L8 adaptive params from per-page statistics
  (``/root/reference/src/layout/document_analyzer.rs:118-283,361-408``)

All of these are *within-payload* operations: in the Ray pipeline they run
inside the extract/convert UDF on one row's spans (a page's blocks fit in
one Arrow cell) — never as cluster-wide shuffles.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# geometry / block model
# ---------------------------------------------------------------------------


@dataclass
class Block:
    """Lightweight TextBlock analogue (text_block.rs:170-274): bbox +
    text + style + char count (chars drive projection density)."""

    x: float
    y: float
    width: float
    height: float
    text: str = ""
    font_size: float = 12.0
    bold: bool = False

    @property
    def n_chars(self) -> int:
        return max(len(self.text), 1)

    @property
    def left(self) -> float:
        return self.x

    @property
    def right(self) -> float:
        return self.x + self.width

    @property
    def top(self) -> float:
        return self.y

    @property
    def bottom(self) -> float:
        return self.y + self.height

    @property
    def center(self) -> tuple[float, float]:
        return (self.x + self.width / 2.0, self.y + self.height / 2.0)

    def union_bbox(self, other: "Block") -> tuple[float, float, float, float]:
        x0 = min(self.left, other.left)
        y0 = min(self.top, other.top)
        x1 = max(self.right, other.right)
        y1 = max(self.bottom, other.bottom)
        return (x0, y0, x1 - x0, y1 - y0)


HORIZONTAL = "horizontal"
VERTICAL = "vertical"


@dataclass
class LayoutTree:
    """Leaf (blocks set) or Node (direction + children) —
    column_detector.rs:12-34."""

    blocks: list[int] | None = None
    direction: str | None = None
    children: list["LayoutTree"] = field(default_factory=list)

    @property
    def is_leaf(self) -> bool:
        return self.blocks is not None


# ---------------------------------------------------------------------------
# L3: XY-Cut
# ---------------------------------------------------------------------------


def gaussian_smooth(profile: list[float], sigma: float) -> list[float]:
    """1D Gaussian filter, clamped boundary (column_detector.rs:459-520)."""
    if len(profile) <= 2 or sigma <= 0.0:
        return profile
    radius = int(math.ceil(3.0 * sigma))
    size = 2 * radius + 1
    kernel = [math.exp(-((i - radius) ** 2) / (2.0 * sigma * sigma))
              for i in range(size)]
    ksum = sum(kernel)
    kernel = [k / ksum for k in kernel]
    n = len(profile)
    out = [0.0] * n
    for i in range(n):
        acc = 0.0
        for j in range(size):
            idx = i + j - radius
            idx = 0 if idx < 0 else (n - 1 if idx >= n else idx)
            acc += profile[idx] * kernel[j]
        out[i] = acc
    return out


def _projection(region: tuple[float, float, float, float], blocks: list[Block],
                indices: list[int], sigma: float, axis: str) -> list[float]:
    """Char-density projection onto an axis, bin = 2 units
    (column_detector.rs:200-295)."""
    rx, ry, rw, rh = region
    extent = rh if axis == HORIZONTAL else rw
    origin = ry if axis == HORIZONTAL else rx
    if extent <= 0.0:
        return [0.0]
    bins = max(int(math.ceil(extent / 2.0)), 1)
    profile = [0.0] * bins
    for idx in indices:
        b = blocks[idx]
        if axis == HORIZONTAL:
            start = max((b.top - origin) / extent * bins, 0.0)
            end = max((b.bottom - origin) / extent * bins, 0.0)
        else:
            start = max((b.left - origin) / extent * bins, 0.0)
            end = max((b.right - origin) / extent * bins, 0.0)
        s, e2 = int(start), int(end)
        density = b.n_chars / max(e2 - s + 1, 1)
        for i in range(min(s, bins - 1), min(e2, bins - 1) + 1):
            profile[i] += density
    return gaussian_smooth(profile, sigma)


def find_best_valley(profile: list[float]) -> tuple[float, float] | None:
    """Deepest bin < 0.35*avg -> (relative position, depth)
    (column_detector.rs:310-338)."""
    if not profile:
        return None
    avg = sum(profile) / len(profile)
    threshold = avg * 0.35
    best = None
    for i, val in enumerate(profile):
        if val < threshold:
            depth = avg - val
            if best is None or depth > best[1]:
                best = ((i + 0.5) / len(profile), depth)
    return best


def xy_cut(region: tuple[float, float, float, float], blocks: list[Block],
           indices: list[int] | None = None, depth: int = 0,
           max_depth: int = 10, min_region_size: float = 50.0,
           sigma: float = 2.0) -> LayoutTree:
    """Recursive XY-Cut (column_detector.rs:92-191). ``region`` is
    (x, y, w, h); cut in the deeper-valley direction; blocks split by
    center."""
    if indices is None:
        indices = list(range(len(blocks)))
    rx, ry, rw, rh = region
    if (depth >= max_depth or len(indices) <= 1
            or rw < min_region_size or rh < min_region_size):
        return LayoutTree(blocks=list(indices))

    h_valley = find_best_valley(_projection(region, blocks, indices, sigma,
                                            HORIZONTAL))
    v_valley = find_best_valley(_projection(region, blocks, indices, sigma,
                                            VERTICAL))
    if h_valley is None and v_valley is None:
        return LayoutTree(blocks=list(indices))
    if h_valley is not None and (v_valley is None or h_valley[1] > v_valley[1]):
        cut_pos, direction = h_valley[0], HORIZONTAL
    else:
        cut_pos, direction = v_valley[0], VERTICAL

    if direction == HORIZONTAL:
        split = ry + cut_pos * rh
        r1 = (rx, ry, rw, split - ry)
        r2 = (rx, split, rw, ry + rh - split)
        side1 = [i for i in indices if blocks[i].center[1] < split]
        side2 = [i for i in indices if blocks[i].center[1] >= split]
    else:
        split = rx + cut_pos * rw
        r1 = (rx, ry, split - rx, rh)
        r2 = (split, ry, rx + rw - split, rh)
        side1 = [i for i in indices if blocks[i].center[0] < split]
        side2 = [i for i in indices if blocks[i].center[0] >= split]
    if not side1 or not side2:
        return LayoutTree(blocks=list(indices))
    return LayoutTree(direction=direction, children=[
        xy_cut(r1, blocks, side1, depth + 1, max_depth, min_region_size, sigma),
        xy_cut(r2, blocks, side2, depth + 1, max_depth, min_region_size, sigma),
    ])


def xy_cut_adaptive(region: tuple[float, float, float, float],
                    blocks: list[Block], indices: list[int] | None,
                    params: "AdaptiveLayoutParams") -> LayoutTree:
    """XY-Cut with adaptive depth/size/sigma (column_detector.rs:433-453)."""
    return xy_cut(region, blocks, indices, 0, params.xy_cut_max_depth,
                  params.xy_cut_min_region_size, params.gaussian_sigma)


# ---------------------------------------------------------------------------
# L4/L5: reading order
# ---------------------------------------------------------------------------


def determine_reading_order(tree: LayoutTree) -> list[int]:
    """DFS leaf concatenation (reading_order.rs:33-53)."""
    order: list[int] = []

    def walk(t: LayoutTree) -> None:
        if t.is_leaf:
            order.extend(t.blocks)
        else:
            for child in t.children:
                walk(child)

    walk(tree)
    return order


def _precedes(a: Block, b: Block) -> bool:
    """Same line (|top diff|<5) -> left first; else larger Y (top of page)
    first (reading_order.rs:141-155; PDF origin bottom-left, Y up)."""
    if abs(a.top - b.top) < 5.0:
        return a.left < b.left
    return a.top > b.top


def graph_based_reading_order(blocks: list[Block]) -> list[int]:
    """Precedence DAG -> Kahn topo sort; fall back to input order on cycle
    (reading_order.rs:107-199)."""
    n = len(blocks)
    if n == 0:
        return []
    if n == 1:
        return [0]
    graph: list[set[int]] = [set() for _ in range(n)]
    for i in range(n):
        for j in range(n):
            if i != j and _precedes(blocks[i], blocks[j]):
                graph[i].add(j)
    in_degree = [0] * n
    for edges in graph:
        for node in edges:
            in_degree[node] += 1
    queue = [i for i in range(n) if in_degree[i] == 0]
    result: list[int] = []
    head = 0
    while head < len(queue):
        node = queue[head]
        head += 1
        result.append(node)
        for nxt in sorted(graph[node]):
            in_degree[nxt] -= 1
            if in_degree[nxt] == 0:
                queue.append(nxt)
    return result if len(result) == n else list(range(n))


# ---------------------------------------------------------------------------
# L1/L2: clustering
# ---------------------------------------------------------------------------


def cluster_chars_into_words(chars: list[Block], epsilon: float) -> list[list[int]]:
    """BFS connected components: same line if center dy < 0.5*font_size,
    connected if center dx <= epsilon; cluster sorted by x
    (clustering.rs:233-345)."""
    n = len(chars)
    if n == 0:
        return []
    if n == 1:
        return [[0]]
    visited = [False] * n
    clusters: list[list[int]] = []
    centers = [c.center for c in chars]
    for i in range(n):
        if visited[i]:
            continue
        cluster = [i]
        visited[i] = True
        j = 0
        while j < len(cluster):
            cur = cluster[j]
            cx, cy = centers[cur]
            fs = chars[cur].font_size
            for k in range(n):
                if visited[k]:
                    continue
                ox, oy = centers[k]
                if abs(cy - oy) < fs * 0.5 and abs(cx - ox) <= epsilon:
                    cluster.append(k)
                    visited[k] = True
            j += 1
        cluster.sort(key=lambda idx: chars[idx].x)
        clusters.append(cluster)
    return clusters


def cluster_words_into_lines(words: list[Block],
                             epsilon_y: float = 5.0) -> list[list[int]]:
    """Same-Y + horizontally connected (<50pt column-gap guard) BFS
    (clustering.rs:353-416)."""
    n = len(words)
    if n == 0:
        return []
    column_gap_threshold = 50.0
    assigned = [False] * n
    clusters: list[list[int]] = []
    for i in range(n):
        if assigned[i]:
            continue
        cluster = [i]
        assigned[i] = True
        j = 0
        while j < len(cluster):
            cur = words[cluster[j]]
            for k in range(n):
                if assigned[k]:
                    continue
                other = words[k]
                if abs(cur.y - other.y) > epsilon_y:
                    continue
                x_dist = min(abs(cur.right - other.left),
                             abs(other.right - cur.left))
                if x_dist < column_gap_threshold:
                    cluster.append(k)
                    assigned[k] = True
            j += 1
        cluster.sort(key=lambda idx: words[idx].x)
        clusters.append(cluster)
    return clusters


# ---------------------------------------------------------------------------
# L7: table detection
# ---------------------------------------------------------------------------


@dataclass
class Table:
    """table_detector.rs:14-23."""

    bbox: tuple[float, float, float, float]
    cells: list[list[int]]
    num_rows: int
    num_cols: int


def _find_alignments(blocks: list[Block], tolerance: float, axis: str,
                     min_members: int) -> list[list[int]]:
    """Greedy first-fit alignment grouping (table_detector.rs:81-144)."""
    used = [False] * len(blocks)
    alignments: list[list[int]] = []
    for i in range(len(blocks)):
        if used[i]:
            continue
        aligned = [i]
        used[i] = True
        for j in range(i + 1, len(blocks)):
            if used[j]:
                continue
            if axis == "x":
                close = abs(blocks[i].x - blocks[j].x) < tolerance
            else:
                close = abs(blocks[i].y - blocks[j].y) < tolerance
            if close:
                aligned.append(j)
                used[j] = True
        if len(aligned) >= min_members:
            alignments.append(aligned)
    return alignments


def detect_tables(blocks: list[Block]) -> list[Table]:
    """Vertical alignments (x within 5.0, >=3 blocks) x horizontal
    alignments (y within 3.0, >=2 blocks) -> grid regions >=4 blocks
    (table_detector.rs:61-200)."""
    if len(blocks) < 4:
        return []
    columns = _find_alignments(blocks, 5.0, "x", 3)
    rows = _find_alignments(blocks, 3.0, "y", 2)
    for row in rows:
        row.sort(key=lambda idx: blocks[idx].x)
    if len(columns) < 2 or len(rows) < 2:
        return []
    table_blocks: list[int] = []
    col_members = set()
    for col in columns:
        col_members.update(col)
    for row in rows:
        for idx in row:
            if idx in col_members and idx not in table_blocks:
                table_blocks.append(idx)
    if len(table_blocks) < 4:
        return []
    in_table = set(table_blocks)
    bbox = (blocks[table_blocks[0]].x, blocks[table_blocks[0]].y,
            blocks[table_blocks[0]].width, blocks[table_blocks[0]].height)
    acc = Block(*bbox)
    for idx in table_blocks[1:]:
        bbox = acc.union_bbox(blocks[idx])
        acc = Block(*bbox)
    cells = []
    for row in rows:
        row_cells = [idx for idx in row if idx in in_table]
        if row_cells:
            cells.append(row_cells)
    num_rows = len(cells)
    num_cols = max((len(r) for r in cells), default=0)
    return [Table(bbox=bbox, cells=cells, num_rows=num_rows,
                  num_cols=num_cols)]


# ---------------------------------------------------------------------------
# L8: adaptive parameters
# ---------------------------------------------------------------------------


def _median(values: list[float], default: float) -> float:
    if not values:
        return default
    s = sorted(values)
    return s[len(s) // 2]


@dataclass
class DocumentProperties:
    """Per-page statistics (document_analyzer.rs:45-87)."""

    median_font_size: float
    median_char_width: float
    median_line_spacing: float
    page_width: float
    page_height: float
    column_count: int
    avg_chars_per_line: float
    line_y_variance: float

    @classmethod
    def analyze(cls, chars: list[Block],
                page_bbox: tuple[float, float, float, float]) -> "DocumentProperties":
        """document_analyzer.rs:118-283 (raises ValueError on empty page,
        mirroring the reference's Err)."""
        if not chars:
            raise ValueError("Cannot analyze empty page")
        median_font_size = _median([c.font_size for c in chars], 12.0)
        median_char_width = _median([c.width for c in chars], 6.0)

        # line properties via 5-unit Y binning
        y_bins: dict[int, int] = {}
        for c in chars:
            y_bin = int(round(c.y / 5.0))
            y_bins[y_bin] = y_bins.get(y_bin, 0) + 1
        line_ys = sorted((k * 5.0 for k in y_bins), reverse=True)
        spacings = [abs(line_ys[i] - line_ys[i + 1])
                    for i in range(len(line_ys) - 1)
                    if abs(line_ys[i] - line_ys[i + 1]) > 0.1]
        median_line_spacing = _median(spacings, 12.0)
        total_lines = len(y_bins)
        avg_chars_per_line = len(chars) / total_lines if total_lines else 50.0
        mean_y = sum(line_ys) / max(len(line_ys), 1)
        line_y_variance = sum((y - mean_y) ** 2 for y in line_ys) / max(len(line_ys), 1)

        # column count via 10-unit X bins, gap >= 3 bins below 10% of max
        page_width = page_bbox[2]
        bin_count = max(int(math.ceil(page_width / 10.0)), 1)
        bins = [0] * bin_count
        for c in chars:
            b = int(c.x // 10.0)
            if 0 <= b < bin_count:
                bins[b] += 1
        max_density = max(bins) if bins else 1
        gap_threshold = int(max_density * 0.1)
        gap_count = 0
        in_gap = False
        gap_width = 0
        has_content = False
        for density in bins:
            if density <= gap_threshold:
                gap_width = gap_width + 1 if in_gap else 1
                in_gap = True
            else:
                if in_gap and gap_width >= 3 and has_content:
                    gap_count += 1
                in_gap = False
                gap_width = 0
                has_content = True
        column_count = min(gap_count + 1, 4)

        return cls(median_font_size=median_font_size,
                   median_char_width=median_char_width,
                   median_line_spacing=median_line_spacing,
                   page_width=page_width, page_height=page_bbox[3],
                   column_count=column_count,
                   avg_chars_per_line=avg_chars_per_line,
                   line_y_variance=line_y_variance)


@dataclass
class AdaptiveLayoutParams:
    """document_analyzer.rs:361-408."""

    xy_cut_min_gap_ratio: float = 0.05
    word_gap_threshold: float = 3.0
    line_gap_threshold: float = 15.0
    column_gap_threshold: float = 24.0
    xy_cut_max_depth: int = 10
    xy_cut_min_region_size: float = 50.0
    gaussian_sigma: float = 2.0

    @classmethod
    def from_properties(cls, props: DocumentProperties) -> "AdaptiveLayoutParams":
        density = props.avg_chars_per_line
        sigma = 0.5 if density < 30.0 else (1.5 if density < 60.0 else 2.5)
        return cls(
            xy_cut_min_gap_ratio=0.05,
            word_gap_threshold=props.median_char_width * 0.3,
            line_gap_threshold=props.median_line_spacing * 1.3,
            column_gap_threshold=props.median_font_size * 2.0,
            xy_cut_max_depth=10,
            xy_cut_min_region_size=math.sqrt(
                props.page_width * props.page_height * 0.05),
            gaussian_sigma=sigma,
        )
