"""Scalar pure-Python S2 truth kernel (the pytest oracle).

Dead-simple, per-value transcription of the S2 cell-id math documented
in SURVEY.md §3.1 (the formulas are identical across every public S2
port; the Swift reference is a translation of the Java library, so the
Java/Swift quadratic ST/UV convention with s,t ∈ [0,1] is used —
SURVEY.md §7.3.1 "conformance risk #1").  No numpy in the hot data
types: plain Python ints/floats, so an independent bug in the
vectorized kernels cannot be mirrored here.

Naming follows the reference API (fromLatLng → ``from_lat_lng`` etc.).
"""

from __future__ import annotations

import math

from s2geometry_ray.kernels.hilbert import (
    INVERT_MASK,
    LOOKUP_BITS,
    LOOKUP_IJ,
    LOOKUP_POS,
    SWAP_MASK,
)

MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1  # 61
MAX_SIZE = 1 << MAX_LEVEL     # 2^30
MASK64 = (1 << 64) - 1

# ---------------------------------------------------------------------------
# S2LatLng / S2Point  (SURVEY.md §3.1 S1, S2)
# ---------------------------------------------------------------------------


def latlng_to_xyz(lat_deg: float, lng_deg: float) -> tuple[float, float, float]:
    """S2LatLng.toPoint: unit vector from lat/lng in degrees."""
    phi = math.radians(lat_deg)
    theta = math.radians(lng_deg)
    cosphi = math.cos(phi)
    return (math.cos(theta) * cosphi, math.sin(theta) * cosphi, math.sin(phi))


def xyz_to_latlng(x: float, y: float, z: float) -> tuple[float, float]:
    """S2LatLng(point): (lat, lng) in degrees."""
    lat = math.atan2(z, math.sqrt(x * x + y * y))
    lng = math.atan2(y, x)
    return (math.degrees(lat), math.degrees(lng))


def angle(a: tuple[float, float, float], b: tuple[float, float, float]) -> float:
    """S1Angle(a, b): robust small-angle distance atan2(|a×b|, a·b), radians."""
    cx = a[1] * b[2] - a[2] * b[1]
    cy = a[2] * b[0] - a[0] * b[2]
    cz = a[0] * b[1] - a[1] * b[0]
    cross = math.sqrt(cx * cx + cy * cy + cz * cz)
    dot = a[0] * b[0] + a[1] * b[1] + a[2] * b[2]
    return math.atan2(cross, dot)


# ---------------------------------------------------------------------------
# Cube-face projections  (SURVEY.md §3.1 S3–S6)
# ---------------------------------------------------------------------------


def xyz_to_face(x: float, y: float, z: float) -> int:
    """Largest absolute component; +3 when that component is negative."""
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax > ay:
        face = 0 if ax > az else 2
    else:
        face = 1 if ay > az else 2
    if (x, y, z)[face] < 0.0:
        face += 3
    return face


def face_uv_to_xyz(face: int, u: float, v: float) -> tuple[float, float, float]:
    if face == 0:
        return (1.0, u, v)
    if face == 1:
        return (-u, 1.0, v)
    if face == 2:
        return (-u, -v, 1.0)
    if face == 3:
        return (-1.0, -v, -u)
    if face == 4:
        return (v, -1.0, -u)
    return (v, u, -1.0)


def valid_face_xyz_to_uv(face: int, x: float, y: float, z: float) -> tuple[float, float]:
    """Gnomonic projection onto ``face``; requires the point on that face's hemisphere."""
    if face == 0:
        return (y / x, z / x)
    if face == 1:
        return (-x / y, z / y)
    if face == 2:
        return (-x / z, -y / z)
    if face == 3:
        return (z / x, y / x)
    if face == 4:
        return (z / y, -x / y)
    return (-y / z, -x / z)


def xyz_to_face_uv(x: float, y: float, z: float) -> tuple[int, float, float]:
    face = xyz_to_face(x, y, z)
    u, v = valid_face_xyz_to_uv(face, x, y, z)
    return face, u, v


def uv_to_st(u: float) -> float:
    """Quadratic projection, Java/Swift convention, s ∈ [0, 1]."""
    if u >= 0.0:
        return 0.5 * math.sqrt(1.0 + 3.0 * u)
    return 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)


def st_to_uv(s: float) -> float:
    if s >= 0.5:
        return (1.0 / 3.0) * (4.0 * s * s - 1.0)
    return (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))


def st_to_ij(s: float) -> int:
    return max(0, min(MAX_SIZE - 1, int(math.floor(MAX_SIZE * s))))


# ---------------------------------------------------------------------------
# S2CellId core  (SURVEY.md §3.1 S7–S17)
# ---------------------------------------------------------------------------


def from_face_ij(face: int, i: int, j: int) -> int:
    """Hilbert-encode (face, i, j) at leaf level into a 64-bit cell id."""
    n = face << 60
    bits = face & SWAP_MASK
    for k in range(7, -1, -1):
        mask = (1 << LOOKUP_BITS) - 1
        bits += ((i >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2)
        bits += ((j >> (k * LOOKUP_BITS)) & mask) << 2
        bits = LOOKUP_POS[bits]
        n |= (bits >> 2) << (k * 2 * LOOKUP_BITS)
        bits &= SWAP_MASK | INVERT_MASK
    return ((n << 1) + 1) & MASK64


def from_point(x: float, y: float, z: float) -> int:
    face, u, v = xyz_to_face_uv(x, y, z)
    return from_face_ij(face, st_to_ij(uv_to_st(u)), st_to_ij(uv_to_st(v)))


def from_lat_lng(lat_deg: float, lng_deg: float) -> int:
    return from_point(*latlng_to_xyz(lat_deg, lng_deg))


def to_face_ij_orientation(cell_id: int) -> tuple[int, int, int, int]:
    face = cell_id >> POS_BITS
    bits = face & SWAP_MASK
    i = j = 0
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * LOOKUP_BITS) if k == 7 else LOOKUP_BITS
        bits += ((cell_id >> (k * 2 * LOOKUP_BITS + 1)) & ((1 << (2 * nbits)) - 1)) << 2
        bits = LOOKUP_IJ[bits]
        i += (bits >> (LOOKUP_BITS + 2)) << (k * LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << LOOKUP_BITS) - 1)) << (k * LOOKUP_BITS)
        bits &= SWAP_MASK | INVERT_MASK
    if (lsb(cell_id) & 0x1111111111111110) != 0:
        bits ^= SWAP_MASK
    return face, i, j, bits


def lsb(cell_id: int) -> int:
    return cell_id & (~cell_id + 1) & MASK64


def lsb_for_level(level: int) -> int:
    return 1 << (2 * (MAX_LEVEL - level))


def is_valid(cell_id: int) -> bool:
    return (
        0 < cell_id <= MASK64
        and (cell_id >> POS_BITS) < 6
        and (lsb(cell_id) & 0x1555555555555555) != 0
    )


def level(cell_id: int) -> int:
    return MAX_LEVEL - (lsb(cell_id).bit_length() - 1) // 2


def is_leaf(cell_id: int) -> bool:
    return (cell_id & 1) == 1


def parent(cell_id: int, level_: int) -> int:
    new_lsb = lsb_for_level(level_)
    return (cell_id & (~(new_lsb - 1) & MASK64)) | new_lsb


def range_min(cell_id: int) -> int:
    return cell_id - (lsb(cell_id) - 1)


def range_max(cell_id: int) -> int:
    return (cell_id + (lsb(cell_id) - 1)) & MASK64


def contains(a: int, b: int) -> bool:
    """Cell ``a`` contains cell ``b`` (descendant-or-equal)."""
    return range_min(a) <= b <= range_max(a)


def intersects(a: int, b: int) -> bool:
    return range_min(b) <= range_max(a) and range_max(b) >= range_min(a)


def child(cell_id: int, position: int) -> int:
    new_lsb = lsb(cell_id) >> 2
    return cell_id + (2 * position - 3) * new_lsb


def children(cell_id: int) -> list[int]:
    return [child(cell_id, p) for p in range(4)]


def child_begin(cell_id: int, level_: int) -> int:
    return cell_id - lsb(cell_id) + lsb_for_level(level_)


def child_end(cell_id: int, level_: int) -> int:
    return cell_id + lsb(cell_id) + lsb_for_level(level_)


def next_cell(cell_id: int) -> int:
    return (cell_id + (lsb(cell_id) << 1)) & MASK64


def prev_cell(cell_id: int) -> int:
    return (cell_id - (lsb(cell_id) << 1)) & MASK64


def token(cell_id: int) -> str:
    """Hex token with trailing zeros stripped; 'X' for the zero id."""
    if cell_id == 0:
        return "X"
    return f"{cell_id:016x}".rstrip("0")


def from_token(tok: str) -> int:
    if tok in ("", "X", "x"):
        return 0
    return int(tok.ljust(16, "0"), 16)


# ---------------------------------------------------------------------------
# Cell geometry  (S9, S18)
# ---------------------------------------------------------------------------


def get_size_ij(level_: int) -> int:
    return 1 << (MAX_LEVEL - level_)


def to_center_st(cell_id: int) -> tuple[int, int, int]:
    """(face, si, ti) of the cell center in 0..2^31 'si/ti' coordinates."""
    face, i, j, _ = to_face_ij_orientation(cell_id)
    delta = 1 if is_leaf(cell_id) else (2 if ((i ^ (cell_id >> 2)) & 1) else 0)
    # Center in (si, ti): 2*i + delta, where delta recenters non-leaf cells.
    return face, 2 * i + delta, 2 * j + delta


def to_point(cell_id: int) -> tuple[float, float, float]:
    """Unit-length center point of the cell (S2CellId.toPoint)."""
    face, si, ti = to_center_st(cell_id)
    u = st_to_uv((0.5 / MAX_SIZE) * si)
    v = st_to_uv((0.5 / MAX_SIZE) * ti)
    x, y, z = face_uv_to_xyz(face, u, v)
    n = math.sqrt(x * x + y * y + z * z)
    return (x / n, y / n, z / n)


def to_lat_lng(cell_id: int) -> tuple[float, float]:
    return xyz_to_latlng(*to_point(cell_id))


def cell_uv_bounds(cell_id: int) -> tuple[int, float, float, float, float]:
    """(face, u_lo, u_hi, v_lo, v_hi) of the cell's uv rectangle."""
    face, i, j, _ = to_face_ij_orientation(cell_id)
    size = get_size_ij(level(cell_id))
    i0 = i & -size
    j0 = j & -size
    u_lo = st_to_uv(i0 / MAX_SIZE)
    u_hi = st_to_uv((i0 + size) / MAX_SIZE)
    v_lo = st_to_uv(j0 / MAX_SIZE)
    v_hi = st_to_uv((j0 + size) / MAX_SIZE)
    return face, u_lo, u_hi, v_lo, v_hi


def cell_vertices(cell_id: int) -> list[tuple[float, float, float]]:
    """4 unit-length vertices in CCW order (lower-left first), like S2Cell.getVertex."""
    face, u_lo, u_hi, v_lo, v_hi = cell_uv_bounds(cell_id)
    out = []
    for u, v in ((u_lo, v_lo), (u_hi, v_lo), (u_hi, v_hi), (u_lo, v_hi)):
        x, y, z = face_uv_to_xyz(face, u, v)
        n = math.sqrt(x * x + y * y + z * z)
        out.append((x / n, y / n, z / n))
    return out


# ---------------------------------------------------------------------------
# Neighbors  (S15, S16)
# ---------------------------------------------------------------------------


def _from_face_ij_wrap(face: int, i: int, j: int) -> int:
    """fromFaceIJ handling i/j one step off the face (wrap to adjacent face).

    Uses the LINEAR st projection on both ends, exactly like the
    reference family's fromFaceIJWrap (SURVEY.md §3.1 S15).
    """
    i = max(-1, min(MAX_SIZE, i))
    j = max(-1, min(MAX_SIZE, j))
    k_scale = 1.0 / MAX_SIZE
    k_limit = 1.0 + 2.220446049250313e-16  # 1 + DBL_EPSILON
    u = max(-k_limit, min(k_limit, k_scale * (2 * (i - MAX_SIZE // 2) + 1)))
    v = max(-k_limit, min(k_limit, k_scale * (2 * (j - MAX_SIZE // 2) + 1)))
    x, y, z = face_uv_to_xyz(face, u, v)
    nface, nu, nv = xyz_to_face_uv(x, y, z)
    return from_face_ij(nface, st_to_ij(0.5 * (nu + 1)), st_to_ij(0.5 * (nv + 1)))


def _from_face_ij_same(face: int, i: int, j: int, same_face: bool) -> int:
    if same_face:
        return from_face_ij(face, i, j)
    return _from_face_ij_wrap(face, i, j)


def edge_neighbors(cell_id: int) -> list[int]:
    """4 lateral neighbors at the same level (down, right, up, left)."""
    lvl = level(cell_id)
    size = get_size_ij(lvl)
    face, i, j, _ = to_face_ij_orientation(cell_id)
    return [
        parent(_from_face_ij_same(face, i, j - size, j - size >= 0), lvl),
        parent(_from_face_ij_same(face, i + size, j, i + size < MAX_SIZE), lvl),
        parent(_from_face_ij_same(face, i, j + size, j + size < MAX_SIZE), lvl),
        parent(_from_face_ij_same(face, i - size, j, i - size >= 0), lvl),
    ]


def vertex_neighbors(cell_id: int, level_: int) -> list[int]:
    """3–4 cells at ``level_`` (< level(cell_id) is invalid; == allowed) touching
    the vertex of this cell closest to its center quadrant."""
    face, i, j, _ = to_face_ij_orientation(cell_id)
    halfsize = get_size_ij(level_ + 1)
    size = halfsize << 1
    if i & halfsize:
        ioffset, isame = size, (i + size) < MAX_SIZE
    else:
        ioffset, isame = -size, (i - size) >= 0
    if j & halfsize:
        joffset, jsame = size, (j + size) < MAX_SIZE
    else:
        joffset, jsame = -size, (j - size) >= 0
    out = [
        parent(cell_id, level_),
        parent(_from_face_ij_same(face, i + ioffset, j, isame), level_),
        parent(_from_face_ij_same(face, i, j + joffset, jsame), level_),
    ]
    if isame or jsame:
        out.append(
            parent(_from_face_ij_same(face, i + ioffset, j + joffset, isame and jsame), level_)
        )
    return out


def all_neighbors(cell_id: int, nbr_level: int) -> list[int]:
    """All cells at ``nbr_level`` (>= level of this cell) adjacent along any
    edge or vertex — the 8-ring when nbr_level == level(cell_id)."""
    face, i, j, _ = to_face_ij_orientation(cell_id)
    size = get_size_ij(level(cell_id))
    i &= -size
    j &= -size
    nbr_size = get_size_ij(nbr_level)
    out = []
    k = -nbr_size
    while True:
        if k < 0:
            same_face = (j + k) >= 0
        elif k >= size:
            same_face = (j + k) < MAX_SIZE
        else:
            same_face = True
            # Top and bottom neighbors.
            out.append(parent(_from_face_ij_same(face, i + k, j - nbr_size, j - size >= 0), nbr_level))
            out.append(parent(_from_face_ij_same(face, i + k, j + size, j + size < MAX_SIZE), nbr_level))
        # Left, right, and diagonal neighbors.
        out.append(parent(_from_face_ij_same(face, i - nbr_size, j + k, same_face and i - nbr_size >= 0), nbr_level))
        out.append(parent(_from_face_ij_same(face, i + size, j + k, same_face and i + size < MAX_SIZE), nbr_level))
        if k >= size:
            break
        k += nbr_size
    return out


# ---------------------------------------------------------------------------
# Metrics  (S24) — quadratic-projection constants (Java/Swift convention)
# ---------------------------------------------------------------------------

MIN_WIDTH_DERIV = 2.0 * math.sqrt(2.0) / 3.0          # 0.9428090415820635
MAX_WIDTH_DERIV = 1.704897179199218                   # kMaxAngleSpan (quadratic)
AVG_WIDTH_DERIV = 1.434523672886099


def min_width(level_: int) -> float:
    return MIN_WIDTH_DERIV * (2.0 ** (-level_))


def level_for_min_width(value: float) -> int:
    """Max level whose min width is >= value (Metric.getLevelForMinValue)."""
    if value <= 0:
        return MAX_LEVEL
    return max(0, min(MAX_LEVEL, int(math.floor(math.log2(MIN_WIDTH_DERIV / value)))))


# ---------------------------------------------------------------------------
# Areas (S19) and point-to-edge distance (S23)
# ---------------------------------------------------------------------------


def _turn_angle(a, b, c) -> float:
    """Exterior angle at b of the spherical path a→b→c."""
    ab = (a[1] * b[2] - a[2] * b[1], a[2] * b[0] - a[0] * b[2], a[0] * b[1] - a[1] * b[0])
    bc = (b[1] * c[2] - b[2] * c[1], b[2] * c[0] - b[0] * c[2], b[0] * c[1] - b[1] * c[0])
    ang = angle(ab, bc)
    cross_dir = (
        ab[1] * bc[2] - ab[2] * bc[1],
        ab[2] * bc[0] - ab[0] * bc[2],
        ab[0] * bc[1] - ab[1] * bc[0],
    )
    sign = 1.0 if (cross_dir[0] * b[0] + cross_dir[1] * b[1] + cross_dir[2] * b[2]) > 0 else -1.0
    return sign * ang


def loop_area(vertices) -> float:
    """Signed spherical excess of a loop (Girard/Gauss-Bonnet): area of
    the region on the LEFT of the CCW loop, in steradians."""
    n = len(vertices)
    turn = 0.0
    for i in range(n):
        turn += _turn_angle(vertices[i - 1], vertices[i], vertices[(i + 1) % n])
    return 2.0 * math.pi - turn


def cell_exact_area(cell_id: int) -> float:
    """Exact area of a cell in steradians (sum of two triangle excesses)."""
    v = cell_vertices(cell_id)
    return loop_area([v[0], v[1], v[2]]) + loop_area([v[0], v[2], v[3]])


def cell_average_area(level_: int) -> float:
    """Average cell area at a level: 4π/6 / 4^level (exact by symmetry)."""
    return (4.0 * math.pi / 6.0) / (4.0 ** level_)


def point_to_arc_distance(p, a, b) -> float:
    """Min angular distance from p to the great-circle arc a→b
    (clamped projection; the family's S2EdgeUtil.getDistance)."""
    n = (a[1] * b[2] - a[2] * b[1], a[2] * b[0] - a[0] * b[2], a[0] * b[1] - a[1] * b[0])
    nn = math.sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2])
    if nn == 0.0:
        return angle(p, a)
    # is the perpendicular foot inside the arc?  (family's interior test:
    # p must be on the "inside" of the planes through a and b ⊥ the arc)
    na = (n[1] * a[2] - n[2] * a[1], n[2] * a[0] - n[0] * a[2], n[0] * a[1] - n[1] * a[0])
    nb = (n[1] * b[2] - n[2] * b[1], n[2] * b[0] - n[0] * b[2], n[0] * b[1] - n[1] * b[0])
    if (p[0] * na[0] + p[1] * na[1] + p[2] * na[2]) > 0 > (p[0] * nb[0] + p[1] * nb[1] + p[2] * nb[2]):
        # distance to the great circle itself
        sin_d = abs(p[0] * n[0] + p[1] * n[1] + p[2] * n[2]) / nn
        return math.asin(max(-1.0, min(1.0, sin_d)))
    return min(angle(p, a), angle(p, b))
