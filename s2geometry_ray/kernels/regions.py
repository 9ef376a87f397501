"""Region types: spherical cap, lat/lng rect, spherical loop (polygon).

Reproduces the reference family's region semantics (SURVEY.md §3.2
R1–R6): each region answers

- ``contains_points(xyz)``   — vectorized exact point containment, the
  per-point hot path of the spatial join (numpy over (N,3) batches);
- ``may_intersect_cell(id)`` — conservative-true cell test driving the
  coverer (never False for a truly intersecting cell);
- ``contains_cell(id)``      — conservative-false interior test (True
  only when the cell is provably inside), used for the covering table's
  ``interior`` flag that lets the join skip exact PIP for most points.

Boundary policy (SURVEY.md §7.3.3): rect/cap containment is closed and
exact in float64; loop containment uses crossing parity from an interior
witness point and assumes test points are not within ~1e-9 rad of an
edge (the fixture generators enforce this).
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_ray.kernels import cellid as vk
from s2geometry_ray.kernels.geometry import (
    R1Interval,
    S1Interval,
    K_MAX_DET_ERROR,
    cell_contains_point,
    cell_edge_normals,
    cell_latlng_bound,
    cross,
    dot,
    norm,
    normalize,
    robust_crossing,
)
from s2geometry_ray.oracle import s2 as _s2


class Region:
    """Protocol matching the reference's S2Region (SURVEY.md §3.1 table)."""

    def contains_points(self, xyz: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def may_intersect_cell(self, cell_id: int) -> bool:
        raise NotImplementedError

    def contains_cell(self, cell_id: int) -> bool:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Cap (R1)
# ---------------------------------------------------------------------------


class CapRegion(Region):
    """center (unit xyz) + height = 1 − cos(radius)."""

    def __init__(self, center: tuple[float, float, float], height: float):
        self.center = center
        self.height = height

    @staticmethod
    def from_latlng_radius(lat_deg: float, lng_deg: float, radius_rad: float) -> "CapRegion":
        c = _s2.latlng_to_xyz(lat_deg, lng_deg)
        h = 2.0 * math.sin(radius_rad / 2.0) ** 2  # 1 - cos(r), stable for small r
        return CapRegion(c, h)

    def contains_points(self, xyz: np.ndarray) -> np.ndarray:
        c = np.asarray(self.center)
        d = xyz - c
        return np.einsum("ij,ij->i", d, d) <= 2.0 * self.height

    def _contains_point(self, p) -> bool:
        dx = p[0] - self.center[0]
        dy = p[1] - self.center[1]
        dz = p[2] - self.center[2]
        return dx * dx + dy * dy + dz * dz <= 2.0 * self.height

    def _boundary_intersects(self, cell_id: int, vertices) -> bool:
        """Cap boundary/interior intersects the cell beyond its vertices
        (the family's S2Cap.intersects(cell, vertices))."""
        if self.height >= 1.0:
            return False
        if self.height < 0.0:
            return False
        if cell_contains_point(cell_id, self.center):
            return True
        sin2_angle = self.height * (2.0 - self.height)
        edges = cell_edge_normals(cell_id)
        for k in range(4):
            edge = edges[k]
            d = dot(self.center, edge)
            if d > 0:
                continue
            if d * d > sin2_angle * dot(edge, edge):
                return False
            direction = cross(edge, self.center)
            if dot(direction, vertices[k]) < 0 and dot(direction, vertices[(k + 1) & 3]) > 0:
                return True
        return False

    def may_intersect_cell(self, cell_id: int) -> bool:
        vertices = _s2.cell_vertices(cell_id)
        if any(self._contains_point(v) for v in vertices):
            return True
        return self._boundary_intersects(cell_id, vertices)

    def contains_cell(self, cell_id: int) -> bool:
        vertices = _s2.cell_vertices(cell_id)
        if not all(self._contains_point(v) for v in vertices):
            return False
        comp = CapRegion((-self.center[0], -self.center[1], -self.center[2]), 2.0 - self.height)
        return not comp._boundary_intersects(cell_id, vertices)


# ---------------------------------------------------------------------------
# Lat/lng rect (R2)
# ---------------------------------------------------------------------------


class RectRegion(Region):
    """Closed lat interval × wrapping lng interval (radians internally)."""

    def __init__(self, lat: R1Interval, lng: S1Interval, deg_bounds=None):
        self.lat = lat
        self.lng = lng
        # (lat_lo, lat_hi, lng_lo, lng_hi) in degrees when constructed from
        # degrees — lets the join refine in degree space, bit-identical to
        # a SQL BETWEEN on the same bounds.
        self.deg_bounds = deg_bounds

    @staticmethod
    def from_degrees(lat_lo: float, lat_hi: float, lng_lo: float, lng_hi: float) -> "RectRegion":
        """lng_lo > lng_hi ⇒ the rect crosses the ±180° meridian."""
        return RectRegion(
            R1Interval(math.radians(lat_lo), math.radians(lat_hi)),
            S1Interval(math.radians(lng_lo), math.radians(lng_hi)),
            deg_bounds=(lat_lo, lat_hi, lng_lo, lng_hi),
        )

    def contains_points(self, xyz: np.ndarray) -> np.ndarray:
        lat = np.arcsin(np.clip(xyz[:, 2], -1.0, 1.0))
        lng = np.arctan2(xyz[:, 1], xyz[:, 0])
        ok = (lat >= self.lat.lo) & (lat <= self.lat.hi)
        if self.lng.is_full():
            return ok
        if self.lng.is_inverted():
            return ok & ((lng >= self.lng.lo) | (lng <= self.lng.hi))
        return ok & (lng >= self.lng.lo) & (lng <= self.lng.hi)

    def contains_latlng_deg(self, lat: np.ndarray, lng: np.ndarray) -> np.ndarray:
        """Degree-space closed-interval test, bit-identical to a SQL
        ``lat BETWEEN lo AND hi AND lng BETWEEN lo AND hi`` on the same
        bounds (no unit conversion on the comparison path)."""
        if self.deg_bounds is None:
            raise ValueError("rect was not built from degree bounds")
        lat_lo, lat_hi, lng_lo, lng_hi = self.deg_bounds
        ok = (lat >= lat_lo) & (lat <= lat_hi)
        if lng_lo > lng_hi:  # wraps ±180
            return ok & ((lng >= lng_lo) | (lng <= lng_hi))
        return ok & (lng >= lng_lo) & (lng <= lng_hi)

    def may_intersect_cell(self, cell_id: int) -> bool:
        clat, clng = cell_latlng_bound(cell_id)
        return self.lat.intersects(clat) and self.lng.intersects(clng)

    def contains_cell(self, cell_id: int) -> bool:
        clat, clng = cell_latlng_bound(cell_id)
        return self.lat.contains_interval(clat) and self.lng.contains_interval(clng)


# ---------------------------------------------------------------------------
# Loop / single-loop polygon (R3, R4)
# ---------------------------------------------------------------------------


class LoopRegion(Region):
    """Closed loop of unit vectors, CCW = interior on the left.

    Point containment = crossing parity of arc(witness → p) against the
    loop edges, where the witness is a point displaced ~1e-7 rad to the
    interior side of edge 0's midpoint (SURVEY.md §3.2 R3 — equivalent
    to the family's fixed-origin parity method, with the bootstrap
    solved geometrically).  Assumes loop features ≫ 1e-7 rad.
    """

    def __init__(self, vertices_xyz: np.ndarray):
        v = np.asarray(vertices_xyz, dtype=np.float64)
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        self.vertices = v
        self._edges_a = v
        self._edges_b = np.roll(v, -1, axis=0)
        # per-edge great-circle normals c×d
        self._cd = np.cross(self._edges_a, self._edges_b)
        self._witness = self._make_witness()
        self._bound_lat, self._bound_lng = self._make_bound()

    @staticmethod
    def from_latlng_degrees(latlngs) -> "LoopRegion":
        pts = [_s2.latlng_to_xyz(la, ln) for (la, ln) in latlngs]
        return LoopRegion(np.asarray(pts))

    def _make_witness(self) -> np.ndarray:
        # anchor at the LONGEST edge: the interior beside its midpoint is
        # locally a half-plane, so the fixed 1e-7 displacement stays
        # inside.  Edge 0 can be a micro-edge inside a narrow corner
        # wedge (overlay output at a jitter-shared vertex), where a
        # 1e-7 step overshoots the wedge and inverts parity globally.
        k = int(np.argmax(np.linalg.norm(self._edges_b - self._edges_a,
                                         axis=1)))
        a = self.vertices[k]
        b = self.vertices[(k + 1) % len(self.vertices)]
        m = normalize((a + b).tolist())
        t = b - np.asarray(m) * float(np.dot(b, m))
        t = t / np.linalg.norm(t)
        left = np.cross(m, t)
        w = np.asarray(m) + 1e-7 * left
        return w / np.linalg.norm(w)

    def _make_bound(self) -> tuple[R1Interval, S1Interval]:
        v = self.vertices
        lat = np.arcsin(np.clip(v[:, 2], -1, 1))
        lng = np.arctan2(v[:, 1], v[:, 0])
        lat_itv = R1Interval(float(lat.min()), float(lat.max()))
        lng_itv = S1Interval.empty()
        for k in range(len(v)):
            lng_itv = lng_itv.union(
                S1Interval.from_point_pair(float(lng[k]), float(lng[(k + 1) % len(v)]))
            )
        # latitude bulge: include great-circle z-extrema that land on an edge
        for k in range(len(v)):
            a, b = v[k], v[(k + 1) % len(v)]
            n = np.cross(a, b)
            n2 = float(n @ n)
            hxy = float(n[0] * n[0] + n[1] * n[1])
            if n2 <= 0 or hxy <= 1e-30:
                continue
            pe = np.array([-n[0] * n[2], -n[1] * n[2], hxy])
            pe = pe / np.linalg.norm(pe)
            for cand in (pe, -pe):
                if float(np.dot(np.cross(a, cand), n)) >= 0 and float(np.dot(np.cross(cand, b), n)) >= 0:
                    lat_itv = lat_itv.union(
                        R1Interval.from_point_pair(math.asin(float(np.clip(cand[2], -1, 1))), lat_itv.lo)
                    )
        lat_itv = lat_itv.expanded(1e-12)
        # pole closure: if the interior contains a pole the boundary hull
        # under-covers — detect and widen.
        if bool(self.contains_points(np.array([[0.0, 0.0, 1.0]]))[0]):
            lat_itv = R1Interval(lat_itv.lo, math.pi / 2)
            lng_itv = S1Interval.full()
        if bool(self.contains_points(np.array([[0.0, 0.0, -1.0]]))[0]):
            lat_itv = R1Interval(-math.pi / 2, lat_itv.hi)
            lng_itv = S1Interval.full()
        return lat_itv, lng_itv.expanded(1e-12)

    def contains_points(self, xyz: np.ndarray) -> np.ndarray:
        """Vectorized crossing-parity containment: (N,3) → bool (N,)."""
        p = np.asarray(xyz, dtype=np.float64)
        w = self._witness
        ab = np.cross(np.broadcast_to(w, p.shape), p)      # (N,3) normals of arc(w→p)
        acb = -(ab @ self._edges_a.T)                      # (N,E)
        bda = ab @ self._edges_b.T
        cbd = -(p @ self._cd.T)
        dac = self._cd @ w                                 # (E,)
        crossing = (acb * bda > 0) & (acb * cbd > 0) & (acb * dac[None, :] > 0)
        # exact slow path: (point, edge) pairs whose determinant falls in
        # the float rounding band re-decide with rational arithmetic
        # (geometry.robust_crossing triages then goes exact) — sliver
        # geometries no longer flip parity.  Rare by construction, so the
        # Python loop runs over a handful of flagged pairs only.
        eps = K_MAX_DET_ERROR
        suspect = ((np.abs(acb) <= eps) | (np.abs(bda) <= eps)
                   | (np.abs(cbd) <= eps) | (np.abs(dac)[None, :] <= eps))
        if suspect.any():
            for n_, e_ in zip(*np.nonzero(suspect)):
                crossing[n_, e_] = robust_crossing(
                    tuple(w), tuple(p[n_]),
                    tuple(self._edges_a[e_]), tuple(self._edges_b[e_]))
        parity = np.sum(crossing, axis=1) & 1
        return parity == 0  # even crossings ⇒ same side as the interior witness

    def may_intersect_cell(self, cell_id: int) -> bool:
        clat, clng = cell_latlng_bound(cell_id)
        if not (self._bound_lat.intersects(clat) and self._bound_lng.intersects(clng)):
            return False
        cverts = _s2.cell_vertices(cell_id)
        if bool(np.any(self.contains_points(np.asarray(cverts)))):
            return True
        for v in self.vertices:
            if cell_contains_point(cell_id, (float(v[0]), float(v[1]), float(v[2]))):
                return True
        return self._crosses_cell_boundary(cverts)

    def _crosses_cell_boundary(self, cverts) -> bool:
        nv = len(self.vertices)
        for k in range(nv):
            a = tuple(self.vertices[k])
            b = tuple(self.vertices[(k + 1) % nv])
            for e in range(4):
                if robust_crossing(a, b, cverts[e], cverts[(e + 1) % 4]):
                    return True
        return False

    def contains_cell(self, cell_id: int) -> bool:
        cverts = _s2.cell_vertices(cell_id)
        if not bool(np.all(self.contains_points(np.asarray(cverts)))):
            return False
        if self._crosses_cell_boundary(cverts):
            return False
        for v in self.vertices:
            if cell_contains_point(cell_id, (float(v[0]), float(v[1]), float(v[2]))):
                return False
        return True


class PolygonRegion(Region):
    """Multi-loop polygon with holes (R4 full semantics): loop 0 is the
    shell, further loops are holes; containment = in shell AND in no
    hole (the family's depth-parity XOR restricted to one nesting
    level, which is what the tiles schema stores — SURVEY.md §2.2).

    Cell predicates are conservative the safe way round: may_intersect
    follows the shell (superset of the region), contains requires the
    shell to contain the cell AND every hole to be provably disjoint
    from it.
    """

    def __init__(self, shell: LoopRegion, holes: list[LoopRegion]):
        self.shell = shell
        self.holes = holes

    @staticmethod
    def from_latlng_degrees(loops) -> "PolygonRegion":
        regions = [LoopRegion.from_latlng_degrees(lp) for lp in loops]
        return PolygonRegion(regions[0], regions[1:])

    def contains_points(self, xyz: np.ndarray) -> np.ndarray:
        inside = self.shell.contains_points(xyz)
        for hole in self.holes:
            inside &= ~hole.contains_points(xyz)
        return inside

    def may_intersect_cell(self, cell_id: int) -> bool:
        if not self.shell.may_intersect_cell(cell_id):
            return False
        # if some hole fully contains the cell, the region misses it
        for hole in self.holes:
            if hole.contains_cell(cell_id):
                return False
        return True

    def contains_cell(self, cell_id: int) -> bool:
        if not self.shell.contains_cell(cell_id):
            return False
        return all(not hole.may_intersect_cell(cell_id) for hole in self.holes)


class PolylineRegion(Region):
    """Buffered polyline: all points within ``radius_rad`` of an open
    chain of great-circle arcs (the reference's S2Polyline + distance
    semantics — SURVEY.md §3.1 S23 — lifted to a coverable region, which
    is what a route-proximity join needs).

    Point distance is the vectorized clamped-projection arc distance;
    cell predicates are conservative via the cell circumradius:
    may_intersect ⇐ dist(center) ≤ r + circum (never false-negative),
    contains ⇐ dist(center) + circum ≤ r (never false-positive).
    """

    def __init__(self, vertices_xyz: np.ndarray, radius_rad: float):
        v = np.asarray(vertices_xyz, dtype=np.float64)
        self.vertices = v / np.linalg.norm(v, axis=1, keepdims=True)
        self.radius = float(radius_rad)
        self._arc_a = self.vertices[:-1]
        self._arc_b = self.vertices[1:]
        n = np.cross(self._arc_a, self._arc_b)
        self._arc_n = n
        self._arc_nn = np.linalg.norm(n, axis=1)
        # planes through each endpoint ⊥ the arc (interior test)
        self._na = np.cross(n, self._arc_a)
        self._nb = np.cross(n, self._arc_b)

    @staticmethod
    def from_latlng_degrees(latlngs, radius_rad: float) -> "PolylineRegion":
        pts = [_s2.latlng_to_xyz(la, ln) for (la, ln) in latlngs]
        return PolylineRegion(np.asarray(pts), radius_rad)

    def distance(self, xyz: np.ndarray) -> np.ndarray:
        """(N,3) → (N,) min angular distance to the polyline, radians."""
        p = np.asarray(xyz, dtype=np.float64)
        best = np.full(p.shape[0], np.inf)
        for k in range(self._arc_a.shape[0]):
            inside = (p @ self._na[k] > 0) & (p @ self._nb[k] < 0)
            d_ends = np.minimum(
                np.arccos(np.clip(p @ self._arc_a[k], -1, 1)),
                np.arccos(np.clip(p @ self._arc_b[k], -1, 1)),
            )
            if self._arc_nn[k] > 0:
                sin_d = np.abs(p @ self._arc_n[k]) / self._arc_nn[k]
                d_gc = np.arcsin(np.clip(sin_d, -1, 1))
                d = np.where(inside, d_gc, d_ends)
            else:
                d = d_ends
            best = np.minimum(best, d)
        return best

    def contains_points(self, xyz: np.ndarray) -> np.ndarray:
        return self.distance(xyz) <= self.radius

    def _center_circum(self, cell_id: int):
        ctr = np.asarray([_s2.to_point(cell_id)])
        verts = np.asarray(_s2.cell_vertices(cell_id))
        circum = float(
            np.arccos(np.clip(verts @ ctr[0], -1, 1)).max())
        return ctr, circum

    def may_intersect_cell(self, cell_id: int) -> bool:
        ctr, circum = self._center_circum(cell_id)
        return bool(self.distance(ctr)[0] <= self.radius + circum)

    def contains_cell(self, cell_id: int) -> bool:
        ctr, circum = self._center_circum(cell_id)
        return bool(self.distance(ctr)[0] + circum <= self.radius)
