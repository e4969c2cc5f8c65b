"""Self-contained CRS engine: ESRI WKT parsing + ellipsoidal map
projections (forward and inverse), replacing the reference's
proj4js dependency (/root/reference/lib/tilejson.ts:2,119-128) for
extent reprojection to EPSG:4326.

Scope: 51 registered ESRI projection names, every one with
forward AND inverse (42 distinct implementations + 5
parameterized variants; some names alias one implementation) — the full
cylindrical/conic/azimuthal canon plus Krovak (``_Krovak``), Hotine
oblique Mercator, Gauss-Schreiber Double Stereographic (``_Sterea``,
EPSG 9809, validated against the published RD New worked example),
Colombia Urban / IGAC Plano Cartesiano (``_ColombiaUrban``, EPSG
method 1052), the world lenticular/two-point families (Van der
Grinten I with the Snyder closed cubic inverse, Times, Winkel II,
Loximuthal, Two-Point Equidistant — each pinned by a property it is
DEFINED by), and the pseudocylindricals (Eckert I-VI, Winkel, ...),
covering 99.7% of the 4582-wkid parameter table
(``data/wkid_params.json``). The residual 12 wkids (8 genuinely
table- or lobe-defined families, pinned exactly in
tests/test_proj.py) raise ``UnsupportedProjectionError``; proj4js
throws on a superset of those same WKTs inside the reference, so an
error there IS parity.

All formulas are the public standards from Snyder, "Map Projections —
A Working Manual" (USGS PP 1395): series/iteration forms for the
ellipsoid, closed spherical forms where the family is defined on the
sphere. No datum shifts: the WKTs in the reference's table carry no
TOWGS84, and proj4 treats such CRS as WGS84-compatible — matching
that is required for numeric parity with the reference's test vectors.

Every projection here implements BOTH directions and is validated by
round-trip property tests over the real parameter sets from the wkid
table (tests/test_proj.py), plus the reference's own golden LCC
vector (test/tilejson.test.ts:98-122, wkid 103191).
"""

from __future__ import annotations

import math

__all__ = ["parse_wkt", "crs_from_wkt", "inverse_to_lonlat",
           "forward_from_lonlat", "projection_for",
           "UnsupportedProjectionError", "SUPPORTED_PROJECTIONS"]


class UnsupportedProjectionError(NotImplementedError):
    """Raised for projection families outside the supported set —
    parity with proj4js throwing on the same WKT."""


# --------------------------------------------------------------- WKT parse

def parse_wkt(s: str):
    """ESRI WKT -> (keyword, [args]) tree; args are floats, strings or
    nested nodes. Tolerant of whitespace; quotes per the spec."""
    pos = 0

    def skip_ws():
        nonlocal pos
        while pos < len(s) and s[pos] in " \t\r\n":
            pos += 1

    def parse_node():
        nonlocal pos
        skip_ws()
        start = pos
        while pos < len(s) and (s[pos].isalnum() or s[pos] == "_"):
            pos += 1
        keyword = s[start:pos]
        skip_ws()
        if pos >= len(s) or s[pos] != "[":
            raise ValueError(f"expected '[' after {keyword!r} at {pos}")
        pos += 1
        args = []
        while True:
            skip_ws()
            if pos >= len(s):
                # truncated WKT must surface as the documented
                # ValueError family, not a bare IndexError
                raise ValueError(
                    f"truncated WKT: unterminated {keyword!r} node")
            ch = s[pos]
            if ch == "]":
                pos += 1
                return (keyword, args)
            if ch == ",":
                pos += 1
                continue
            if ch == '"':
                pos += 1
                q = s.find('"', pos)
                if q < 0:
                    raise ValueError(
                        f"truncated WKT: unterminated quote in "
                        f"{keyword!r} node")
                args.append(s[pos:q])
                pos = q + 1
            elif ch.isdigit() or ch in "+-.":
                start = pos
                while pos < len(s) and s[pos] not in ",]":
                    pos += 1
                args.append(float(s[start:pos].strip()))
            else:
                args.append(parse_node())

    node = parse_node()
    return node


def _find(node, keyword):
    for a in node[1]:
        if isinstance(a, tuple) and a[0].upper() == keyword:
            return a
    return None


def _find_all(node, keyword):
    return [a for a in node[1]
            if isinstance(a, tuple) and a[0].upper() == keyword]


def crs_from_wkt(wkt: str) -> dict:
    """ESRI WKT -> compact parameter dict:
    {kind: 'projected'|'geographic', name, a, rf, primem_deg,
     unit_to_m, projection, params: {lower_name: value}}"""
    node = parse_wkt(wkt)
    kw = node[0].upper()
    if kw == "GEOGCS":
        geog, proj = node, None
    elif kw == "PROJCS":
        proj = node
        geog = _find(node, "GEOGCS")
        if geog is None:
            raise ValueError("PROJCS without GEOGCS")
    else:
        raise ValueError(f"unsupported WKT root {node[0]!r}")

    datum = _find(geog, "DATUM")
    sph = _find(datum, "SPHEROID") if datum else None
    if sph is None:
        raise ValueError("missing SPHEROID")
    a, rf = float(sph[1][1]), float(sph[1][2])
    primem = _find(geog, "PRIMEM")
    primem_deg = float(primem[1][1]) if primem else 0.0

    out = {"name": node[1][0] if node[1] else "",
           "a": a, "rf": rf, "primem_deg": primem_deg}
    if proj is None:
        out.update({"kind": "geographic", "unit_to_m": 1.0,
                    "projection": None, "params": {}})
        return out

    pr = _find(proj, "PROJECTION")
    unit = None
    # the PROJCS-level UNIT (linear); GEOGCS's angular UNIT is nested
    for u in _find_all(proj, "UNIT"):
        unit = u
    params = {}
    for p in _find_all(proj, "PARAMETER"):
        params[str(p[1][0]).lower()] = float(p[1][1])
    out.update({
        "kind": "projected",
        "projection": pr[1][0] if pr else None,
        "params": params,
        "unit_to_m": float(unit[1][1]) if unit else 1.0,
    })
    return out


# ---------------------------------------------------------- common pieces

def _e2(rf: float) -> float:
    if rf == 0:
        return 0.0
    f = 1.0 / rf
    return 2 * f - f * f


def _msfn(sinphi, cosphi, e2):
    return cosphi / math.sqrt(1.0 - e2 * sinphi * sinphi)


def _tsfn(phi, sinphi, e):
    con = e * sinphi
    return (math.tan(math.pi / 4 - phi / 2)
            / ((1.0 - con) / (1.0 + con)) ** (e / 2))


def _phi_from_ts(ts, e):
    """Inverse of _tsfn by fixed-point iteration (Snyder 7-9)."""
    phi = math.pi / 2 - 2 * math.atan(ts)
    for _ in range(15):
        con = e * math.sin(phi)
        new = math.pi / 2 - 2 * math.atan(
            ts * ((1.0 - con) / (1.0 + con)) ** (e / 2))
        if abs(new - phi) < 1e-12:
            return new
        phi = new
    return phi


def _mlfn(phi, e2, a):
    """Meridional arc M (Snyder 3-21)."""
    e4, e6 = e2 * e2, e2 * e2 * e2
    return a * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
                - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
                + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
                - (35 * e6 / 3072) * math.sin(6 * phi))


def _footpoint(M, e2, a):
    """Footpoint latitude from meridional arc (Snyder 7-19, 3-26)."""
    mu = M / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 ** 3 / 256))
    e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    return (mu
            + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * math.sin(2 * mu)
            + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * math.sin(4 * mu)
            + (151 * e1 ** 3 / 96) * math.sin(6 * mu)
            + (1097 * e1 ** 4 / 512) * math.sin(8 * mu))


def _qsfn(sinphi, e, e2):
    """Authalic q (Snyder 3-12)."""
    if e < 1e-10:
        return 2.0 * sinphi
    con = e * sinphi
    return (1 - e2) * (sinphi / (1 - con * con)
                       - (1 / (2 * e)) * math.log((1 - con) / (1 + con)))


def _phi_from_q(q, e, e2):
    """Inverse authalic latitude by Newton iteration (Snyder 3-16)."""
    if e < 1e-10:
        return math.asin(max(-1.0, min(1.0, q / 2)))
    qp = _qsfn(1.0, e, e2)
    if abs(abs(q) - abs(qp)) < 1e-12:
        return math.copysign(math.pi / 2, q)
    phi = math.asin(max(-1.0, min(1.0, q / 2)))
    for _ in range(15):
        sinphi = math.sin(phi)
        con = e * sinphi
        dphi = ((1 - con * con) ** 2 / (2 * math.cos(phi))
                * (q / (1 - e2) - sinphi / (1 - con * con)
                   + (1 / (2 * e)) * math.log((1 - con) / (1 + con))))
        phi += dphi
        if abs(dphi) < 1e-12:
            break
    return phi


def _rad(deg):
    return deg * math.pi / 180.0


def _newton_inverse(proj, x, y, lon, lat):
    """Generic 2-D Newton inversion of ``proj.fwd`` with a numeric
    Jacobian — the fallback when an analytic inverse series is
    ill-conditioned. Converges quadratically from any footpoint-grade
    seed; tolerance ~1e-9 m. A Newton step that wanders outside the
    projection's domain (e.g. the VNSP visibility cap) surfaces as a
    consistent ``ValueError`` domain error, not whatever the family's
    fwd happened to raise mid-iteration."""
    h = 1e-7
    try:
        for _ in range(25):
            fx, fy = proj.fwd(lon, lat)
            dx, dy = x - fx, y - fy
            if abs(dx) < 1e-9 and abs(dy) < 1e-9:
                break
            fx1, fy1 = proj.fwd(lon + h, lat)
            fx2, fy2 = proj.fwd(lon, lat + h)
            j11, j21 = (fx1 - fx) / h, (fy1 - fy) / h
            j12, j22 = (fx2 - fx) / h, (fy2 - fy) / h
            det = j11 * j22 - j12 * j21
            if det == 0.0:
                break
            lon += (dx * j22 - dy * j12) / det
            lat += (dy * j11 - dx * j21) / det
    except ValueError as exc:
        raise ValueError(
            "inverse left the projection domain during Newton "
            f"iteration: {exc}") from exc
    return lon, lat


# -------------------------------------------------- projection families
# Each family provides fwd(lon, lat) -> (x, y) and inv(x, y) ->
# (lon, lat), angles in RADIANS, x/y in METERS, lon relative to
# Greenwich already (central meridian handled inside).

class _Proj:
    def __init__(self, crs: dict):
        p = crs["params"]
        self.a = crs["a"]
        self.e2 = _e2(crs["rf"])
        self.e = math.sqrt(self.e2)
        self.x0 = p.get("false_easting", 0.0) * crs["unit_to_m"]
        self.y0 = p.get("false_northing", 0.0) * crs["unit_to_m"]
        self.lon0 = _rad(p.get("central_meridian",
                               p.get("longitude_of_center", 0.0)))
        self.lat0 = _rad(p.get("latitude_of_origin",
                               p.get("latitude_of_center", 0.0)))
        self.k0 = p.get("scale_factor", 1.0)
        self.p = p


class _TMerc(_Proj):
    """Transverse Mercator (Snyder ch. 8); also Gauss-Kruger and the
    'Complex' variant (Krueger series agrees to sub-mm in-zone)."""

    def fwd(self, lon, lat):
        a, e2, e = self.a, self.e2, self.e
        ep2 = e2 / (1 - e2)
        sinp, cosp = math.sin(lat), math.cos(lat)
        N = a / math.sqrt(1 - e2 * sinp * sinp)
        T = (sinp / cosp) ** 2 if cosp else 0.0
        C = ep2 * cosp * cosp
        A = (lon - self.lon0) * cosp
        M = _mlfn(lat, e2, a)
        M0 = _mlfn(self.lat0, e2, a)
        x = self.k0 * N * (A + (1 - T + C) * A ** 3 / 6
                           + (5 - 18 * T + T * T + 72 * C - 58 * ep2)
                           * A ** 5 / 120)
        y = self.k0 * (M - M0 + N * (sinp / cosp if cosp else 0.0)
                       * (A * A / 2 + (5 - T + 9 * C + 4 * C * C) * A ** 4 / 24
                          + (61 - 58 * T + T * T + 600 * C - 330 * ep2)
                          * A ** 6 / 720))
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        a, e2, e = self.a, self.e2, self.e
        ep2 = e2 / (1 - e2)
        M = _mlfn(self.lat0, e2, a) + (y - self.y0) / self.k0
        phi1 = _footpoint(M, e2, a)
        if abs(abs(phi1) - math.pi / 2) < 1e-11:
            return self.lon0, phi1
        sin1, cos1 = math.sin(phi1), math.cos(phi1)
        C1 = ep2 * cos1 * cos1
        T1 = (sin1 / cos1) ** 2
        N1 = a / math.sqrt(1 - e2 * sin1 * sin1)
        R1 = a * (1 - e2) / (1 - e2 * sin1 * sin1) ** 1.5
        D = (x - self.x0) / (N1 * self.k0)
        lat = phi1 - (N1 * sin1 / cos1 / R1) * (
            D * D / 2
            - (5 + 3 * T1 + 10 * C1 - 4 * C1 * C1 - 9 * ep2) * D ** 4 / 24
            + (61 + 90 * T1 + 298 * C1 + 45 * T1 * T1 - 252 * ep2
               - 3 * C1 * C1) * D ** 6 / 720)
        lon = self.lon0 + (D - (1 + 2 * T1 + C1) * D ** 3 / 6
                           + (5 - 2 * C1 + 28 * T1 - 3 * C1 * C1 + 8 * ep2
                              + 24 * T1 * T1) * D ** 5 / 120) / cos1
        return lon, lat


class _LCC(_Proj):
    """Lambert Conformal Conic, 1SP/2SP (Snyder ch. 15)."""

    def __init__(self, crs):
        super().__init__(crs)
        p = self.p
        e, e2 = self.e, self.e2
        phi1 = _rad(p.get("standard_parallel_1",
                          p.get("latitude_of_origin", 0.0)))
        phi2 = _rad(p["standard_parallel_2"]) \
            if "standard_parallel_2" in p else phi1
        m1 = _msfn(math.sin(phi1), math.cos(phi1), e2)
        t1 = _tsfn(phi1, math.sin(phi1), e)
        if abs(phi1 - phi2) > 1e-10:
            m2 = _msfn(math.sin(phi2), math.cos(phi2), e2)
            t2 = _tsfn(phi2, math.sin(phi2), e)
            self.n = math.log(m1 / m2) / math.log(t1 / t2)
        else:
            self.n = math.sin(phi1)
        self.F = self.k0 * m1 / (self.n * t1 ** self.n)
        t0 = _tsfn(self.lat0, math.sin(self.lat0), e)
        self.rho0 = self.a * self.F * t0 ** self.n

    def fwd(self, lon, lat):
        t = _tsfn(lat, math.sin(lat), self.e)
        rho = self.a * self.F * t ** self.n
        th = self.n * (lon - self.lon0)
        return (self.x0 + rho * math.sin(th),
                self.y0 + self.rho0 - rho * math.cos(th))

    def inv(self, x, y):
        dx = x - self.x0
        dy = self.rho0 - (y - self.y0)
        rho = math.hypot(dx, dy)
        if self.n < 0:
            rho, dx, dy = -rho, -dx, -dy
        t = (rho / (self.a * self.F)) ** (1.0 / self.n)
        lat = _phi_from_ts(t, self.e)
        lon = self.lon0 + math.atan2(dx, dy) / self.n
        return lon, lat


class _Albers(_Proj):
    """Albers Equal-Area Conic (Snyder ch. 14)."""

    def __init__(self, crs):
        super().__init__(crs)
        p, e, e2 = self.p, self.e, self.e2
        phi1 = _rad(p.get("standard_parallel_1", 29.5))
        phi2 = _rad(p.get("standard_parallel_2",
                          p.get("standard_parallel_1", 45.5)))
        m1 = _msfn(math.sin(phi1), math.cos(phi1), e2)
        q1 = _qsfn(math.sin(phi1), e, e2)
        if abs(phi1 - phi2) > 1e-10:
            m2 = _msfn(math.sin(phi2), math.cos(phi2), e2)
            q2 = _qsfn(math.sin(phi2), e, e2)
            self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        else:
            self.n = math.sin(phi1)
        self.C = m1 * m1 + self.n * q1
        q0 = _qsfn(math.sin(self.lat0), e, e2)
        self.rho0 = self.a * math.sqrt(self.C - self.n * q0) / self.n

    def fwd(self, lon, lat):
        q = _qsfn(math.sin(lat), self.e, self.e2)
        rho = self.a * math.sqrt(self.C - self.n * q) / self.n
        th = self.n * (lon - self.lon0)
        return (self.x0 + rho * math.sin(th),
                self.y0 + self.rho0 - rho * math.cos(th))

    def inv(self, x, y):
        dx = x - self.x0
        dy = self.rho0 - (y - self.y0)
        rho = math.hypot(dx, dy)
        if self.n < 0:
            rho, dx, dy = -rho, -dx, -dy
        q = (self.C - (rho * self.n / self.a) ** 2) / self.n
        lat = _phi_from_q(q, self.e, self.e2)
        lon = self.lon0 + math.atan2(dx, dy) / self.n
        return lon, lat


class _Merc(_Proj):
    """Mercator (Snyder ch. 7); Standard_Parallel_1 sets the scale.
    The Auxiliary_Sphere variant is spherical on a (web mercator)."""

    def __init__(self, crs, spherical=False):
        super().__init__(crs)
        self.spherical = spherical or self.e < 1e-10
        sp = _rad(self.p.get("standard_parallel_1", 0.0))
        if self.spherical:
            self.k = math.cos(sp)
        else:
            self.k = _msfn(math.sin(sp), math.cos(sp), self.e2) \
                if abs(sp) > 1e-12 else self.k0

    def fwd(self, lon, lat):
        ak = self.a * self.k
        x = ak * (lon - self.lon0)
        if self.spherical:
            y = ak * math.log(math.tan(math.pi / 4 + lat / 2))
        else:
            y = -ak * math.log(_tsfn(lat, math.sin(lat), self.e))
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        ak = self.a * self.k
        lon = self.lon0 + (x - self.x0) / ak
        if self.spherical:
            lat = math.pi / 2 - 2 * math.atan(math.exp(-(y - self.y0) / ak))
        else:
            lat = _phi_from_ts(math.exp(-(y - self.y0) / ak), self.e)
        return lon, lat


class _Eqc(_Proj):
    """Equidistant Cylindrical / Plate Carree (spherical on a —
    proj4 eqc behavior)."""

    def __init__(self, crs):
        super().__init__(crs)
        self.cosp1 = math.cos(_rad(self.p.get("standard_parallel_1", 0.0)))

    def fwd(self, lon, lat):
        return (self.x0 + self.a * (lon - self.lon0) * self.cosp1,
                self.y0 + self.a * (lat - self.lat0))

    def inv(self, x, y):
        return (self.lon0 + (x - self.x0) / (self.a * self.cosp1),
                self.lat0 + (y - self.y0) / self.a)


class _CEA(_Proj):
    """Cylindrical Equal Area (Snyder ch. 10, ellipsoidal); Behrmann =
    standard parallel 30."""

    def __init__(self, crs, phi_s=None):
        super().__init__(crs)
        sp = _rad(self.p.get("standard_parallel_1", 0.0)) \
            if phi_s is None else _rad(phi_s)
        self.k = _msfn(math.sin(sp), math.cos(sp), self.e2) \
            if self.e > 1e-10 else math.cos(sp)

    def fwd(self, lon, lat):
        q = _qsfn(math.sin(lat), self.e, self.e2)
        return (self.x0 + self.a * self.k * (lon - self.lon0),
                self.y0 + self.a * q / (2 * self.k))

    def inv(self, x, y):
        q = 2 * (y - self.y0) * self.k / self.a
        return (self.lon0 + (x - self.x0) / (self.a * self.k),
                _phi_from_q(q, self.e, self.e2))


class _Miller(_Proj):
    """Miller Cylindrical (spherical, Snyder ch. 11)."""

    def fwd(self, lon, lat):
        return (self.x0 + self.a * (lon - self.lon0),
                self.y0 + self.a * math.log(
                    math.tan(math.pi / 4 + 0.4 * lat)) / 0.8)

    def inv(self, x, y):
        return (self.lon0 + (x - self.x0) / self.a,
                2.5 * math.atan(math.exp(0.8 * (y - self.y0) / self.a))
                - 0.625 * math.pi)


class _Gall(_Proj):
    """Gall Stereographic (spherical)."""

    def fwd(self, lon, lat):
        return (self.x0 + self.a * (lon - self.lon0) / math.sqrt(2),
                self.y0 + self.a * (1 + math.sqrt(2) / 2)
                * math.tan(lat / 2))

    def inv(self, x, y):
        return (self.lon0 + (x - self.x0) * math.sqrt(2) / self.a,
                2 * math.atan((y - self.y0)
                              / (self.a * (1 + math.sqrt(2) / 2))))


class _Sinusoidal(_Proj):
    """Sinusoidal (Snyder ch. 30, ellipsoidal)."""

    def fwd(self, lon, lat):
        sinp = math.sin(lat)
        x = (self.a * (lon - self.lon0) * math.cos(lat)
             / math.sqrt(1 - self.e2 * sinp * sinp))
        return self.x0 + x, self.y0 + _mlfn(lat, self.e2, self.a)

    def inv(self, x, y):
        lat = _footpoint(y - self.y0, self.e2, self.a)
        sinp = math.sin(lat)
        cosp = math.cos(lat)
        if abs(cosp) < 1e-11:
            return self.lon0, lat
        lon = self.lon0 + ((x - self.x0)
                           * math.sqrt(1 - self.e2 * sinp * sinp)
                           / (self.a * cosp))
        return lon, lat


class _Mollweide(_Proj):
    """Mollweide (spherical, Snyder ch. 31)."""

    def fwd(self, lon, lat):
        th = lat
        for _ in range(15):
            d = -(th + math.sin(th) - math.pi * math.sin(lat)) \
                / (1 + math.cos(th))
            th += d
            if abs(d) < 1e-12:
                break
        th /= 2
        return (self.x0 + math.sqrt(8) / math.pi * self.a
                * (lon - self.lon0) * math.cos(th),
                self.y0 + math.sqrt(2) * self.a * math.sin(th))

    def inv(self, x, y):
        th = math.asin(max(-1.0, min(1.0, (y - self.y0)
                                     / (math.sqrt(2) * self.a))))
        lat = math.asin(max(-1.0, min(
            1.0, (2 * th + math.sin(2 * th)) / math.pi)))
        if abs(math.cos(th)) < 1e-11:
            return self.lon0, lat
        lon = self.lon0 + math.pi * (x - self.x0) \
            / (math.sqrt(8) * self.a * math.cos(th))
        return lon, lat


class _LAEA(_Proj):
    """Lambert Azimuthal Equal-Area (Snyder ch. 24, ellipsoidal via
    authalic latitude)."""

    def __init__(self, crs):
        super().__init__(crs)
        e, e2 = self.e, self.e2
        self.qp = _qsfn(1.0, e, e2)
        self.Rq = self.a * math.sqrt(self.qp / 2)
        q1 = _qsfn(math.sin(self.lat0), e, e2)
        self.beta1 = math.asin(max(-1.0, min(1.0, q1 / self.qp)))
        self.D = (self.a * _msfn(math.sin(self.lat0),
                                 math.cos(self.lat0), e2)
                  / (self.Rq * math.cos(self.beta1))) \
            if abs(math.cos(self.beta1)) > 1e-11 else 1.0

    def fwd(self, lon, lat):
        q = _qsfn(math.sin(lat), self.e, self.e2)
        beta = math.asin(max(-1.0, min(1.0, q / self.qp)))
        sb1, cb1 = math.sin(self.beta1), math.cos(self.beta1)
        sb, cb = math.sin(beta), math.cos(beta)
        dl = lon - self.lon0
        den = 1 + sb1 * sb + cb1 * cb * math.cos(dl)
        B = self.Rq * math.sqrt(2 / den)
        x = B * self.D * cb * math.sin(dl)
        y = (B / self.D) * (cb1 * sb - sb1 * cb * math.cos(dl))
        return self.x0 + x, self.y0 + y

    def inv(self, x, y):
        dx = (x - self.x0) / self.D
        dy = (y - self.y0) * self.D
        rho = math.hypot(dx, dy)
        if rho < 1e-10:
            return self.lon0, self.lat0
        ce = 2 * math.asin(max(-1.0, min(1.0, rho / (2 * self.Rq))))
        sce, cce = math.sin(ce), math.cos(ce)
        sb1, cb1 = math.sin(self.beta1), math.cos(self.beta1)
        beta = math.asin(max(-1.0, min(
            1.0, cce * sb1 + dy * sce * cb1 / rho)))
        q = self.qp * math.sin(beta)
        lat = _phi_from_q(q, self.e, self.e2)
        lon = self.lon0 + math.atan2(
            dx * sce, rho * cb1 * cce - dy * sb1 * sce)
        return lon, lat


class _Stere(_Proj):
    """Stereographic (Snyder ch. 21): ellipsoidal polar forms for the
    North/South pole variants; oblique/equatorial via conformal
    latitude (proj4 stere)."""

    def __init__(self, crs, forced_pole=None):
        super().__init__(crs)
        if forced_pole == "north":
            self.lat0 = _rad(self.p.get("standard_parallel_1", 90.0))
            self.mode = "n"
        elif forced_pole == "south":
            self.lat0 = _rad(self.p.get("standard_parallel_1", -90.0))
            self.mode = "s"
        elif abs(self.lat0 - math.pi / 2) < 1e-10:
            self.mode = "n"
        elif abs(self.lat0 + math.pi / 2) < 1e-10:
            self.mode = "s"
        else:
            self.mode = "o"
        e, e2 = self.e, self.e2
        if self.mode in "ns":
            phi_f = abs(self.lat0)
            if abs(phi_f - math.pi / 2) > 1e-10:
                # scale from the true-scale parallel
                tf = _tsfn(phi_f, math.sin(phi_f), e)
                mf = _msfn(math.sin(phi_f), math.cos(phi_f), e2)
                self.k0 = mf * math.sqrt(
                    (1 + e) ** (1 + e) * (1 - e) ** (1 - e)) / (2 * tf)
        else:
            # conformal latitude of the origin
            sinp = math.sin(self.lat0)
            self.chi0 = 2 * math.atan(
                math.tan(math.pi / 4 + self.lat0 / 2)
                * ((1 - e * sinp) / (1 + e * sinp)) ** (e / 2)) \
                - math.pi / 2
            # Snyder 21-29's m1/cos(chi1) factor: without it every
            # oblique coordinate is scaled by cos(chi1)/m1 (~0.2% at
            # mid-latitudes) and the scale at the origin is not k0.
            # 1 at the equator (m1 = cos(chi1) = 1), so the
            # equatorial aspect is unchanged.
            m1 = _msfn(sinp, math.cos(self.lat0), e2)
            self.m1_factor = m1 / math.cos(self.chi0)

    def fwd(self, lon, lat):
        a, e, k0 = self.a, self.e, self.k0
        if self.mode in "ns":
            # polar aspects (Snyder 21-33/34): longitude is NOT
            # mirrored for the south aspect — only latitude flips and
            # the northing term changes sign (E = FE + rho sin(dl) in
            # BOTH aspects; EPSG Petrels 1972 vector pins this)
            sign = 1.0 if self.mode == "n" else -1.0
            t = _tsfn(sign * lat, math.sin(sign * lat), e)
            rho = 2 * a * k0 * t / math.sqrt(
                (1 + e) ** (1 + e) * (1 - e) ** (1 - e))
            dl = lon - self.lon0
            return (self.x0 + rho * math.sin(dl),
                    self.y0 - sign * rho * math.cos(dl))
        sinp = math.sin(lat)
        chi = 2 * math.atan(math.tan(math.pi / 4 + lat / 2)
                            * ((1 - e * sinp) / (1 + e * sinp)) ** (e / 2)) \
            - math.pi / 2
        sc0, cc0 = math.sin(self.chi0), math.cos(self.chi0)
        sc, cc = math.sin(chi), math.cos(chi)
        dl = lon - self.lon0
        A = 2 * a * k0 * self.m1_factor \
            / (1 + sc0 * sc + cc0 * cc * math.cos(dl))
        return (self.x0 + A * cc * math.sin(dl),
                self.y0 + A * (cc0 * sc - sc0 * cc * math.cos(dl)))

    def inv(self, x, y):
        a, e, k0 = self.a, self.e, self.k0
        dx, dy = x - self.x0, y - self.y0
        if self.mode in "ns":
            sign = 1.0 if self.mode == "n" else -1.0
            rho = math.hypot(dx, dy)
            t = rho * math.sqrt(
                (1 + e) ** (1 + e) * (1 - e) ** (1 - e)) / (2 * a * k0)
            lat = sign * _phi_from_ts(t, e)
            lon = self.lon0 + math.atan2(dx, -sign * dy)
            return lon, lat
        rho = math.hypot(dx, dy)
        ce = 2 * math.atan2(rho, 2 * a * k0 * self.m1_factor)
        sce, cce = math.sin(ce), math.cos(ce)
        sc0, cc0 = math.sin(self.chi0), math.cos(self.chi0)
        if rho < 1e-10:
            chi = self.chi0
            lon = self.lon0
        else:
            chi = math.asin(max(-1.0, min(
                1.0, cce * sc0 + dy * sce * cc0 / rho)))
            lon = self.lon0 + math.atan2(
                dx * sce, rho * cc0 * cce - dy * sc0 * sce)
        # conformal -> geodetic latitude iteration
        lat = chi
        for _ in range(15):
            sinp = math.sin(lat)
            new = 2 * math.atan(
                math.tan(math.pi / 4 + chi / 2)
                * ((1 + e * sinp) / (1 - e * sinp)) ** (e / 2)) \
                - math.pi / 2
            if abs(new - lat) < 1e-12:
                break
            lat = new
        return lon, lat


class _Sterea(_Proj):
    """Oblique ('Double') Stereographic, EPSG method 9809 — the
    Gauss-Schreiber double projection (ellipsoid -> conformal sphere ->
    spherical stereographic), proj4's ``sterea``. ESRI names it
    Double_Stereographic (Netherlands RD New, New Brunswick). NOT the
    same projection as Snyder's single-step ellipsoidal ``_Stere`` —
    the two diverge by meters growing with distance from the origin.
    Constants follow the published EPSG Guidance Note 7-2 formulas
    (equivalently PROJ gauss.c/sterea.c)."""

    def __init__(self, crs: dict):
        super().__init__(crs)
        e, es = self.e, self.e2
        sphi, cphi = math.sin(self.lat0), math.cos(self.lat0)
        cphi2 = cphi * cphi
        # conformal-sphere radius (units of a) and Gauss constants
        self.rc = math.sqrt(1 - es) / (1 - es * sphi * sphi)
        self.C = math.sqrt(1 + es * cphi2 * cphi2 / (1 - es))
        self.chi0 = math.asin(sphi / self.C)
        self.ratexp = 0.5 * self.C * e
        self.K = (math.tan(0.5 * self.chi0 + math.pi / 4)
                  / (math.tan(0.5 * self.lat0 + math.pi / 4) ** self.C
                     * self._srat(e * sphi, self.ratexp)))
        self.sinc0 = math.sin(self.chi0)
        self.cosc0 = math.cos(self.chi0)
        self.R2 = 2.0 * self.rc

    @staticmethod
    def _srat(esinp: float, expo: float) -> float:
        return ((1.0 - esinp) / (1.0 + esinp)) ** expo

    def _gauss_fwd(self, lon: float, lat: float) -> tuple[float, float]:
        chi = 2 * math.atan(
            self.K * math.tan(0.5 * lat + math.pi / 4) ** self.C
            * self._srat(self.e * math.sin(lat), self.ratexp)) \
            - math.pi / 2
        return self.C * (lon - self.lon0), chi

    def fwd(self, lon, lat):
        dl, chi = self._gauss_fwd(lon, lat)
        sinc, cosc = math.sin(chi), math.cos(chi)
        cosl = math.cos(dl)
        k = self.a * self.k0 * self.R2 \
            / (1 + self.sinc0 * sinc + self.cosc0 * cosc * cosl)
        return (self.x0 + k * cosc * math.sin(dl),
                self.y0 + k * (self.cosc0 * sinc
                               - self.sinc0 * cosc * cosl))

    def inv(self, x, y):
        dx = (x - self.x0) / (self.a * self.k0)
        dy = (y - self.y0) / (self.a * self.k0)
        rho = math.hypot(dx, dy)
        if rho < 1e-12:
            chi = self.chi0
            dl = 0.0
        else:
            c = 2 * math.atan2(rho, self.R2)
            sinc, cosc = math.sin(c), math.cos(c)
            chi = math.asin(max(-1.0, min(
                1.0, cosc * self.sinc0 + dy * sinc * self.cosc0 / rho)))
            dl = math.atan2(dx * sinc,
                            rho * self.cosc0 * cosc
                            - dy * self.sinc0 * sinc)
        lon = dl / self.C + self.lon0
        # inverse Gauss: iterate geodetic latitude from conformal
        num = (math.tan(0.5 * chi + math.pi / 4) / self.K) ** (1.0 / self.C)
        lat = chi
        for _ in range(20):
            new = 2 * math.atan(
                num * self._srat(self.e * math.sin(lat), -0.5 * self.e)) \
                - math.pi / 2
            if abs(new - lat) < 1e-14:
                lat = new
                break
            lat = new
        return lon, lat


class _Cass(_Proj):
    """Cassini-Soldner (Snyder ch. 13, ellipsoidal series)."""

    def fwd(self, lon, lat):
        a, e2 = self.a, self.e2
        sinp, cosp = math.sin(lat), math.cos(lat)
        N = a / math.sqrt(1 - e2 * sinp * sinp)
        T = (sinp / cosp) ** 2 if cosp else 0.0
        A = (lon - self.lon0) * cosp
        C = e2 * cosp * cosp / (1 - e2)
        x = N * (A - T * A ** 3 / 6 - (8 - T + 8 * C) * T * A ** 5 / 120)
        M = _mlfn(lat, e2, a) - _mlfn(self.lat0, e2, a)
        y = M + N * (sinp / cosp if cosp else 0.0) \
            * (A * A / 2 + (5 - T + 6 * C) * A ** 4 / 24)
        return self.x0 + x, self.y0 + y

    def inv(self, x, y):
        a, e2 = self.a, self.e2
        M = _mlfn(self.lat0, e2, a) + (y - self.y0)
        phi1 = _footpoint(M, e2, a)
        if abs(abs(phi1) - math.pi / 2) < 1e-11:
            return self.lon0, phi1
        sin1, cos1 = math.sin(phi1), math.cos(phi1)
        T1 = (sin1 / cos1) ** 2
        N1 = a / math.sqrt(1 - e2 * sin1 * sin1)
        R1 = a * (1 - e2) / (1 - e2 * sin1 * sin1) ** 1.5
        D = (x - self.x0) / N1
        lat = phi1 - (N1 * sin1 / cos1 / R1) \
            * (D * D / 2 - (1 + 3 * T1) * D ** 4 / 24)
        lon = self.lon0 + (D - T1 * D ** 3 / 3
                           + (1 + 3 * T1) * T1 * D ** 5 / 15) / cos1
        return lon, lat


class _Poly(_Proj):
    """American Polyconic (Snyder ch. 18)."""

    def fwd(self, lon, lat):
        a, e2 = self.a, self.e2
        if abs(lat) < 1e-10:
            return (self.x0 + a * (lon - self.lon0),
                    self.y0 - _mlfn(self.lat0, e2, a))
        sinp = math.sin(lat)
        N = a / math.sqrt(1 - e2 * sinp * sinp)
        E = (lon - self.lon0) * sinp
        cot = math.cos(lat) / sinp
        x = N * cot * math.sin(E)
        y = (_mlfn(lat, e2, a) - _mlfn(self.lat0, e2, a)
             + N * cot * (1 - math.cos(E)))
        return self.x0 + x, self.y0 + y

    def inv(self, x, y):
        a, e2 = self.a, self.e2
        dx = x - self.x0
        dy = y - self.y0
        if abs(_mlfn(self.lat0, e2, a) + dy) < 1e-7 * a:
            return self.lon0 + dx / a, 0.0
        # seed from the footpoint, then generic Newton on the forward
        # (Snyder's 18-18 series is ill-conditioned near the equator)
        lat = _footpoint(_mlfn(self.lat0, e2, a) + dy, e2, a)
        lon = self.lon0 + dx / (a * max(math.cos(lat), 1e-8))
        return _newton_inverse(self, x, y, lon, lat)


class _Eqdc(_Proj):
    """Equidistant Conic (Snyder ch. 16, ellipsoidal)."""

    def __init__(self, crs):
        super().__init__(crs)
        p, a, e2 = self.p, self.a, self.e2
        phi1 = _rad(p.get("standard_parallel_1", 0.0))
        phi2 = _rad(p.get("standard_parallel_2",
                          p.get("standard_parallel_1", 0.0)))
        m1 = _msfn(math.sin(phi1), math.cos(phi1), e2)
        M1 = _mlfn(phi1, e2, a) / a
        if abs(phi1 - phi2) > 1e-10:
            m2 = _msfn(math.sin(phi2), math.cos(phi2), e2)
            M2 = _mlfn(phi2, e2, a) / a
            self.n = (m1 - m2) / (M2 - M1)
        else:
            self.n = math.sin(phi1)
        self.G = m1 / self.n + M1
        self.rho0 = a * (self.G - _mlfn(self.lat0, e2, a) / a)

    def fwd(self, lon, lat):
        rho = self.a * (self.G - _mlfn(lat, self.e2, self.a) / self.a)
        th = self.n * (lon - self.lon0)
        return (self.x0 + rho * math.sin(th),
                self.y0 + self.rho0 - rho * math.cos(th))

    def inv(self, x, y):
        dx = x - self.x0
        dy = self.rho0 - (y - self.y0)
        rho = math.hypot(dx, dy)
        if self.n < 0:
            rho, dx, dy = -rho, -dx, -dy
        M = self.a * (self.G - rho / self.a)
        lat = _footpoint(M, self.e2, self.a)
        lon = self.lon0 + math.atan2(dx, dy) / self.n
        return lon, lat


class _AEQD(_Proj):
    """Azimuthal Equidistant (spherical form, Snyder ch. 25 — proj4's
    ellipsoidal refinement differs by < the corner-fold tolerance for
    the regional CRS that use it)."""

    def fwd(self, lon, lat):
        s0, c0 = math.sin(self.lat0), math.cos(self.lat0)
        s, c = math.sin(lat), math.cos(lat)
        dl = lon - self.lon0
        cosc = s0 * s + c0 * c * math.cos(dl)
        cosc = max(-1.0, min(1.0, cosc))
        cang = math.acos(cosc)
        k = 1.0 if cang < 1e-10 else cang / math.sin(cang)
        return (self.x0 + self.a * k * c * math.sin(dl),
                self.y0 + self.a * k * (c0 * s - s0 * c * math.cos(dl)))

    def inv(self, x, y):
        dx, dy = (x - self.x0) / self.a, (y - self.y0) / self.a
        rho = math.hypot(dx, dy)
        if rho < 1e-10:
            return self.lon0, self.lat0
        cang = rho
        s0, c0 = math.sin(self.lat0), math.cos(self.lat0)
        sc, cc = math.sin(cang), math.cos(cang)
        lat = math.asin(max(-1.0, min(1.0, cc * s0 + dy * sc * c0 / rho)))
        lon = self.lon0 + math.atan2(
            dx * sc, rho * c0 * cc - dy * s0 * sc)
        return lon, lat


class _Ortho(_Proj):
    """Orthographic (spherical, Snyder ch. 20)."""

    def fwd(self, lon, lat):
        s0, c0 = math.sin(self.lat0), math.cos(self.lat0)
        s, c = math.sin(lat), math.cos(lat)
        dl = lon - self.lon0
        return (self.x0 + self.a * c * math.sin(dl),
                self.y0 + self.a * (c0 * s - s0 * c * math.cos(dl)))

    def inv(self, x, y):
        dx, dy = (x - self.x0) / self.a, (y - self.y0) / self.a
        rho = math.hypot(dx, dy)
        if rho < 1e-10:
            return self.lon0, self.lat0
        cang = math.asin(max(-1.0, min(1.0, rho)))
        sc, cc = math.sin(cang), math.cos(cang)
        s0, c0 = math.sin(self.lat0), math.cos(self.lat0)
        lat = math.asin(max(-1.0, min(1.0, cc * s0 + dy * sc * c0 / rho)))
        lon = self.lon0 + math.atan2(
            dx * sc, rho * c0 * cc - dy * s0 * sc)
        return lon, lat


class _Bonne(_Proj):
    """Bonne (Snyder ch. 19, ellipsoidal)."""

    def __init__(self, crs):
        super().__init__(crs)
        self.phi1 = _rad(self.p.get("standard_parallel_1",
                                    self.p.get("latitude_of_origin", 45.0)))
        a, e2 = self.a, self.e2
        self.m1 = _msfn(math.sin(self.phi1), math.cos(self.phi1), e2)
        self.M1 = _mlfn(self.phi1, e2, a)

    def fwd(self, lon, lat):
        a, e2 = self.a, self.e2
        m = _msfn(math.sin(lat), math.cos(lat), e2)
        M = _mlfn(lat, e2, a)
        rho = a * self.m1 / math.sin(self.phi1) + self.M1 - M
        E = a * m * (lon - self.lon0) / rho
        return (self.x0 + rho * math.sin(E),
                self.y0 + a * self.m1 / math.sin(self.phi1)
                - rho * math.cos(E))

    def inv(self, x, y):
        a, e2 = self.a, self.e2
        am1 = a * self.m1 / math.sin(self.phi1)
        dx = x - self.x0
        dy = am1 - (y - self.y0)
        rho = math.copysign(math.hypot(dx, dy), self.phi1)
        M = am1 + self.M1 - rho
        lat = _footpoint(M, e2, a)
        m = _msfn(math.sin(lat), math.cos(lat), e2)
        if abs(m) < 1e-11:
            return self.lon0, lat
        lon = self.lon0 + rho * math.atan2(
            dx, math.copysign(dy, self.phi1)) / (a * m)
        return lon, lat


class _Omerc(_Proj):
    """Hotine Oblique Mercator (Snyder ch. 9): Azimuth_Natural_Origin
    (variant A), Azimuth_Center (variant B, u-offset at the projection
    center), and Rectified_Skew_Orthomorphic (explicit rectification
    angle via XY_Plane_Rotation)."""

    def __init__(self, crs, centered=False):
        super().__init__(crs)
        p, a, e, e2 = self.p, self.a, self.e, self.e2
        self.alpha = _rad(p.get("azimuth", 0.0))
        phi0 = self.lat0
        sin0, cos0 = math.sin(phi0), math.cos(phi0)
        self.B = math.sqrt(1 + e2 * cos0 ** 4 / (1 - e2))
        self.A = (a * self.B * self.k0 * math.sqrt(1 - e2)
                  / (1 - e2 * sin0 * sin0))
        t0 = _tsfn(phi0, sin0, e)
        D = self.B * math.sqrt(1 - e2) / (cos0 * math.sqrt(
            1 - e2 * sin0 * sin0))
        D2 = max(D * D, 1.0)
        F = D + math.copysign(math.sqrt(D2 - 1), phi0)
        self.E = F * t0 ** self.B
        G = (F - 1.0 / F) / 2
        self.gamma0 = math.asin(max(-1.0, min(
            1.0, math.sin(self.alpha) / D)))
        self.lam0 = self.lon0 - math.asin(max(-1.0, min(
            1.0, G * math.tan(self.gamma0)))) / self.B
        # rectification angle: RSO carries it explicitly; otherwise γ0
        self.gammac = _rad(p["xy_plane_rotation"]) \
            if "xy_plane_rotation" in p else self.gamma0
        self.u0 = 0.0
        if centered:
            self.u0 = math.copysign(
                (self.A / self.B) * math.atan2(
                    math.sqrt(D2 - 1), math.cos(self.alpha)), phi0)

    def fwd(self, lon, lat):
        B, A, E = self.B, self.A, self.E
        t = _tsfn(lat, math.sin(lat), self.e)
        Q = E / t ** B
        S = (Q - 1.0 / Q) / 2
        T = (Q + 1.0 / Q) / 2
        dl = lon - self.lam0
        V = math.sin(B * dl)
        U = (-V * math.cos(self.gamma0) + S * math.sin(self.gamma0)) / T
        v = A * math.log((1 - U) / (1 + U)) / (2 * B)
        u = (A / B) * math.atan2(
            S * math.cos(self.gamma0) + V * math.sin(self.gamma0),
            math.cos(B * dl)) - self.u0
        cg, sg = math.cos(self.gammac), math.sin(self.gammac)
        return (self.x0 + v * cg + u * sg, self.y0 + u * cg - v * sg)

    def inv(self, x, y):
        B, A, E = self.B, self.A, self.E
        dx, dy = x - self.x0, y - self.y0
        cg, sg = math.cos(self.gammac), math.sin(self.gammac)
        v = dx * cg - dy * sg
        u = dy * cg + dx * sg + self.u0
        Q = math.exp(-B * v / A)
        S = (Q - 1.0 / Q) / 2
        T = (Q + 1.0 / Q) / 2
        V = math.sin(B * u / A)
        U = (V * math.cos(self.gamma0) + S * math.sin(self.gamma0)) / T
        t = (E / math.sqrt((1 + U) / (1 - U))) ** (1.0 / B)
        lat = _phi_from_ts(t, self.e)
        lon = self.lam0 - math.atan2(
            S * math.cos(self.gamma0) - V * math.sin(self.gamma0),
            math.cos(B * u / A)) / B
        return lon, lat


class _Krovak(_Proj):
    """Krovak oblique conformal conic (EPSG method 9819); handles the
    ESRI x_scale / y_scale / xy_plane_rotation axis conventions."""

    def __init__(self, crs):
        super().__init__(crs)
        p, a, e, e2 = self.p, self.a, self.e, self.e2
        self.azim = _rad(p.get("azimuth", 30.28813972222222))
        self.sp = _rad(p.get("pseudo_standard_parallel_1", 78.5))
        self.xs = p.get("x_scale", 1.0)
        self.ys = p.get("y_scale", 1.0)
        self.rot = _rad(p.get("xy_plane_rotation", 0.0))
        phi0 = self.lat0
        sin0, cos0 = math.sin(phi0), math.cos(phi0)
        self.A_ = a * math.sqrt(1 - e2) / (1 - e2 * sin0 * sin0)
        self.B = math.sqrt(1 + e2 * cos0 ** 4 / (1 - e2))
        self.g0 = math.asin(sin0 / self.B)
        self.t0 = (math.tan(math.pi / 4 + self.g0 / 2)
                   * ((1 + e * sin0) / (1 - e * sin0)) ** (e * self.B / 2)
                   / math.tan(math.pi / 4 + phi0 / 2) ** self.B)
        self.n = math.sin(self.sp)
        self.r0 = self.k0 * self.A_ / math.tan(self.sp)

    def _fwd_core(self, lon, lat):
        e, B = self.e, self.B
        sinp = math.sin(lat)
        U = 2 * (math.atan(
            self.t0 * math.tan(lat / 2 + math.pi / 4) ** B
            / ((1 + e * sinp) / (1 - e * sinp)) ** (e * B / 2))
            - math.pi / 4)
        dv = B * (self.lon0 - lon)
        sa, ca = math.sin(self.azim), math.cos(self.azim)
        S = math.asin(max(-1.0, min(
            1.0, ca * math.sin(U) + sa * math.cos(U) * math.cos(dv))))
        D = math.asin(max(-1.0, min(
            1.0, math.cos(U) * math.sin(dv) / math.cos(S))))
        th = self.n * D
        r = (self.r0 * math.tan(math.pi / 4 + self.sp / 2) ** self.n
             / math.tan(S / 2 + math.pi / 4) ** self.n)
        # EPSG axes: southing (X) / westing (Y)
        return r * math.cos(th), r * math.sin(th)

    def fwd(self, lon, lat):
        Xk, Yk = self._fwd_core(lon, lat)
        # ESRI axis handling over the EPSG plane (Xk = southing, Yk =
        # westing, both positive in-territory): rotate by
        # xy_plane_rotation, then per-axis scale. Identity params
        # (2065/5513) keep EPSG's positive southing/westing; the
        # East-North variants (5221/5514: xs=-1, rot=90) yield
        # x = -westing (easting), y = -southing (northing), the
        # negative-valued EPSG 5514 convention.
        cr, sr = math.cos(self.rot), math.sin(self.rot)
        return (self.x0 + self.xs * (Xk * cr + Yk * sr),
                self.y0 + self.ys * (-Xk * sr + Yk * cr))

    def inv(self, x, y):
        cr, sr = math.cos(self.rot), math.sin(self.rot)
        xr = (x - self.x0) / self.xs
        yr = (y - self.y0) / self.ys
        Xk = cr * xr - sr * yr
        Yk = sr * xr + cr * yr
        Xp = Xk
        Yp = Yk
        e, B = self.e, self.B
        r = math.hypot(Xp, Yp)
        th = math.atan2(Yp, Xp)
        D = th / math.sin(self.sp)
        S = 2 * (math.atan(
            (self.r0 / r) ** (1 / self.n)
            * math.tan(math.pi / 4 + self.sp / 2)) - math.pi / 4)
        sa, ca = math.sin(self.azim), math.cos(self.azim)
        U = math.asin(max(-1.0, min(
            1.0, ca * math.sin(S) - sa * math.cos(S) * math.cos(D))))
        dv = math.asin(max(-1.0, min(
            1.0, math.cos(S) * math.sin(D) / math.cos(U))))
        lon = self.lon0 - dv / B
        lat = U
        for _ in range(20):
            sinp = math.sin(lat)
            new = 2 * (math.atan(
                self.t0 ** (-1 / B)
                * math.tan(U / 2 + math.pi / 4) ** (1 / B)
                * ((1 + e * sinp) / (1 - e * sinp)) ** (e / 2))
                - math.pi / 4)
            if abs(new - lat) < 1e-12:
                break
            lat = new
        return lon, lat


class _SphericalFwd(_Proj):
    """Base for world pseudocylindrical/lenticular projections defined
    on the sphere (radius a): subclasses implement only the forward;
    the inverse is the generic numeric Newton on it (these maps are
    smooth away from the poles, where no CRS extent corner lives)."""

    def inv(self, x, y):
        lat0 = (y - self.y0) / self.a
        lat0 = max(-1.4, min(1.4, lat0))
        lon0 = self.lon0 + (x - self.x0) / (self.a * max(
            math.cos(lat0), 0.3))
        return _newton_inverse(self, x, y, lon0, lat0)


class _EckertI(_SphericalFwd):
    def fwd(self, lon, lat):
        c = math.sqrt(8.0 / (3.0 * math.pi))
        return (self.x0 + c * self.a * (lon - self.lon0)
                * (1 - abs(lat) / math.pi),
                self.y0 + c * self.a * lat)


class _EckertII(_SphericalFwd):
    def fwd(self, lon, lat):
        s = math.sqrt(4.0 - 3.0 * math.sin(abs(lat)))
        x = 2.0 * self.a * (lon - self.lon0) * s / math.sqrt(6.0 * math.pi)
        y = math.copysign(
            math.sqrt(2.0 * math.pi / 3.0) * self.a * (2.0 - s), lat)
        return self.x0 + x, self.y0 + y


class _EckertIII(_SphericalFwd):
    def fwd(self, lon, lat):
        k = math.sqrt(math.pi * (4.0 + math.pi))
        x = (2.0 / k) * self.a * (lon - self.lon0) \
            * (1.0 + math.sqrt(max(0.0, 1.0 - (2.0 * lat / math.pi) ** 2)))
        y = (4.0 / k) * self.a * lat
        return self.x0 + x, self.y0 + y


class _EckertIV(_SphericalFwd):
    def fwd(self, lon, lat):
        cp = (2.0 + math.pi / 2.0) * math.sin(lat)
        th = lat / 2.0
        for _ in range(25):
            d = -(th + math.sin(th) * math.cos(th) + 2.0 * math.sin(th)
                  - cp) / (2.0 * math.cos(th) * (1.0 + math.cos(th)))
            th += d
            if abs(d) < 1e-12:
                break
        k = math.sqrt(math.pi * (4.0 + math.pi))
        x = (2.0 / k) * self.a * (lon - self.lon0) * (1.0 + math.cos(th))
        y = 2.0 * math.sqrt(math.pi / (4.0 + math.pi)) * self.a \
            * math.sin(th)
        return self.x0 + x, self.y0 + y


class _EckertV(_SphericalFwd):
    def fwd(self, lon, lat):
        k = math.sqrt(2.0 + math.pi)
        return (self.x0 + self.a * (lon - self.lon0)
                * (1.0 + math.cos(lat)) / k,
                self.y0 + 2.0 * self.a * lat / k)


class _EckertVI(_SphericalFwd):
    def fwd(self, lon, lat):
        cp = (1.0 + math.pi / 2.0) * math.sin(lat)
        th = lat
        for _ in range(25):
            d = -(th + math.sin(th) - cp) / (1.0 + math.cos(th))
            th += d
            if abs(d) < 1e-12:
                break
        k = math.sqrt(2.0 + math.pi)
        return (self.x0 + self.a * (lon - self.lon0)
                * (1.0 + math.cos(th)) / k,
                self.y0 + 2.0 * self.a * th / k)


class _WinkelI(_SphericalFwd):
    def __init__(self, crs):
        super().__init__(crs)
        self.cosp1 = math.cos(_rad(self.p.get("standard_parallel_1",
                                              50.467)))

    def fwd(self, lon, lat):
        return (self.x0 + self.a * (lon - self.lon0)
                * (self.cosp1 + math.cos(lat)) / 2.0,
                self.y0 + self.a * lat)


class _Aitoff(_SphericalFwd):
    def fwd(self, lon, lat):
        dl = (lon - self.lon0) / 2.0
        d = math.acos(max(-1.0, min(1.0, math.cos(lat) * math.cos(dl))))
        if abs(d) < 1e-12:
            return self.x0, self.y0
        c = d / math.sin(d)
        return (self.x0 + 2.0 * self.a * c * math.cos(lat)
                * math.sin(dl),
                self.y0 + self.a * c * math.sin(lat))


class _WinkelTripel(_SphericalFwd):
    """Arithmetic mean of Aitoff and equirectangular(phi1)."""

    def __init__(self, crs):
        super().__init__(crs)
        self.cosp1 = math.cos(_rad(self.p.get(
            "standard_parallel_1", math.degrees(math.acos(2 / math.pi)))))

    def fwd(self, lon, lat):
        dl = (lon - self.lon0) / 2.0
        d = math.acos(max(-1.0, min(1.0, math.cos(lat) * math.cos(dl))))
        c = 1.0 if abs(d) < 1e-12 else d / math.sin(d)
        xa = 2.0 * c * math.cos(lat) * math.sin(dl)
        ya = c * math.sin(lat)
        xe = (lon - self.lon0) * self.cosp1
        ye = lat
        return (self.x0 + self.a * (xa + xe) / 2.0,
                self.y0 + self.a * (ya + ye) / 2.0)


class _Hammer(_SphericalFwd):
    def fwd(self, lon, lat):
        dl = (lon - self.lon0) / 2.0
        den = math.sqrt(1.0 + math.cos(lat) * math.cos(dl))
        return (self.x0 + 2.0 * math.sqrt(2.0) * self.a
                * math.cos(lat) * math.sin(dl) / den,
                self.y0 + math.sqrt(2.0) * self.a * math.sin(lat) / den)


class _QuarticAuthalic(_SphericalFwd):
    def fwd(self, lon, lat):
        return (self.x0 + self.a * (lon - self.lon0) * math.cos(lat)
                / math.cos(lat / 2.0),
                self.y0 + 2.0 * self.a * math.sin(lat / 2.0))


class _CrasterParabolic(_SphericalFwd):
    def fwd(self, lon, lat):
        return (self.x0 + math.sqrt(3.0 / math.pi) * self.a
                * (lon - self.lon0) * (2.0 * math.cos(2.0 * lat / 3.0)
                                       - 1.0),
                self.y0 + math.sqrt(3.0 * math.pi) * self.a
                * math.sin(lat / 3.0))


class _FlatPolarQuartic(_SphericalFwd):
    """McBryde-Thomas flat-polar quartic (Snyder appendix)."""

    def fwd(self, lon, lat):
        cp = (1.0 + math.sqrt(2.0) / 2.0) * math.sin(lat)
        th = lat
        for _ in range(25):
            d = -(math.sin(th / 2.0) + math.sin(th) - cp) \
                / (0.5 * math.cos(th / 2.0) + math.cos(th))
            th += d
            if abs(d) < 1e-12:
                break
        x = self.a * (lon - self.lon0) \
            * (1.0 + 2.0 * math.cos(th) / math.cos(th / 2.0)) \
            / math.sqrt(3.0 * math.sqrt(2.0) + 6.0)
        y = 2.0 * math.sqrt(3.0) * self.a * math.sin(th / 2.0) \
            / math.sqrt(2.0 + math.sqrt(2.0))
        return self.x0 + x, self.y0 + y


class _VNSP(_Proj):
    """Vertical Near-Side Perspective (spherical, Snyder ch. 23):
    view from height h above the center; only the near hemisphere cap
    with cos(c) > 1/P is visible."""

    def __init__(self, crs):
        super().__init__(crs)
        self.P = 1.0 + self.p.get("height", 35_800_000.0) / self.a

    def fwd(self, lon, lat):
        s0, c0 = math.sin(self.lat0), math.cos(self.lat0)
        s, c = math.sin(lat), math.cos(lat)
        dl = lon - self.lon0
        cosc = s0 * s + c0 * c * math.cos(dl)
        if cosc < 1.0 / self.P:
            raise ValueError("point beyond the visible perspective cap")
        k = (self.P - 1.0) / (self.P - cosc)
        return (self.x0 + self.a * k * c * math.sin(dl),
                self.y0 + self.a * k * (c0 * s - s0 * c * math.cos(dl)))

    def inv(self, x, y):
        dx = (x - self.x0) / self.a
        dy = (y - self.y0) / self.a
        if math.hypot(dx, dy) < 1e-12:
            return self.lon0, self.lat0
        # generic Newton on the forward, seeded by the small-angle
        # (k ~ 1) linearization around the view center
        lat0 = max(-1.4, min(1.4, self.lat0 + dy))
        lon0 = self.lon0 + dx / max(math.cos(lat0), 0.3)
        return _newton_inverse(self, x, y, lon0, lat0)


class _Gnomonic(_Proj):
    """Gnomonic (spherical, Snyder ch. 22)."""

    def fwd(self, lon, lat):
        s0, c0 = math.sin(self.lat0), math.cos(self.lat0)
        s, c = math.sin(lat), math.cos(lat)
        dl = lon - self.lon0
        cosc = s0 * s + c0 * c * math.cos(dl)
        if cosc <= 1e-10:
            # at/beyond the horizon the projection is undefined (and
            # past it the point would silently mirror)
            raise ValueError("point at or beyond the gnomonic horizon")
        k = 1.0 / cosc
        return (self.x0 + self.a * k * c * math.sin(dl),
                self.y0 + self.a * k * (c0 * s - s0 * c * math.cos(dl)))

    def inv(self, x, y):
        dx, dy = (x - self.x0) / self.a, (y - self.y0) / self.a
        rho = math.hypot(dx, dy)
        if rho < 1e-10:
            return self.lon0, self.lat0
        cang = math.atan(rho)
        sc, cc = math.sin(cang), math.cos(cang)
        s0, c0 = math.sin(self.lat0), math.cos(self.lat0)
        lat = math.asin(max(-1.0, min(1.0, cc * s0 + dy * sc * c0 / rho)))
        lon = self.lon0 + math.atan2(
            dx * sc, rho * c0 * cc - dy * s0 * sc)
        return lon, lat


class _VanDerGrintenI(_SphericalFwd):
    """Van der Grinten I (spherical, Snyder ch. 33, eqs 33-1..33-16):
    the whole world in a circle of radius pi*a. Equator maps to
    y = 0 / x = a*dlam and the central meridian to x = 0 (both pinned
    in tests); elsewhere the published circular-arc construction."""

    def fwd(self, lon, lat):
        # wrap into [-pi, pi]: A(dl) = A(pi^2/dl) makes the raw form
        # non-injective past the antimeridian (proj4js adjlon parity)
        dl = math.remainder(lon - self.lon0, 2.0 * math.pi)
        if abs(lat) < 1e-12:
            return self.x0 + self.a * dl, self.y0
        theta = math.asin(min(1.0, abs(2.0 * lat / math.pi)))
        if abs(dl) < 1e-12 or abs(abs(lat) - math.pi / 2) < 1e-12:
            return (self.x0,
                    self.y0 + math.copysign(
                        math.pi * self.a * math.tan(theta / 2.0), lat))
        A = 0.5 * abs(math.pi / dl - dl / math.pi)
        st, ct = math.sin(theta), math.cos(theta)
        G = ct / (st + ct - 1.0)
        P = G * (2.0 / st - 1.0)
        Q = A * A + G
        p2a2 = P * P + A * A
        gpp = G - P * P
        x = (math.pi * self.a
             * (A * gpp + math.sqrt(max(0.0, A * A * gpp * gpp
                                        - p2a2 * (G * G - P * P))))
             / p2a2)
        y = (math.pi * self.a
             * (P * Q - A * math.sqrt(max(0.0, (A * A + 1.0) * p2a2
                                          - Q * Q)))
             / p2a2)
        return (self.x0 + math.copysign(x, dl),
                self.y0 + math.copysign(y, lat))

    def inv(self, x, y):
        # closed form, Snyder eqs 33-17..33-26 (the generic Newton
        # diverges in the strongly compressed outer ring)
        X = (x - self.x0) / (math.pi * self.a)
        Y = (y - self.y0) / (math.pi * self.a)
        if abs(Y) < 1e-12:
            return self.lon0 + (x - self.x0) / self.a, 0.0
        if abs(X) < 1e-12:
            theta = 2.0 * math.atan(Y)
            return self.lon0, math.pi / 2.0 * math.sin(theta)
        x2y2 = X * X + Y * Y
        c1 = -abs(Y) * (1.0 + x2y2)
        c2 = c1 - 2.0 * Y * Y + X * X
        c3 = -2.0 * c1 + 1.0 + 2.0 * Y * Y + x2y2 * x2y2
        d = (Y * Y / c3
             + (2.0 * c2 ** 3 / c3 ** 3
                - 9.0 * c1 * c2 / (c3 * c3)) / 27.0)
        a1 = (c1 - c2 * c2 / (3.0 * c3)) / c3
        m1 = 2.0 * math.sqrt(max(0.0, -a1 / 3.0))
        arg = 3.0 * d / (a1 * m1) if a1 * m1 != 0.0 else 0.0
        th1 = math.acos(max(-1.0, min(1.0, arg))) / 3.0
        lat = math.copysign(
            math.pi * (-m1 * math.cos(th1 + math.pi / 3.0)
                       - c2 / (3.0 * c3)), Y)
        lam = (math.pi
               * (x2y2 - 1.0
                  + math.sqrt(max(0.0, 1.0 + 2.0 * (X * X - Y * Y)
                                  + x2y2 * x2y2)))
               / (2.0 * X))
        return self.lon0 + lam, lat


class _Times(_SphericalFwd):
    """Times (Moir 1965, The Times Atlas; spherical): a Gall
    Stereographic variant. x = dlam*(0.74482 - 0.34588*sin^2(pi/4 *
    tan(phi/2))), y = (1 + sqrt(2)/2)*tan(phi/2) — the published
    constants (1.70711 = 1 + 1/sqrt(2))."""

    def fwd(self, lon, lat):
        t = math.tan(lat / 2.0)
        s = math.sin(math.pi / 4.0 * t)
        return (self.x0 + self.a * (lon - self.lon0)
                * (0.74482 - 0.34588 * s * s),
                self.y0 + self.a * 1.70711 * t)


class _WinkelII(_SphericalFwd):
    """Winkel II (spherical): arithmetic mean of the equirectangular
    (at standard_parallel_1) and a Mollweide-style auxiliary angle —
    x = dlam/2 (cos th + cos phi1), y = pi/4 (sin th + 2 phi/pi) with
    th + sin th = pi sin phi (same fixpoint family as Mollweide)."""

    def __init__(self, crs):
        super().__init__(crs)
        self.cosp1 = math.cos(_rad(self.p.get("standard_parallel_1",
                                              50.467)))

    def fwd(self, lon, lat):
        yy = lat * 2.0 / math.pi
        k = math.pi * math.sin(lat)
        th = lat * 1.8137993642342178
        for _ in range(15):
            denom = 1.0 + math.cos(th)
            if denom < 1e-14:
                break
            v = (th + math.sin(th) - k) / denom
            th -= v
            if abs(v) < 1e-12:
                break
        th *= 0.5
        return (self.x0 + 0.5 * self.a * (lon - self.lon0)
                * (math.cos(th) + self.cosp1),
                self.y0 + self.a * math.pi / 4.0
                * (math.sin(th) + yy))


class _Loximuthal(_SphericalFwd):
    """Loximuthal (Siemon 1935/Tobler; spherical): rhumb lines from
    the center (central_parallel, lon0) map to straight lines through
    the origin at their true azimuth and true length —
    x = dlam (phi - phi1) / ln(tan(pi/4+phi/2)/tan(pi/4+phi1/2)),
    y = phi - phi1, with the cos(phi1) limit on the parallel."""

    def __init__(self, crs):
        super().__init__(crs)
        self.phi1 = _rad(self.p.get("central_parallel",
                                    self.p.get("latitude_of_origin", 0.0)))
        self.tan1 = math.tan(math.pi / 4.0 + self.phi1 / 2.0)

    def fwd(self, lon, lat):
        dl = lon - self.lon0
        dphi = lat - self.phi1
        if abs(dphi) < 1e-9:
            x = dl * math.cos(self.phi1)
        elif abs(lat) >= math.pi / 2.0 - 1e-12:
            # pole limit at BOTH poles: |log| -> inf so x -> 0
            # (tan(pi/2) is a huge-but-finite float, so the south
            # pole's t <= 0 test alone would leave the north pole
            # with a wrong nonzero x); keeping fwd total lets the
            # world-extent inversion stay inside the domain
            x = 0.0
        else:
            t = math.tan(math.pi / 4.0 + lat / 2.0)
            x = 0.0 if t <= 1e-15 else dl * dphi / math.log(t / self.tan1)
        return self.x0 + self.a * x, self.y0 + self.a * dphi

    def inv(self, x, y):
        # exact closed inverse of the forward (y carries lat alone,
        # then x unwinds dl); the pole column x != 0 has no preimage
        # and resolves to the central meridian by the x -> 0 limit
        dphi = (y - self.y0) / self.a
        lat = self.phi1 + dphi
        if abs(dphi) < 1e-9:
            dl = (x - self.x0) / (self.a * math.cos(self.phi1))
        elif abs(lat) >= math.pi / 2.0 - 1e-12:
            dl = 0.0          # pole column (both poles): x == 0
        else:
            t = math.tan(math.pi / 4.0 + lat / 2.0)
            dl = (0.0 if t <= 1e-15
                  else (x - self.x0) * math.log(t / self.tan1)
                  / (self.a * dphi))
        return self.lon0 + dl, lat


class _TwoPointEquidistant(_SphericalFwd):
    """Two-Point Equidistant (Snyder p. 192-195, spherical): distances
    from BOTH anchor points are true. Construction: anchors at
    (-c, 0) / (+c, 0) in angular units (d = 2c = anchor separation);
    a point lands at the intersection of the circles of its true
    angular distances z1/z2, on the side given by its azimuth from
    anchor 1 relative to the anchor1->anchor2 azimuth. The inverse is
    closed: recover (z1, z2) from the plane, solve the spherical
    triangle for the bearing at anchor 1, and shoot the geodesic.
    The defining both-distances-true property is pinned in tests."""

    def __init__(self, crs):
        super().__init__(crs)
        p = self.p
        self.ph1 = _rad(p.get("latitude_of_1st_point", 0.0))
        self.lm1 = _rad(p.get("longitude_of_1st_point", 0.0))
        self.ph2 = _rad(p.get("latitude_of_2nd_point", 0.0))
        self.lm2 = _rad(p.get("longitude_of_2nd_point", 0.0))
        self.d = self._dist(self.ph1, self.lm1, self.ph2, self.lm2)
        if self.d < 1e-9:
            raise ValueError("two-point equidistant anchors coincide")
        self.c = self.d / 2.0
        dl = self.lm2 - self.lm1
        self.az12 = math.atan2(
            math.sin(dl) * math.cos(self.ph2),
            math.cos(self.ph1) * math.sin(self.ph2)
            - math.sin(self.ph1) * math.cos(self.ph2) * math.cos(dl))

    @staticmethod
    def _dist(p1, l1, p2, l2):
        # haversine: precise for small separations where acos is not
        s = (math.sin((p2 - p1) / 2.0) ** 2
             + math.cos(p1) * math.cos(p2)
             * math.sin((l2 - l1) / 2.0) ** 2)
        return 2.0 * math.asin(min(1.0, math.sqrt(s)))

    def fwd(self, lon, lat):
        z1 = self._dist(self.ph1, self.lm1, lat, lon)
        z2 = self._dist(self.ph2, self.lm2, lat, lon)
        x = (z1 * z1 - z2 * z2) / (4.0 * self.c)
        y = math.sqrt(max(0.0, z1 * z1 - (x + self.c) ** 2))
        if y > 0.0 and z1 > 1e-12:
            dl = lon - self.lm1
            az = math.atan2(
                math.sin(dl) * math.cos(lat),
                math.cos(self.ph1) * math.sin(lat)
                - math.sin(self.ph1) * math.cos(lat) * math.cos(dl))
            delta = math.atan2(math.sin(az - self.az12),
                               math.cos(az - self.az12))
            if delta > 0.0:
                y = -y
        return self.x0 + self.a * x, self.y0 + self.a * y

    def inv(self, x, y):
        xr = (x - self.x0) / self.a
        yr = (y - self.y0) / self.a
        z1 = math.hypot(xr + self.c, yr)
        z2 = math.hypot(xr - self.c, yr)
        if z1 < 1e-12:
            return self.lm1, self.ph1
        ca1 = ((math.cos(z2) - math.cos(self.d) * math.cos(z1))
               / (math.sin(self.d) * math.sin(z1)))
        a1 = math.acos(max(-1.0, min(1.0, ca1)))
        az = self.az12 + (a1 if yr <= 0.0 else -a1)
        lat = math.asin(max(-1.0, min(
            1.0, math.sin(self.ph1) * math.cos(z1)
            + math.cos(self.ph1) * math.sin(z1) * math.cos(az))))
        lon = self.lm1 + math.atan2(
            math.sin(az) * math.sin(z1) * math.cos(self.ph1),
            math.cos(z1) - math.sin(self.ph1) * math.sin(lat))
        return lon, lat


class _ColombiaUrban(_Proj):
    """Colombia Urban / ESRI IGAC_Plano_Cartesiano (EPSG method 1052,
    IOGP Guidance Note 7-2): projection onto a horizontal plane at
    height h0 above the ellipsoid at the origin — the local Cartesian
    grids of Colombian cities. Closed forms both ways:

      nu0 = a / sqrt(1 - e^2 sin^2 phi0); rho0 = a(1-e^2)/w0^3
      A = 1 + h0/nu0;  B = tan(phi0)/(2 rho0 nu0)
      G(phi) = 1 + h0/rho_m, rho_m at the MEAN latitude (phi+phi0)/2
      E  = FE + A nu (lam-lam0) cos(phi)
      N  = FN + G(phi) rho0 [(phi-phi0) + B ((lam-lam0) nu cos(phi))^2]

    G is per-point (the guidance's rho_m term; PROJ's col_urban does
    the same) — at city extents it differs from the origin value only
    in the 8th digit, but the formula is matched exactly. The reverse
    iterates that exact relation: (E-FE)/A = (lam-lam0) nu cos(phi)
    cancels the quadratic term, leaving a fixed point in phi alone
      phi <- phi0 + (N-FN)/(G(phi) rho0) - B ((E-FE)/A)^2
    which converges to machine precision in 2-3 rounds (G varies by
    ~1e-8 per degree), then lam = lam0 + (E-FE)/(A nu(phi) cos(phi)).

    proj4js has no such method (it throws inside the reference), so
    this family is added capability beyond parity, like the
    pseudocylindricals."""

    def __init__(self, crs: dict):
        super().__init__(crs)
        self.h0 = self.p.get("height", 0.0)
        s0 = math.sin(self.lat0)
        w2 = 1.0 - self.e2 * s0 * s0
        self.rho0 = self.a * (1.0 - self.e2) / w2 ** 1.5
        nu0 = self.a / math.sqrt(w2)
        self.A = 1.0 + self.h0 / nu0
        self.B = math.tan(self.lat0) / (2.0 * self.rho0 * nu0)
        self.G = 1.0 + self.h0 / self.rho0   # G at the origin

    def _g(self, lat):
        sm = math.sin(0.5 * (lat + self.lat0))
        rho_m = (self.a * (1.0 - self.e2)
                 / (1.0 - self.e2 * sm * sm) ** 1.5)
        return 1.0 + self.h0 / rho_m

    def fwd(self, lon, lat):
        s, c = math.sin(lat), math.cos(lat)
        nu = self.a / math.sqrt(1.0 - self.e2 * s * s)
        t = (lon - self.lon0) * nu * c
        return (self.x0 + self.A * t,
                self.y0 + self._g(lat) * self.rho0
                * ((lat - self.lat0) + self.B * t * t))

    def inv(self, x, y):
        u = (x - self.x0) / self.A
        dy = y - self.y0
        lat = self.lat0 + dy / (self.G * self.rho0) - self.B * u * u
        for _ in range(3):
            lat = (self.lat0 + dy / (self._g(lat) * self.rho0)
                   - self.B * u * u)
        s, c = math.sin(lat), math.cos(lat)
        nu = self.a / math.sqrt(1.0 - self.e2 * s * s)
        return self.lon0 + u / (nu * c), lat


SUPPORTED_PROJECTIONS = {
    "transverse_mercator": _TMerc,
    "gauss_kruger": _TMerc,
    "transverse_mercator_complex": _TMerc,
    "lambert_conformal_conic": _LCC,
    "albers": _Albers,
    "mercator": _Merc,
    "mercator_auxiliary_sphere":
        lambda crs: _Merc(crs, spherical=True),
    "equidistant_cylindrical": _Eqc,
    "plate_carree": _Eqc,
    "cylindrical_equal_area": _CEA,
    "behrmann": lambda crs: _CEA(crs, phi_s=30.0),
    "miller_cylindrical": _Miller,
    "gall_stereographic": _Gall,
    "sinusoidal": _Sinusoidal,
    "mollweide": _Mollweide,
    "lambert_azimuthal_equal_area": _LAEA,
    "stereographic": _Stere,
    "double_stereographic": _Sterea,
    "stereographic_north_pole":
        lambda crs: _Stere(crs, forced_pole="north"),
    "stereographic_south_pole":
        lambda crs: _Stere(crs, forced_pole="south"),
    "cassini": _Cass,
    "polyconic": _Poly,
    "equidistant_conic": _Eqdc,
    "azimuthal_equidistant": _AEQD,
    "orthographic": _Ortho,
    "bonne": _Bonne,
    "hotine_oblique_mercator_azimuth_natural_origin": _Omerc,
    "rectified_skew_orthomorphic_natural_origin": _Omerc,
    "hotine_oblique_mercator_azimuth_center":
        lambda crs: _Omerc(crs, centered=True),
    "krovak": _Krovak,
    "gnomonic": _Gnomonic,
    "igac_plano_cartesiano": _ColombiaUrban,
    "van_der_grinten_i": _VanDerGrintenI,
    "times": _Times,
    "winkel_ii": _WinkelII,
    "loximuthal": _Loximuthal,
    "two_point_equidistant": _TwoPointEquidistant,
    # world pseudocylindrical/lenticular families (sphere, numeric
    # Newton inverse) — beyond proj4js's set, i.e. added capability
    "eckert_i": _EckertI,
    "eckert_ii": _EckertII,
    "eckert_iii": _EckertIII,
    "eckert_iv": _EckertIV,
    "eckert_v": _EckertV,
    "eckert_vi": _EckertVI,
    "winkel_i": _WinkelI,
    "winkel_tripel": _WinkelTripel,
    "aitoff": _Aitoff,
    "hammer_aitoff": _Hammer,
    "quartic_authalic": _QuarticAuthalic,
    "craster_parabolic": _CrasterParabolic,
    "flat_polar_quartic": _FlatPolarQuartic,
    "vertical_near_side_perspective": _VNSP,
}


def projection_for(crs: dict):
    """Instantiate the projection for a parsed CRS dict; raises
    UnsupportedProjectionError outside the supported set."""
    name = (crs.get("projection") or "").lower()
    impl = SUPPORTED_PROJECTIONS.get(name)
    if impl is None:
        raise UnsupportedProjectionError(
            f"projection {crs.get('projection')!r} is not in the "
            f"supported set (proj4js would equally fail to transform it)")
    return impl(crs)


def inverse_to_lonlat(crs: dict, x: float, y: float) -> tuple[float, float]:
    """Projected (x, y) in CRS units -> (lon, lat) degrees EPSG:4326
    (no datum shift — the table's WKTs carry no TOWGS84)."""
    if crs["kind"] == "geographic":
        return x + crs["primem_deg"], y
    u = crs["unit_to_m"]
    proj = projection_for(crs)
    lon, lat = proj.inv(x * u, y * u)
    return (math.degrees(lon) + crs["primem_deg"], math.degrees(lat))


def forward_from_lonlat(crs: dict, lon: float, lat: float) -> tuple[float, float]:
    """(lon, lat) degrees -> projected (x, y) in CRS units (testing
    twin of inverse_to_lonlat)."""
    if crs["kind"] == "geographic":
        return lon - crs["primem_deg"], lat
    proj = projection_for(crs)
    x, y = proj.fwd(_rad(lon - crs["primem_deg"]), _rad(lat))
    u = crs["unit_to_m"]
    return x / u, y / u
