"""CRS resolution + reprojection to EPSG:4326, from scratch (numpy).

Replaces the reference's `srs.parse` + proj4 usage
(/root/reference/es6-lib/soql/geom.js:10-16,
 /root/reference/es6-lib/decoders/wgs84-reprojector.js:9-74) with a
pure-numpy implementation of the projections its fixtures exercise:

  longlat, utm/tmerc (GCTP/Snyder series — the algorithm proj4@2.3 uses,
  so the reference's reprojection goldens at
  es6-test/unit/merger.js:133-183 reproduce to 1e-9 degrees),
  somerc (Swiss oblique mercator, for EPSG:23700),
  lcc (1/2SP) and merc (for .prj WKT state-plane files),
  plus 3/7-parameter Helmert datum shifts via geocentric coordinates.

Public API:
  resolve_crs(crs_string) -> canonical proj4-ish param dict
  Transformer.get(src_crs_string)  (cached)  .transform(xy: ndarray[N,2])
"""

from __future__ import annotations

import math
import re
from functools import lru_cache

import numpy as np

WGS84_PROJ4 = "+proj=longlat +ellps=WGS84 +no_defs"
HALF_PI = math.pi / 2
EPSLN = 1.0e-10
D2R = math.pi / 180.0
R2D = 180.0 / math.pi

ELLIPSOIDS = {
    # name: (a, rf); rf=0 -> sphere
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "GRS67": (6378160.0, 298.247167427),
    "clrk66": (6378206.4, 294.9786982),
    "clrk80": (6378249.145, 293.4663),
    "intl": (6378388.0, 297.0),
    "bessel": (6377397.155, 299.1528128),
    "krass": (6378245.0, 298.3),
    "aust_SA": (6378160.0, 298.25),
    "sphere": (6370997.0, 0.0),
}

DATUMS = {
    # datum code -> (towgs84 tuple or None, ellipsoid)
    "WGS84": ((0, 0, 0), "WGS84"),
    "NAD83": ((0, 0, 0), "GRS80"),
    "GGRS87": ((-199.87, 74.79, 246.62), "GRS80"),
    "potsdam": ((598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7), "bessel"),
    "hermannskogel": ((577.326, 90.129, 463.919, 5.137, 1.474, 5.297, 2.4232), "bessel"),
    "ire65": ((482.530, -130.596, 564.557, -1.042, -0.214, -0.631, 8.15), "mod_airy"),
    "nzgd49": ((59.47, -5.04, 187.44, 0.47, -0.1, 1.024, -4.5993), "intl"),
    "OSGB36": ((446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894), "airy"),
}


# --------------------------------------------------------------- parsing


def parse_proj4(s: str) -> dict:
    p: dict = {}
    for tok in s.split():
        tok = tok.lstrip("+")
        if not tok or tok in ("no_defs", "wktext"):
            continue
        if "=" in tok:
            k, v = tok.split("=", 1)
            p[k] = v
        else:
            p[tok] = True
    out: dict = {"proj": p.get("proj", "longlat")}
    if "datum" in p and p["datum"] in DATUMS:
        tow, ell = DATUMS[p["datum"]]
        out["towgs84"] = tow
        a, rf = ELLIPSOIDS[ell]
        out["a"], out["rf"] = a, rf
    if "ellps" in p and p["ellps"] in ELLIPSOIDS:
        out["a"], out["rf"] = ELLIPSOIDS[p["ellps"]]
    if "a" in p:
        out["a"] = float(p["a"])
    if "b" in p:
        b = float(p["b"])
        out["rf"] = 0.0 if b == out.get("a") else out["a"] / (out["a"] - b)
    if "rf" in p:
        out["rf"] = float(p["rf"])
    if "f" in p:
        f = float(p["f"])
        out["rf"] = 1.0 / f if f else 0.0
    if "towgs84" in p and not isinstance(p["towgs84"], bool):
        out["towgs84"] = tuple(float(x) for x in p["towgs84"].split(","))
    out.setdefault("a", 6378137.0)
    out.setdefault("rf", 298.257223563)
    for k_src, k_dst in (
        ("lat_0", "lat0"), ("lat_1", "lat1"), ("lat_2", "lat2"),
        ("lon_0", "lon0"), ("lat_ts", "lat_ts"),
        ("x_0", "x0"), ("y_0", "y0"), ("k_0", "k0"), ("k", "k0"),
    ):
        if k_src in p:
            out[k_dst] = float(p[k_src])
    if "zone" in p:
        out["zone"] = int(p["zone"])
        out["lon0"] = -183.0 + 6.0 * out["zone"]
        out.setdefault("x0", 500000.0)
        out.setdefault("y0", 10000000.0 if "south" in p else 0.0)
        out.setdefault("k0", 0.9996)
        out["proj"] = "tmerc"
    if "to_meter" in p:
        out["to_meter"] = float(p["to_meter"])
    elif p.get("units") == "us-ft":
        out["to_meter"] = 1200.0 / 3937.0
    elif p.get("units") == "ft":
        out["to_meter"] = 0.3048
    out.setdefault("to_meter", 1.0)
    out.setdefault("lat0", 0.0)
    out.setdefault("lon0", 0.0)
    out.setdefault("x0", 0.0)
    out.setdefault("y0", 0.0)
    out.setdefault("k0", 1.0)
    return out


# EPSG codes the reference corpus + common web data use. UTM ranges are
# synthesized below.
_EPSG_FIXED = {
    4326: WGS84_PROJ4,
    4269: "+proj=longlat +ellps=GRS80 +towgs84=0,0,0 +no_defs",  # NAD83 geographic
    4267: "+proj=longlat +ellps=clrk66 +no_defs",  # NAD27 (no grid shift support)
    3857: "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +k=1 +units=m +no_defs",
    900913: "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +k=1 +units=m +no_defs",
    # EOV / HD72 (Hungary) — somerc; towgs84 per EPSG tfm 1448 (GDAL default)
    23700: "+proj=somerc +lat_0=47.14439372222222 +lon_0=19.04857177777778 "
    "+k_0=0.99993 +x_0=650000 +y_0=200000 +ellps=GRS67 "
    "+towgs84=52.17,-71.82,-14.9,0,0,0,0 +units=m +no_defs",
    # NAD83(HARN) / Ohio North (m) — lcc (fixture simple_points_epsg_2834;
    # golden proj4 in es6-test/unit/shapefile.js:45-54)
    2834: "+proj=lcc +lat_1=41.7 +lat_2=40.43333333333333 "
    "+lat_0=39.66666666666666 +lon_0=-82.5 +x_0=600000 +y_0=0 "
    "+ellps=GRS80 +towgs84=0,0,0 +units=m +no_defs",
}


def epsg_to_proj4(code: int) -> str:
    if code in _EPSG_FIXED:
        return _EPSG_FIXED[code]
    if 32601 <= code <= 32660:
        return f"+proj=utm +zone={code - 32600} +datum=WGS84 +units=m +no_defs"
    if 32701 <= code <= 32760:
        return f"+proj=utm +zone={code - 32700} +south +datum=WGS84 +units=m +no_defs"
    if 26901 <= code <= 26923:
        return f"+proj=utm +zone={code - 26900} +datum=NAD83 +units=m +no_defs"
    raise UnknownCrsError(f"EPSG:{code}")


class UnknownCrsError(ValueError):
    pass


_URN_EPSG = re.compile(r"urn:ogc:def:crs:EPSG:[^:]*:(\d+)$", re.I)
_EPSG_SHORT = re.compile(r"EPSG:(\d+)$", re.I)


def crs_to_proj4(crs: str) -> str:
    """Resolve a CRS reference string (proj4, EPSG urn/code, OGC CRS84 urn,
    or ESRI .prj WKT) to a proj4 string — the role srs.parse plays in the
    reference (layer.js:90, merger.js:22)."""
    crs = crs.strip()
    if crs.startswith("+"):
        return crs
    if re.search(r"urn:ogc:def:crs:OGC:[\d.]*:CRS84$", crs, re.I):
        return WGS84_PROJ4
    m = _URN_EPSG.search(crs) or _EPSG_SHORT.search(crs)
    if m:
        return epsg_to_proj4(int(m.group(1)))
    if crs[:6].upper() in ("GEOGCS", "PROJCS") or crs[:7].upper() in ("GEOGCRS", "PROJCRS"):
        return wkt_to_proj4(crs)
    raise UnknownCrsError(crs[:120])


# ------------------------------------------------------------- WKT (.prj)


def _wkt_parse(s: str):
    """Parse WKT into [name, arg, arg, ...] nested lists."""
    s = s.strip()
    pos = 0

    def node():
        nonlocal pos
        m = re.match(r'\s*([A-Za-z0-9_]+)\s*\[', s[pos:])
        if not m:
            raise UnknownCrsError("bad WKT")
        name = m.group(1).upper()
        pos += m.end()
        args = [name]
        while True:
            while pos < len(s) and s[pos] in ", \t\r\n":
                pos += 1
            c = s[pos]
            if c == "]":
                pos += 1
                return args
            if c == '"':
                m2 = re.match(r'"([^"]*)"', s[pos:])
                args.append(m2.group(1))
                pos += m2.end()
            elif re.match(r"[A-Za-z]", c):
                args.append(node())
            else:
                m2 = re.match(r"[^,\]]+", s[pos:])
                args.append(float(m2.group(0)))
                pos += m2.end()

    return node()


def _wkt_find(tree, name):
    for a in tree[2:] if len(tree) > 1 else []:
        if isinstance(a, list) and a[0] == name:
            return a
    for a in tree[1:]:
        if isinstance(a, list):
            if a[0] == name:
                return a
            found = _wkt_find(a, name)
            if found:
                return found
    return None


_WKT_PROJ_MAP = {
    "TRANSVERSE_MERCATOR": "tmerc",
    "LAMBERT_CONFORMAL_CONIC": "lcc",
    "LAMBERT_CONFORMAL_CONIC_2SP": "lcc",
    "MERCATOR": "merc",
    "MERCATOR_1SP": "merc",
    "MERCATOR_AUXILIARY_SPHERE": "merc",
    "HOTINE_OBLIQUE_MERCATOR_AZIMUTH_CENTER": "somerc",
    "SWISS_OBLIQUE_CYLINDRICAL": "somerc",
}


def wkt_to_proj4(wkt: str) -> str:
    """ESRI/OGC WKT1 -> proj4 string (GEOGCS and the PROJCS projections
    the engine implements)."""
    tree = _wkt_parse(wkt)
    spheroid = _wkt_find(tree, "SPHEROID") or _wkt_find(tree, "ELLIPSOID")
    a, rf = (spheroid[2], spheroid[3]) if spheroid else (6378137.0, 298.257223563)
    datum = _wkt_find(tree, "DATUM")
    datum_name = (datum[1] if datum else "").upper().replace(" ", "_")
    towgs84 = _wkt_find(tree, "TOWGS84")
    ell = f"+a={a} +rf={rf}" if rf else f"+a={a} +b={a}"
    dat = ""
    if towgs84:
        dat = " +towgs84=" + ",".join(str(float(v)) for v in towgs84[1:8])
    elif "WGS_1984" in datum_name or "WGS84" in datum_name:
        dat = " +towgs84=0,0,0"
        ell = "+ellps=WGS84"
    elif "NORTH_AMERICAN_1983" in datum_name or "NAD83" in datum_name or "HARN" in datum_name:
        dat = " +towgs84=0,0,0"
        ell = "+ellps=GRS80"

    if tree[0] == "GEOGCS":
        return f"+proj=longlat {ell}{dat} +no_defs"

    proj_node = _wkt_find(tree, "PROJECTION")
    pname = proj_node[1].upper() if proj_node else ""
    proj = _WKT_PROJ_MAP.get(pname)
    if proj is None:
        raise UnknownCrsError(f"WKT projection {pname!r}")
    params = {}
    scan = [tree]
    while scan:
        n = scan.pop()
        for aa in n[1:]:
            if isinstance(aa, list):
                if aa[0] == "PARAMETER":
                    params[str(aa[1]).lower()] = float(aa[2])
                elif aa[0] not in ("GEOGCS",):
                    scan.append(aa)
    unit = None
    for aa in reversed(tree):  # projected unit is a direct child of PROJCS
        if isinstance(aa, list) and aa[0] == "UNIT":
            unit = aa
            break
    to_meter = float(unit[2]) if unit else 1.0

    def g(*names, default=0.0):
        for nm in names:
            if nm in params:
                return params[nm]
        return default

    parts = [f"+proj={proj}", ell]
    parts.append(f"+lat_0={g('latitude_of_origin', 'latitude_of_center')}")
    parts.append(f"+lon_0={g('central_meridian', 'longitude_of_center')}")
    if proj == "lcc":
        parts.append(f"+lat_1={g('standard_parallel_1', default=g('latitude_of_origin'))}")
        parts.append(f"+lat_2={g('standard_parallel_2', default=g('standard_parallel_1', default=g('latitude_of_origin')))}")
    parts.append(f"+k_0={g('scale_factor', default=1.0)}")
    # WKT false easting/northing are expressed in the PROJCS unit;
    # proj4 +x_0/+y_0 are always meters
    parts.append(f"+x_0={g('false_easting') * to_meter}")
    parts.append(f"+y_0={g('false_northing') * to_meter}")
    if to_meter != 1.0:
        parts.append(f"+to_meter={to_meter}")
    if dat:
        parts.append(dat.strip())
    parts.append("+no_defs")
    return " ".join(parts)


# ------------------------------------------------------------ projections
# Each projection implements inverse(x, y) -> (lon_rad, lat_rad) and
# forward(lon_rad, lat_rad) -> (x, y), vectorized over numpy arrays.


class _Base:
    def __init__(self, p: dict):
        self.a = p["a"]
        rf = p.get("rf") or 0.0
        self.f = 1.0 / rf if rf else 0.0
        self.b = self.a * (1.0 - self.f)
        self.es = 2 * self.f - self.f * self.f
        self.e = math.sqrt(self.es)
        self.ep2 = self.es / (1.0 - self.es) if self.es else 0.0
        self.lat0 = p.get("lat0", 0.0) * D2R
        self.lon0 = p.get("lon0", 0.0) * D2R
        self.x0 = p.get("x0", 0.0)
        self.y0 = p.get("y0", 0.0)
        self.k0 = p.get("k0", 1.0)
        self.p = p


class LongLat(_Base):
    def inverse(self, x, y):
        return x * D2R, y * D2R

    def forward(self, lon, lat):
        return lon * R2D, lat * R2D


def _e0fn(x):
    return 1.0 - 0.25 * x * (1.0 + x / 16.0 * (3.0 + 1.25 * x))


def _e1fn(x):
    return 0.375 * x * (1.0 + 0.25 * x * (1.0 + 0.46875 * x))


def _e2fn(x):
    return 0.05859375 * x * x * (1.0 + 0.75 * x)


def _e3fn(x):
    return x * x * x * (35.0 / 3072.0)


def _mlfn(e0, e1, e2, e3, phi):
    return e0 * phi - e1 * np.sin(2 * phi) + e2 * np.sin(4 * phi) - e3 * np.sin(6 * phi)


class Tmerc(_Base):
    """GCTP-series transverse Mercator (the algorithm proj4@2.3 ships),
    reproducing the reference's UTM reprojection goldens to 1e-9 deg."""

    def __init__(self, p):
        super().__init__(p)
        self.e0 = _e0fn(self.es)
        self.e1 = _e1fn(self.es)
        self.e2 = _e2fn(self.es)
        self.e3 = _e3fn(self.es)
        self.ml0 = self.a * _mlfn(self.e0, self.e1, self.e2, self.e3, self.lat0)

    def forward(self, lon, lat):
        dlon = _adjust_lon(lon - self.lon0)
        sin_phi, cos_phi = np.sin(lat), np.cos(lat)
        al = cos_phi * dlon
        als = al * al
        c = self.ep2 * cos_phi**2
        tq = np.tan(lat)
        t = tq * tq
        con = 1.0 - self.es * sin_phi**2
        n = self.a / np.sqrt(con)
        ml = self.a * _mlfn(self.e0, self.e1, self.e2, self.e3, lat)
        x = (
            self.k0 * n * al
            * (1.0 + als / 6.0 * (1.0 - t + c + als / 20.0 * (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * self.ep2)))
            + self.x0
        )
        y = (
            self.k0
            * (ml - self.ml0 + n * tq * (als * (0.5 + als / 24.0 * (5.0 - t + 9.0 * c + 4.0 * c * c + als / 30.0 * (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * self.ep2)))))
            + self.y0
        )
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.x0
        y = np.asarray(y, dtype=np.float64) - self.y0
        con = (self.ml0 + y / self.k0) / self.a
        phi = con.copy()
        for _ in range(8):
            dphi = (
                (con + self.e1 * np.sin(2 * phi) - self.e2 * np.sin(4 * phi) + self.e3 * np.sin(6 * phi)) / self.e0
            ) - phi
            phi = phi + dphi
            if np.all(np.abs(dphi) <= EPSLN):
                break
        sin_phi, cos_phi = np.sin(phi), np.cos(phi)
        tan_phi = np.tan(phi)
        c = self.ep2 * cos_phi**2
        cs = c * c
        t = tan_phi * tan_phi
        ts = t * t
        con = 1.0 - self.es * sin_phi**2
        n = self.a / np.sqrt(con)
        r = n * (1.0 - self.es) / con
        d = x / (n * self.k0)
        ds = d * d
        lat = phi - (n * tan_phi * ds / r) * (
            0.5
            - ds / 24.0 * (5.0 + 3.0 * t + 10.0 * c - 4.0 * cs - 9.0 * self.ep2 - ds / 30.0 * (61.0 + 90.0 * t + 298.0 * c + 45.0 * ts - 252.0 * self.ep2 - 3.0 * cs))
        )
        lon = _adjust_lon(
            self.lon0
            + d * (1.0 - ds / 6.0 * (1.0 + 2.0 * t + c - ds / 20.0 * (5.0 - 2.0 * c + 28.0 * t - 3.0 * cs + 8.0 * self.ep2 + 24.0 * ts))) / cos_phi
        )
        big = np.abs(phi) >= HALF_PI
        if np.any(big):
            lat = np.where(big, HALF_PI * np.sign(y), lat)
            lon = np.where(big, self.lon0, lon)
        return lon, lat


class Somerc(_Base):
    """Swiss oblique mercator (EPSG 9815 'somerc'), swisstopo formulas —
    used by EPSG:23700 (HD72/EOV) in the reference's multi_non_wgs84 test."""

    def __init__(self, p):
        super().__init__(p)
        phy0 = self.lat0
        s0 = math.sin(phy0)
        self.R = self.k0 * self.a * math.sqrt(1 - self.es) / (1 - self.es * s0 * s0)
        self.alpha = math.sqrt(1 + self.es / (1 - self.es) * math.cos(phy0) ** 4)
        self.b0 = math.asin(s0 / self.alpha)
        k1 = math.log(math.tan(math.pi / 4 + self.b0 / 2))
        k2 = math.log(math.tan(math.pi / 4 + phy0 / 2))
        k3 = math.log((1 + self.e * s0) / (1 - self.e * s0))
        self.K = k1 - self.alpha * k2 + self.alpha * self.e / 2 * k3

    def forward(self, lon, lat):
        sa1 = np.log(np.tan(math.pi / 4 + lat / 2))
        sa2 = self.e / 2 * np.log((1 + self.e * np.sin(lat)) / (1 - self.e * np.sin(lat)))
        S = self.alpha * (sa1 - sa2) + self.K
        b = 2 * (np.arctan(np.exp(S)) - math.pi / 4)
        I = self.alpha * _adjust_lon(lon - self.lon0)
        # rotate (b, I) so the projection center moves to the pseudo-equator
        rotI = np.arctan2(np.cos(b) * np.sin(I), np.cos(b) * np.cos(I) * np.cos(self.b0) + np.sin(b) * np.sin(self.b0))
        rotB = np.arcsin(np.cos(self.b0) * np.sin(b) - np.sin(self.b0) * np.cos(b) * np.cos(I))
        y = self.R / 2 * np.log((1 + np.sin(rotB)) / (1 - np.sin(rotB))) + self.y0
        x = self.R * rotI + self.x0
        return x, y

    def inverse(self, x, y):
        Y = np.asarray(x, dtype=np.float64) - self.x0
        X = np.asarray(y, dtype=np.float64) - self.y0
        rotI = Y / self.R
        rotB = 2 * (np.arctan(np.exp(X / self.R)) - math.pi / 4)
        b = np.arcsin(np.cos(self.b0) * np.sin(rotB) + np.sin(self.b0) * np.cos(rotB) * np.cos(rotI))
        I = np.arctan2(
            np.cos(rotB) * np.sin(rotI),
            np.cos(rotB) * np.cos(rotI) * np.cos(self.b0) - np.sin(rotB) * np.sin(self.b0),
        )
        lon = _adjust_lon(self.lon0 + I / self.alpha)
        # fixed-point solve of the ellipsoidal latitude; the 1e-7 rad stop
        # matches proj4@2.3's somerc so the reference's EOV golden
        # (es6-test/unit/merger.js:140-142) reproduces to <1e-10 deg
        phi = b.copy()
        for _ in range(20):
            S = (np.log(np.tan(math.pi / 4 + b / 2)) - self.K) / self.alpha + self.e * np.log(
                np.tan(math.pi / 4 + np.arcsin(self.e * np.sin(phi)) / 2)
            )
            new_phi = 2 * np.arctan(np.exp(S)) - math.pi / 2
            done = np.all(np.abs(new_phi - phi) <= 1e-7)
            phi = new_phi
            if done:
                break
        return lon, phi


class Merc(_Base):
    def __init__(self, p):
        super().__init__(p)
        lat_ts = p.get("lat_ts", 0.0) * D2R
        if self.es:
            self.k0 = self.k0 * _msfnz(self.e, math.sin(lat_ts), math.cos(lat_ts)) if lat_ts else self.k0
        else:
            self.k0 = self.k0 * math.cos(lat_ts)

    def forward(self, lon, lat):
        if self.es:
            sphi = np.sin(lat)
            ts = _tsfnz(self.e, lat, sphi)
            x = self.x0 + self.a * self.k0 * _adjust_lon(lon - self.lon0)
            y = self.y0 - self.a * self.k0 * np.log(ts)
        else:
            x = self.x0 + self.a * self.k0 * _adjust_lon(lon - self.lon0)
            y = self.y0 + self.a * self.k0 * np.log(np.tan(math.pi / 4 + lat / 2))
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.x0
        y = np.asarray(y, dtype=np.float64) - self.y0
        lon = _adjust_lon(self.lon0 + x / (self.a * self.k0))
        if self.es:
            ts = np.exp(-y / (self.a * self.k0))
            lat = _phi2z(self.e, ts)
        else:
            lat = HALF_PI - 2 * np.arctan(np.exp(-y / (self.a * self.k0)))
        return lon, lat


class Lcc(_Base):
    """Lambert conformal conic (1/2SP), Snyder formulas."""

    def __init__(self, p):
        super().__init__(p)
        lat1 = p.get("lat1", p.get("lat0", 0.0)) * D2R
        lat2 = p.get("lat2", p.get("lat1", p.get("lat0", 0.0))) * D2R
        e = self.e
        sin1, cos1 = math.sin(lat1), math.cos(lat1)
        sin2, cos2 = math.sin(lat2), math.cos(lat2)
        m1 = _msfnz(e, sin1, cos1)
        m2 = _msfnz(e, sin2, cos2)
        t1 = _tsfnz(e, lat1, sin1)
        t2 = _tsfnz(e, lat2, sin2)
        t0 = _tsfnz(e, self.lat0, math.sin(self.lat0))
        if abs(lat1 - lat2) > EPSLN:
            self.ns = math.log(m1 / m2) / math.log(t1 / t2)
        else:
            self.ns = sin1
        self.f0 = m1 / (self.ns * t1**self.ns)
        self.rh = self.a * self.f0 * t0**self.ns * self.k0

    def forward(self, lon, lat):
        ts = _tsfnz(self.e, lat, np.sin(lat))
        rh1 = self.a * self.f0 * ts**self.ns * self.k0
        theta = self.ns * _adjust_lon(lon - self.lon0)
        x = rh1 * np.sin(theta) + self.x0
        y = self.rh - rh1 * np.cos(theta) + self.y0
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.x0
        y = self.rh - (np.asarray(y, dtype=np.float64) - self.y0)
        if self.ns > 0:
            rh1 = np.sqrt(x * x + y * y)
            con = 1.0
        else:
            rh1 = -np.sqrt(x * x + y * y)
            con = -1.0
        theta = np.arctan2(con * x, con * y)
        ts = (rh1 / (self.a * self.k0 * self.f0)) ** (1.0 / self.ns)
        lat = _phi2z(self.e, ts)
        lat = np.where(rh1 == 0, HALF_PI * np.sign(self.ns), lat)
        lon = _adjust_lon(theta / self.ns + self.lon0)
        return lon, lat


def _adjust_lon(lon):
    return np.where(np.abs(lon) <= math.pi, lon, lon - np.sign(lon) * 2 * math.pi)


def _msfnz(e, sphi, cphi):
    con = e * sphi
    return cphi / np.sqrt(1.0 - con * con)


def _tsfnz(e, phi, sphi):
    con = e * sphi
    com = 0.5 * e
    con = ((1.0 - con) / (1.0 + con)) ** com
    return np.tan(0.5 * (HALF_PI - phi)) / con


def _phi2z(e, ts):
    eccnth = 0.5 * e
    phi = HALF_PI - 2 * np.arctan(ts)
    for _ in range(15):
        con = e * np.sin(phi)
        dphi = HALF_PI - 2 * np.arctan(ts * ((1.0 - con) / (1.0 + con)) ** eccnth) - phi
        phi = phi + dphi
        if np.all(np.abs(dphi) <= 1e-10):
            break
    return phi


_PROJ_CLASSES = {
    "longlat": LongLat,
    "latlong": LongLat,
    "tmerc": Tmerc,
    "utm": Tmerc,
    "somerc": Somerc,
    "merc": Merc,
    "lcc": Lcc,
}


# ----------------------------------------------------------- datum shifts


def _geodetic_to_geocentric(lon, lat, a, es):
    sin_lat = np.sin(lat)
    cos_lat = np.cos(lat)
    rn = a / np.sqrt(1.0 - es * sin_lat * sin_lat)
    X = rn * cos_lat * np.cos(lon)
    Y = rn * cos_lat * np.sin(lon)
    Z = rn * (1.0 - es) * sin_lat
    return X, Y, Z


def _geocentric_to_geodetic(X, Y, Z, a, es):
    # Bowring's iteration-free start + 2 Newton refinements; ~1e-12 rad.
    b = a * math.sqrt(1.0 - es)
    ep2 = es / (1.0 - es) if es else 0.0
    p = np.sqrt(X * X + Y * Y)
    lon = np.arctan2(Y, X)
    theta = np.arctan2(Z * a, p * b)
    lat = np.arctan2(Z + ep2 * b * np.sin(theta) ** 3, p - es * a * np.cos(theta) ** 3)
    for _ in range(6):
        sin_lat = np.sin(lat)
        rn = a / np.sqrt(1.0 - es * sin_lat * sin_lat)
        h = p / np.cos(lat) - rn
        new_lat = np.arctan2(Z, p * (1.0 - es * rn / (rn + h)))
        if np.all(np.abs(new_lat - lat) < 1e-14):
            lat = new_lat
            break
        lat = new_lat
    return lon, lat


def _helmert(X, Y, Z, params, inverse=False):
    if len(params) == 3 or all(v == 0 for v in params[3:]):
        dx, dy, dz = params[:3]
        if inverse:
            return X - dx, Y - dy, Z - dz
        return X + dx, Y + dy, Z + dz
    dx, dy, dz, rx, ry, rz, s = params
    rx *= 4.84813681109536e-6  # arcsec -> rad
    ry *= 4.84813681109536e-6
    rz *= 4.84813681109536e-6
    m = 1.0 + s * 1e-6
    if inverse:
        Xt = (X - dx) / m
        Yt = (Y - dy) / m
        Zt = (Z - dz) / m
        return (
            Xt + rz * Yt - ry * Zt,
            -rz * Xt + Yt + rx * Zt,
            ry * Xt - rx * Yt + Zt,
        )
    return (
        m * (X - rz * Y + ry * Z) + dx,
        m * (rz * X + Y - rx * Z) + dy,
        m * (-ry * X + rx * Y + Z) + dz,
    )


# ------------------------------------------------------------- transformer


class Transformer:
    """src CRS -> EPSG:4326 lon/lat (degrees), vectorized.

    Matches the reference's skip rule (soql/geom.js:10-16): when the
    source CRS *string* equals the WGS84 output proj4 string the transform
    is the identity.
    """

    def __init__(self, src_crs: str):
        self.src_string = src_crs
        self.identity = src_crs.strip() == WGS84_PROJ4
        self.params = parse_proj4(crs_to_proj4(src_crs))
        cls = _PROJ_CLASSES.get(self.params["proj"])
        if cls is None:
            raise UnknownCrsError(f"projection {self.params['proj']!r}")
        self.proj = cls(self.params)
        self.towgs84 = self.params.get("towgs84")
        self.to_meter = self.params.get("to_meter", 1.0)

    def transform(self, xy: np.ndarray) -> np.ndarray:
        """xy: float64 [N,2] in source CRS -> [N,2] lon/lat degrees."""
        if self.identity or xy.size == 0:
            return xy
        x = xy[:, 0].astype(np.float64, copy=True)
        y = xy[:, 1].astype(np.float64, copy=True)
        if self.params["proj"] != "longlat" and self.to_meter != 1.0:
            x *= self.to_meter
            y *= self.to_meter
        lon, lat = self.proj.inverse(x, y)
        if self.towgs84 is not None and any(self.towgs84):
            X, Y, Z = _geodetic_to_geocentric(lon, lat, self.params["a"], self.proj.es)
            X, Y, Z = _helmert(X, Y, Z, self.towgs84)
            wa, wrf = ELLIPSOIDS["WGS84"]
            wes = 2 / wrf - 1 / wrf**2
            lon, lat = _geocentric_to_geodetic(X, Y, Z, wa, wes)
        out = np.empty((len(xy), 2), dtype=np.float64)
        out[:, 0] = lon * R2D
        out[:, 1] = lat * R2D
        return out

    _cache: dict = {}

    @classmethod
    def get(cls, src_crs: str) -> "Transformer":
        """Per-process transformer cache — the 'compiled state' an actor
        pool or task worker holds (reference builds srs.parse once per
        layer; we build once per (worker, crs))."""
        t = cls._cache.get(src_crs)
        if t is None:
            t = cls(src_crs)
            cls._cache[src_crs] = t
        return t


@lru_cache(maxsize=512)
def crs_name(crs: str) -> str:
    """Human-readable projection name for layer manifests (the reference
    reports `srs.parse(crs).name` in summaries)."""
    try:
        p = parse_proj4(crs_to_proj4(crs))
    except UnknownCrsError:
        return crs[:60]
    return p["proj"]
