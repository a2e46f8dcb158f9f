"""Dev tool: extract golden test cases from the reference's Go test files
into JSON data for our conformance suite.

The reference's table-driven tests are pure data (input polygon + grid +
expected output vertices); this script mechanically converts the Go
composite literals into JSON. Run once; the generated files under
tests/golden/ are committed. Not imported at runtime.

Usage: python tools/extract_goldens.py /root/reference /root/repo/tests/golden
"""

from __future__ import annotations

import json
import re
import sys


def strip_comments(src: str) -> str:
    return re.sub(r"//[^\n]*", "", src)


_TYPE_PREFIX = re.compile(
    r"(?:map\[[^\]]*\](?:\[\])*[\w\.]*|(?:\[\d*\])+[\w\.]*|[A-Za-z_][\w\.]*)\{"
)


def clean_literals(src: str) -> str:
    """Remove Go type prefixes in composite literals: `T{` -> `{`."""
    prev = None
    while prev != src:
        prev = src
        src = _TYPE_PREFIX.sub("{", src)
    return src


class Parser:
    def __init__(self, text: str, env: dict):
        self.t = text
        self.i = 0
        self.env = env

    def ws(self):
        while self.i < len(self.t) and self.t[self.i] in " \t\n\r":
            self.i += 1

    def parse_value(self):
        self.ws()
        if self.t[self.i] == "{":
            return self.parse_composite()
        return self.parse_leaf()

    def _peek_key(self):
        """If the next item is `key: ...`, return key string; else None."""
        j = self.i
        m = re.match(
            r'\s*("(?:[^"\\]|\\.)*"|[\w\.]+\([^()]*\)|[A-Za-z_]\w*|[0-9]\w*(?:\s*[\+\-\*]\s*[0-9]\w*)*)\s*:',
            self.t[j:],
        )
        if m:
            key = m.group(1)
            if key.startswith('"'):
                key = json.loads(key)
            elif key[0].isdigit() or "(" in key:
                key = eval(key, {"__builtins__": {}}, make_env())  # noqa: S307
            return key, j + m.end()
        return None, j

    def parse_composite(self):
        assert self.t[self.i] == "{"
        self.i += 1
        self.ws()
        if self.t[self.i] == "}":
            self.i += 1
            return []
        key, after = self._peek_key()
        if key is not None:
            out = {}
            while True:
                self.ws()
                if self.t[self.i] == "}":
                    self.i += 1
                    return out
                key, after = self._peek_key()
                assert key is not None, f"expected key at {self.t[self.i:self.i+60]!r}"
                self.i = after
                out[key] = self.parse_value()
                self.ws()
                if self.t[self.i] == ",":
                    self.i += 1
        else:
            out = []
            while True:
                self.ws()
                if self.t[self.i] == "}":
                    self.i += 1
                    return out
                out.append(self.parse_value())
                self.ws()
                if self.t[self.i] == ",":
                    self.i += 1

    def parse_leaf(self):
        start = self.i
        depth = 0
        in_str = False
        while self.i < len(self.t):
            c = self.t[self.i]
            if in_str:
                if c == "\\":
                    self.i += 2
                    continue
                if c == '"':
                    in_str = False
            elif c == '"':
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0 and c in ",}{":
                break
            self.i += 1
        expr = self.t[start : self.i].strip()
        # Go composite literals nested inside call arguments: braces -> brackets
        expr = expr.replace("{", "[").replace("}", "]")
        return eval(expr, {"__builtins__": {}}, self.env)  # noqa: S307 - dev tool on trusted local data


def make_env():
    outer_sq = [[0, 0], [1, 0], [1, 1], [0, 1]]
    inner_sq = [[0, 0], [0, 1], [1, 1], [1, 0]]

    def square_ring_array(number, is_outer):
        sq = outer_sq if is_outer else inner_sq
        return [list(sq) for _ in range(number)]

    class _Mathhelp:
        @staticmethod
        def Pow2(n):
            return 2**n

    class _Intgeom:
        One = 10_000_000_000
        Half = 5_000_000_000

        @staticmethod
        def FromGeomOrd(o):
            return int(o * 1e10)

        @staticmethod
        def FromGeomPoint(p):
            return [int(v * 1e10) for v in p]

        @staticmethod
        def FromGeomExtent(e):
            return [int(v * 1e10) for v in e]

        @staticmethod
        def M(x):
            return int(x)

    return {
        "true": True,
        "false": False,
        "nil": None,
        "t": None,
        "intgeom": _Intgeom(),
        "EMPTYMAP": [],
        "morton": type("M", (), {"MustToZ": staticmethod(lambda x, y: __import__("texel_ray.core.morton", fromlist=["to_z"]).to_z(x, y))})(),
        "newSimplePointIndex": lambda d, c: {"pointindex": ["simple", d, c]},
        "newPointIndexFromEmbeddedTileMatrixSet": lambda t, name, tm_id: {
            "pointindex": ["embedded", name, tm_id]
        },
        "loadEmbeddedTileMatrixSet": lambda t, name: {"tms": ["embedded", name]},
        "newSimpleTileMatrixSet": lambda d, c: {"tms": ["simple", d, c]},
        "squareRingArray": square_ring_array,
        "append": lambda a, *rest: list(a) + list(rest),
        "mathhelp": _Mathhelp(),
        "math": __import__("math"),
    }


def extract_table(src: str, func_name: str) -> list:
    """Extract the `tests := []struct{...}{ ... }` table inside func_name."""
    fstart = src.index(f"func {func_name}(")
    tstart = src.index("tests := []struct", fstart)
    # skip the struct type definition: find the `}{` that closes it
    brace = src.index("{", tstart)
    depth = 0
    i = brace
    while True:
        if src[i] == "{":
            depth += 1
        elif src[i] == "}":
            depth -= 1
            if depth == 0:
                break
        i += 1
    assert src[i + 1] == "{", "expected literal after struct type"
    body_start = i + 1
    body = re.sub(r"make\([^()]*\)", "EMPTYMAP", strip_comments(src[body_start:]))
    cleaned = clean_literals(body)
    p = Parser(cleaned, make_env())
    return p.parse_value()


def main():
    ref, outdir = sys.argv[1], sys.argv[2]
    import pathlib

    out = pathlib.Path(outdir)
    out.mkdir(parents=True, exist_ok=True)

    snap_src = open(f"{ref}/snap/snap_test.go").read()
    for func, fname in [
        ("TestSnap_snapPolygon", "snap_polygon_cases.json"),
        ("TestSnap_ringContains", "ring_contains_cases.json"),
        ("Test_kmpDeduplicate", "kmp_dedupe_cases.json"),
        ("Test_dedupeInnersOuters", "dedupe_inners_outers_cases.json"),
    ]:
        cases = extract_table(snap_src, func)
        (out / fname).write_text(json.dumps(cases, indent=1))
        print(f"{fname}: {len(cases)} cases")

    pi_src = open(f"{ref}/pointindex/pointindex_test.go").read()
    for func, fname in [
        ("TestPointIndex_containsPoint", "pi_contains_point_cases.json"),
        ("TestPointIndex_InsertPoint_Deepest", "pi_insert_deepest_cases.json"),
        ("TestPointIndex_InsertPoint", "pi_insert_point_cases.json"),
        ("TestPointIndex_SnapClosestPoints", "pi_snap_closest_cases.json"),
        ("TestPointIndex_lineIntersects", "pi_line_intersects_cases.json"),
    ]:
        try:
            cases = extract_table(pi_src, func)
            (out / fname).write_text(json.dumps(cases, indent=1))
            print(f"{fname}: {len(cases)} cases")
        except Exception as e:  # noqa: BLE001
            print(f"{fname}: SKIP ({e})")

    tms_src = open(f"{ref}/tms20/tms20_test.go").read()
    for func, fname in [
        ("TestTileMatrixSet_FromNative", "tms_from_native_cases.json"),
        ("TestTileMatrixSet_ToNative", "tms_to_native_cases.json"),
    ]:
        try:
            cases = extract_table(tms_src, func)
            (out / fname).write_text(json.dumps(cases, indent=1))
            print(f"{fname}: {len(cases)} cases")
        except Exception as e:  # noqa: BLE001
            print(f"{fname}: SKIP ({e})")

    # EPSG axis-order authority: public EPSG-registry facts (v10.096),
    # mechanically pulled from the reference's generated data table
    # (tms20/epsg_axis_order.go) into compact package data consumed by
    # texel_ray/core/tms.py (crs_is_latlon). Codes whose first two axes
    # are lat/lon (or northing/easting) map to true.
    axis_src = open(f"{ref}/tms20/epsg_axis_order.go").read()
    entries = dict(
        re.findall(r"^\s*(\d+):\s*(true|false),", axis_src, re.MULTILINE)
    )
    if entries:
        axis = {int(k): v == "true" for k, v in sorted(entries.items(), key=lambda kv: int(kv[0]))}
        import pathlib

        core_dir = pathlib.Path(__file__).resolve().parent.parent / "texel_ray" / "core"
        (core_dir / "epsg_axis_latlon.json").write_text(
            json.dumps({str(k): v for k, v in axis.items()}, separators=(",", ":"))
        )
        print(f"epsg_axis_latlon.json: {len(axis)} codes")

    morton_src = open(f"{ref}/morton/morton_test.go").read()
    try:
        cases = extract_table(morton_src, "TestToZ")
        (out / "morton_cases.json").write_text(json.dumps(cases, indent=1))
        print(f"morton_cases.json: {len(cases)} cases")
    except Exception as e:  # noqa: BLE001
        print(f"morton_cases.json: SKIP ({e})")


if __name__ == "__main__":
    main()
