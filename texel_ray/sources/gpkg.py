"""GeoPackage (OGC GPKG / SQLite) source + sink.

Parity with the reference's only I/O format (``processing/gpkg/gpkg.go``):

- discovery: ``gpkg_geometry_columns`` + ``gpkg_contents`` + ``PRAGMA
  table_info`` + ``gpkg_spatial_ref_sys`` -> table list with column
  names/types, geometry column and SRS (gpkg.go:148-173,331-365);
- reader: SELECT *, strip the GeoPackageBinary header (magic 'GP',
  flags, srs_id, optional envelope) to raw WKB; admitted value types are
  exactly the reference's: bytes->str, int, float, timestamp, str, None
  (gpkg.go:116-133 — anything else raises);
- writer: creates the feature table + gpkg metadata rows, inserts in
  pages of ``pagesize`` rows per transaction with a running extent
  union written back to gpkg_contents (gpkg.go:205-272).

SQLite is a single-writer store, so the sink is a driver-side serial
consumer of ``iter_batches`` — faithful to the reference's design; the
scale sink remains partitioned parquet (state/manifest). The READER is
parallel: rowid-range chunks, one sqlite connection per read task.
"""

from __future__ import annotations

import sqlite3
import struct
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

_GPKG_APP_ID = 0x47504B47  # "GPKG"


@dataclass
class GpkgTable:
    name: str
    columns: list[tuple[str, str]]  # (name, declared sqlite type)
    geom_column: str
    geom_type: str
    srs_id: int
    pk_column: str | None = None  # INTEGER PRIMARY KEY column (rowid alias)


def gpkg_wkb_to_wkb(blob: bytes) -> bytes | None:
    """GeoPackageBinary -> raw WKB (strip header + optional envelope)."""
    if blob is None:
        return None
    if blob[:2] != b"GP":
        return bytes(blob)  # already raw WKB
    flags = blob[3]
    envelope_code = (flags >> 1) & 0b111
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(envelope_code)
    if env_len is None:
        raise ValueError(f"invalid GPKG envelope code {envelope_code}")
    return bytes(blob[8 + env_len :])


def wkb_to_gpkg_wkb(wkb: bytes, srs_id: int = 0) -> bytes:
    """Raw WKB -> GeoPackageBinary with no envelope, little-endian."""
    header = b"GP" + bytes([0, 0b00000001]) + struct.pack("<i", srs_id)
    return header + wkb


def list_tables(path: str) -> list[GpkgTable]:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        rows = con.execute(
            "SELECT table_name, column_name, geometry_type_name, srs_id "
            "FROM gpkg_geometry_columns"
        ).fetchall()
        tables = []
        for table_name, geom_col, geom_type, srs_id in rows:
            info = list(con.execute(f'PRAGMA table_info("{table_name}")'))
            cols = [(r[1], r[2]) for r in info]
            # an INTEGER PRIMARY KEY column aliases sqlite's rowid
            pk = next(
                (
                    r[1]
                    for r in info
                    if r[5] == 1 and (r[2] or "").upper().startswith("INT")
                ),
                None,
            )
            tables.append(
                GpkgTable(
                    name=table_name,
                    columns=cols,
                    geom_column=geom_col,
                    geom_type=geom_type,
                    srs_id=int(srs_id),
                    pk_column=pk,
                )
            )
        return tables
    finally:
        con.close()


def _admit(value):
    """Reference value admission (gpkg.go:116-133): bytes->utf8 str for
    TEXT-typed blobs is handled by sqlite3 already; reject exotica."""
    if value is None or isinstance(value, (int, float, str)):
        return value
    if isinstance(value, bytes):
        return value.decode("utf-8", errors="replace")
    raise TypeError(f"unsupported gpkg value type: {type(value)}")


def read_table_arrow(path: str, table: GpkgTable | str, rowid_range=None) -> pa.Table:
    """One chunk of a feature table as Arrow: attrs + raw-WKB geometry."""
    if isinstance(table, str):
        table = next(t for t in list_tables(path) if t.name == table)
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        sql = f'SELECT rowid AS __rowid__, * FROM "{table.name}"'
        if rowid_range is not None:
            sql += f" WHERE rowid >= {int(rowid_range[0])} AND rowid < {int(rowid_range[1])}"
        cur = con.execute(sql)
        names = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    cols: dict[int, list] = {i: [] for i in range(len(names))}
    for row in rows:
        for i, v in enumerate(row):
            cols[i].append(v)

    decl = {n: (t or "").upper() for n, t in table.columns}

    def declared_type(col_name: str):
        t = decl.get(col_name, "")
        if t.startswith("INT") or t in ("MEDIUMINT", "BIGINT", "TINYINT"):
            return pa.int64()
        if t in ("REAL", "DOUBLE", "FLOAT"):
            return pa.float64()
        if t == "BLOB":
            return pa.binary()
        return pa.string()

    arrays = []
    out_names = []
    for i, n in enumerate(names):
        if n == "__rowid__":
            # the INTEGER PRIMARY KEY column (if any) already carries the
            # id; detect it from PRAGMA metadata, never from values
            if table.pk_column is not None:
                continue
            arrays.append(pa.array(cols[i], pa.int64()))
            out_names.append("fid")
        elif n == table.geom_column:
            arrays.append(
                pa.array([gpkg_wkb_to_wkb(v) for v in cols[i]], pa.binary())
            )
            out_names.append("geom_wkb")
        else:
            # pin the arrow type from the declared sqlite type so empty
            # chunks (sparse rowids) keep a consistent schema
            arrays.append(pa.array([_admit(v) for v in cols[i]], declared_type(n)))
            out_names.append(n)
    return pa.table(arrays, names=out_names)


def read_gpkg(path: str, table_name: str, chunk_rows: int = 10_000):
    """Parallel chunked GeoPackage read -> ray.data.Dataset.

    Splits by rowid ranges; each task opens its own read-only connection
    (sqlite allows concurrent readers)."""
    import ray.data

    table = next(t for t in list_tables(path) if t.name == table_name)
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        lo, hi = con.execute(
            f'SELECT coalesce(min(rowid), 0), coalesce(max(rowid), -1) FROM "{table_name}"'
        ).fetchone()
    finally:
        con.close()
    if hi < lo:
        return ray.data.from_arrow(read_table_arrow(path, table))
    ranges = [
        {"start": s, "stop": min(s + chunk_rows, hi + 1)}
        for s in range(lo, hi + 1, chunk_rows)
    ]

    def read_chunk(batch: pa.Table) -> pa.Table:
        pieces = [
            read_table_arrow(path, table, (s, e))
            for s, e in zip(
                batch["start"].to_pylist(), batch["stop"].to_pylist()
            )
        ]
        return pa.concat_tables(pieces)

    return ray.data.from_items(ranges).map_batches(
        read_chunk, batch_format="pyarrow", batch_size=1
    )


# ---- sink -----------------------------------------------------------------

_SQLITE_TYPE = {
    pa.string(): "TEXT",
    pa.large_string(): "TEXT",
    pa.int64(): "INTEGER",
    pa.int32(): "INTEGER",
    pa.float64(): "REAL",
    pa.binary(): "BLOB",
}


def _ensure_gpkg(con: sqlite3.Connection):
    con.execute(f"PRAGMA application_id = {_GPKG_APP_ID}")
    con.execute(
        "CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys ("
        "srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, "
        "organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL, "
        "definition TEXT NOT NULL, description TEXT)"
    )
    con.execute(
        "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES "
        "('undefined', 0, 'NONE', 0, 'undefined', NULL)"
    )
    con.execute(
        "CREATE TABLE IF NOT EXISTS gpkg_contents ("
        "table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL, "
        "identifier TEXT UNIQUE, description TEXT DEFAULT '', "
        "last_change DATETIME DEFAULT CURRENT_TIMESTAMP, "
        "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, "
        "srs_id INTEGER)"
    )
    con.execute(
        "CREATE TABLE IF NOT EXISTS gpkg_geometry_columns ("
        "table_name TEXT NOT NULL, column_name TEXT NOT NULL, "
        "geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, "
        "z TINYINT NOT NULL, m TINYINT NOT NULL, "
        "CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"
    )


class GeoPackageSink:
    """Paged single-writer sink mirroring the reference writer
    (pagesize rows per transaction, running extent union)."""

    def __init__(
        self,
        path: str,
        table_name: str,
        schema: pa.Schema,
        geom_col: str = "geom_wkb",
        geom_type: str = "GEOMETRY",
        srs_id: int = 0,
        pagesize: int = 1000,
    ):
        from ..core.geom import wkb_decode

        self._wkb_decode = wkb_decode
        self.path = path
        self.table = table_name
        self.geom_col = geom_col
        self.srs_id = srs_id
        self.pagesize = pagesize
        self.extent = [np.inf, np.inf, -np.inf, -np.inf]
        self.con = sqlite3.connect(path)
        _ensure_gpkg(self.con)
        cols_sql = []
        self.columns = []
        for field in schema:
            if field.name == "fid":
                continue  # becomes the integer primary key below
            if field.name == self.geom_col:
                cols_sql.append(f'"{field.name}" BLOB')
            else:
                cols_sql.append(
                    f'"{field.name}" {_SQLITE_TYPE.get(field.type, "TEXT")}'
                )
            self.columns.append(field.name)
        self.has_fid = "fid" in schema.names
        if self.has_fid:
            self.columns.insert(0, "fid")
            cols_sql.insert(0, "fid INTEGER PRIMARY KEY")
        else:
            cols_sql.insert(0, "fid INTEGER PRIMARY KEY AUTOINCREMENT")
        self.con.execute(
            f'CREATE TABLE IF NOT EXISTS "{table_name}" ({", ".join(cols_sql)})'
        )
        self.con.execute(
            "INSERT OR REPLACE INTO gpkg_contents "
            "(table_name, data_type, identifier, srs_id) VALUES (?, 'features', ?, ?)",
            (table_name, table_name, srs_id),
        )
        self.con.execute(
            "INSERT OR REPLACE INTO gpkg_geometry_columns VALUES (?, ?, ?, ?, 0, 0)",
            (table_name, geom_col, geom_type, srs_id),
        )
        self.con.commit()

    def _update_extent_from(self, wkb: bytes):
        kind, coords = self._wkb_decode(wkb)
        if kind == "Point":
            pts = [coords]
        elif kind == "LineString":
            pts = coords
        elif kind == "Polygon":
            pts = [p for ring in coords for p in ring]
        elif kind == "MultiPolygon":
            pts = [p for poly in coords for ring in poly for p in ring]
        else:
            return
        for x, y in pts:
            self.extent[0] = min(self.extent[0], x)
            self.extent[1] = min(self.extent[1], y)
            self.extent[2] = max(self.extent[2], x)
            self.extent[3] = max(self.extent[3], y)

    def write_batch(self, batch: pa.Table):
        placeholders = ", ".join("?" for _ in self.columns)
        col_sql = ", ".join(f'"{c}"' for c in self.columns)
        sql = f'INSERT INTO "{self.table}" ({col_sql}) VALUES ({placeholders})'
        rows = []
        for i in range(batch.num_rows):
            row = []
            for c in self.columns:
                v = batch[c][i].as_py()
                if c == self.geom_col and v is not None:
                    self._update_extent_from(v)
                    v = wkb_to_gpkg_wkb(v, self.srs_id)
                row.append(v)
            rows.append(tuple(row))
            if len(rows) >= self.pagesize:
                self.con.executemany(sql, rows)
                self.con.commit()
                rows = []
        if rows:
            self.con.executemany(sql, rows)
            self.con.commit()

    def close(self):
        if np.isfinite(self.extent[0]):
            self.con.execute(
                "UPDATE gpkg_contents SET min_x=?, min_y=?, max_x=?, max_y=? "
                "WHERE table_name=?",
                (*self.extent, self.table),
            )
        self.con.commit()
        self.con.close()


def write_gpkg(ds, path: str, table_name: str, geom_col: str = "geom_wkb", **kwargs):
    """Consume a Dataset into a GeoPackage table (driver-side, paged)."""
    schema = ds.schema()
    arrow_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(schema.names, schema.types)]
    )
    sink = GeoPackageSink(path, table_name, arrow_schema, geom_col=geom_col, **kwargs)
    try:
        for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
            sink.write_batch(batch)
    finally:
        sink.close()
    return path
