"""NetCDF-3 (classic / 64-bit-offset) grid scan — SURVEY §2.1 S5.

The reference loads GMT ``.grd`` rasters through scipy's netcdf_file
(`/root/reference/kf/utils/tsio.py:141-165`, ``load_grd(fname, var='z')``)
and stacks them into its input cube. This container has no netCDF
library, but the classic format is a small, fully public specification
(the same one scipy.io.netcdf implements): a big-endian header (dim /
attribute / variable lists) followed by fixed-offset array data. This
module parses it directly in numpy over Spark's ``binaryFile`` source —
the same pattern as the flat-binary BIL/BSQ/BIP scan in
``sources/dirlist.py`` — so a directory of .grd files becomes a
DataFrame of (file, y, x, value) rows with zero external dependencies.

Supported: CDF-1 ('CDF\\x01', 32-bit offsets) and CDF-2 ('CDF\\x02',
64-bit offsets), non-record variables of any numeric type — exactly the
shape GMT grids use. HDF5-based netCDF-4 files start with '\\x89HDF' and
raise a clear error (a real deployment adds the spark-nc datasource; the
reference's own reader is classic-format scipy too).

A minimal writer (`write_netcdf3`) exists for tests and fixtures — the
round-trip against numpy ground truth is the correctness evidence, the
same standard the BIL/BSQ/BIP scan is held to.
"""

from __future__ import annotations

import struct

import numpy as np

_NC_TYPES = {
    1: ("b", 1),  # byte
    2: ("S1", 1),  # char
    3: (">i2", 2),  # short
    4: (">i4", 4),  # int
    5: (">f4", 4),  # float
    6: (">f8", 8),  # double
}


def _pad4(n: int) -> int:
    return (n + 3) & ~3


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        self.p = 0

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.b, self.p)
        self.p += 4
        return v

    def u64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.b, self.p)
        self.p += 8
        return v

    def name(self) -> str:
        n = self.u32()
        s = self.b[self.p : self.p + n].decode("ascii")
        self.p += _pad4(n)
        return s

    def skip_values(self, nc_type: int, nelems: int) -> None:
        _, size = _NC_TYPES[nc_type]
        self.p += _pad4(nelems * size)


def parse_netcdf3(buf: bytes) -> dict:
    """Parse a classic-format buffer → {"dims": [(name, len)...],
    "vars": {name: {"dims": [idx...], "type": nc_type, "offset": int}}}.
    Header walk only — no data copies."""
    if buf[:4] == b"\x89HDF":
        raise ValueError(
            "netCDF-4/HDF5 container — only classic CDF-1/CDF-2 is "
            "supported without external libraries"
        )
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a NetCDF classic file")
    wide = buf[3] == 2
    r = _Reader(buf)
    r.p = 4
    r.u32()  # numrecs (record vars unsupported — grids are fixed-shape)
    dims: list[tuple[str, int]] = []
    tag, cnt = r.u32(), r.u32()
    if tag == 0x0A:
        for _ in range(cnt):
            nm = r.name()
            dims.append((nm, r.u32()))
    # global attributes
    tag, cnt = r.u32(), r.u32()
    if tag == 0x0C:
        for _ in range(cnt):
            r.name()
            t = r.u32()
            ne = r.u32()
            r.skip_values(t, ne)
    variables: dict = {}
    tag, cnt = r.u32(), r.u32()
    if tag == 0x0B:
        for _ in range(cnt):
            nm = r.name()
            nd = r.u32()
            dimids = [r.u32() for _ in range(nd)]
            atag, acnt = r.u32(), r.u32()
            if atag == 0x0C:
                for _ in range(acnt):
                    r.name()
                    t = r.u32()
                    ne = r.u32()
                    r.skip_values(t, ne)
            nc_type = r.u32()
            r.u32()  # vsize (padded byte count; recomputed from dims)
            off = r.u64() if wide else r.u32()
            variables[nm] = {"dims": dimids, "type": nc_type, "offset": off}
    return {"dims": dims, "vars": variables}


def read_var(buf: bytes, var: str) -> np.ndarray:
    """Extract one non-record variable as a numpy array (native layout,
    dims in file order — for a GMT grid: (y, x))."""
    h = parse_netcdf3(buf)
    if var not in h["vars"]:
        raise KeyError(f"variable {var!r} not in file: {sorted(h['vars'])}")
    v = h["vars"][var]
    shape = tuple(h["dims"][d][1] for d in v["dims"])
    dt, size = _NC_TYPES[v["type"]]
    n = int(np.prod(shape)) if shape else 1
    arr = np.frombuffer(buf, dtype=dt, count=n, offset=v["offset"])
    return arr.reshape(shape)


def write_netcdf3(path: str, arrays: dict[str, np.ndarray]) -> None:
    """Minimal CDF-1 writer (test fixture generator): 2-D float/double/int
    variables sharing dims named <var>_y / <var>_x (or 1-D with <var>_x).
    Layout mirrors what GMT writes for grids."""
    dims: list[tuple[str, int]] = []
    varmeta = []
    for name, a in arrays.items():
        a = np.asarray(a)
        dimids = []
        for ax, axlen in enumerate(a.shape):
            dn = f"{name}_{'yx'[ax] if a.ndim == 2 else 'x'}"
            dims.append((dn, axlen))
            dimids.append(len(dims) - 1)
        nc_type = {np.dtype("f4"): 5, np.dtype("f8"): 6, np.dtype(">f4"): 5,
                   np.dtype(">f8"): 6, np.dtype("i4"): 4, np.dtype(">i4"): 4,
                   np.dtype("i2"): 3, np.dtype(">i2"): 3}[a.dtype]
        varmeta.append((name, dimids, nc_type, a))

    def nm(s: str) -> bytes:
        raw = s.encode("ascii")
        return struct.pack(">I", len(raw)) + raw + b"\0" * (_pad4(len(raw)) - len(raw))

    head = b"CDF\x01" + struct.pack(">I", 0)
    head += struct.pack(">II", 0x0A, len(dims))
    for dn, dl in dims:
        head += nm(dn) + struct.pack(">I", dl)
    head += struct.pack(">II", 0, 0)  # no global attrs
    head += struct.pack(">II", 0x0B, len(varmeta))
    # first pass with zero offsets to learn the header size
    def var_entry(name, dimids, nc_type, a, off):
        e = nm(name) + struct.pack(">I", len(dimids))
        e += b"".join(struct.pack(">I", d) for d in dimids)
        e += struct.pack(">II", 0, 0)  # no var attrs
        _, size = _NC_TYPES[nc_type]
        vsize = _pad4(a.size * size)
        e += struct.pack(">III", nc_type, vsize, off)
        return e

    body0 = b"".join(var_entry(*m, 0) for m in varmeta)
    data_start = len(head) + len(body0)
    offs, cur = [], data_start
    for _name, _dimids, nc_type, a in varmeta:
        offs.append(cur)
        _, size = _NC_TYPES[nc_type]
        cur += _pad4(a.size * size)
    body = b"".join(var_entry(*m, o) for m, o in zip(varmeta, offs))
    with open(path, "wb") as f:
        f.write(head + body)
        for _name, _dimids, nc_type, a in varmeta:
            dt, size = _NC_TYPES[nc_type]
            raw = np.ascontiguousarray(a, dtype=dt).tobytes()
            f.write(raw + b"\0" * (_pad4(len(raw)) - len(raw)))


def read_grd_stack(spark, path_glob: str, var: str = "z"):
    """Directory of NetCDF grids → long rows (file, y, x, value) — the
    Spark form of the reference's per-file ``load_grd`` + stack loop.

    ``binaryFile`` scan → mapInPandas numpy parse per file: whole grids
    decode vectorized (one frombuffer + reshape each), emitted as long
    rows for the relational surface. At scale each file is one task;
    partition parallelism = file count, the same contract as the
    reference's per-interferogram ingest."""
    import pandas as pd
    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile").load(path_glob).select(
        F.element_at(F.split("path", "/"), -1).alias("file"), "content"
    )

    def run(it):
        for pdf in it:
            for fname, blob in zip(pdf["file"], pdf["content"]):
                g = read_var(bytes(blob), var)
                if g.ndim == 1:
                    g = g.reshape(1, -1)
                ny, nx = g.shape
                yy, xx = np.divmod(np.arange(ny * nx), nx)
                yield pd.DataFrame(
                    {
                        "file": fname,
                        "y": yy.astype(np.int32),
                        "x": xx.astype(np.int32),
                        "value": g.ravel().astype(np.float64),
                    }
                )

    return files.mapInPandas(run, schema="file string, y int, x int, value double")
