"""PCD file reading (ASCII + binary), counterpart of the writers in
points_processor.py. Fork parity: the wangtest harness consumes .pcd scans
(io/wangtest_main.cc)."""

from __future__ import annotations

import numpy as np


def read_pcd(path: str) -> np.ndarray:
    """Read x/y/z fields of a PCD v0.7 file -> (n, 3) float32."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if not line or line.startswith("#"):
                continue
            key, _, value = line.partition(" ")
            header[key.upper()] = value
            if key.upper() == "DATA":
                break
        fields = header.get("FIELDS", "x y z").split()
        sizes = list(map(int, header.get("SIZE", "4 4 4").split()))
        types = header.get("TYPE", "F F F").split()
        counts = list(map(int, header.get("COUNT", " ".join(["1"] * len(fields))).split()))
        n = int(header.get("POINTS", header.get("WIDTH", "0")))
        mode = header["DATA"]

        np_types = {("F", 4): "<f4", ("F", 8): "<f8", ("I", 4): "<i4",
                    ("I", 2): "<i2", ("I", 1): "<i1", ("U", 4): "<u4",
                    ("U", 2): "<u2", ("U", 1): "<u1"}
        dtype_fields = []
        for name, size, typ, count in zip(fields, sizes, types, counts):
            base = np_types[(typ, size)]
            if count == 1:
                dtype_fields.append((name, base))
            else:
                dtype_fields.append((name, base, (count,)))
        dtype = np.dtype(dtype_fields)

        if mode == "ascii":
            rows = np.loadtxt(f, dtype=np.float64, max_rows=n)
            rows = np.atleast_2d(rows)
            idx = [fields.index(c) for c in ("x", "y", "z")]
            return rows[:, idx].astype(np.float32)
        if mode == "binary":
            raw = np.frombuffer(f.read(n * dtype.itemsize), dtype=dtype, count=n)
            return np.stack([raw["x"], raw["y"], raw["z"]], -1).astype(np.float32)
        raise ValueError(f"unsupported PCD DATA mode {mode!r}")
