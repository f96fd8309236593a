"""Point-feature source: documents table → geocoded point Dataset.

This is the engine's "web pages → point features" step (BASELINE.json
north_star): a pure, stateless ``map_batches`` over numpy batches with
column pruning at the read — only (doc_id, n_chars[, lang]) leave the
Parquet files; the wide ``text`` column is never read unless a stage
needs it.
"""

from __future__ import annotations

import ray.data as rd

from ..core.features import doc_points


def read_points(sf_dir: str, with_lang: bool = False) -> "rd.Dataset":
    cols = ["doc_id", "n_chars"] + (["lang"] if with_lang else [])
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)
    return ds.map_batches(doc_points, batch_format="numpy")


def extent_of(ds: "rd.Dataset") -> tuple[float, float, float, float]:
    """Global (minx, miny, maxx, maxy) — a tiny all-reduce, the Ray
    analogue of the reference's pre-scan for the data extent
    (TileLasFile.groovy:120)."""
    from ray.data.aggregate import Max, Min

    row = ds.aggregate(Min("x"), Min("y"), Max("x"), Max("y"))
    return row["min(x)"], row["min(y)"], row["max(x)"], row["max(y)"]
