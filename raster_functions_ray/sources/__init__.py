"""Dataset sources/sinks for the engine's logical tables.

The reference has no readers/writers — the ArcGIS host supplies pixel blocks
(SURVEY.md §2.6); here every table is parquet read via
``ray.data.read_parquet`` with column pruning at the read.
"""

from __future__ import annotations

import os

import ray.data as rd


def read_tiles(synth_d: str, columns: list[str] | None = None, **kw) -> rd.Dataset:
    """Tile catalog + payload. Pass ``columns`` to prune (e.g. metadata-only
    stages must not pull the pixel binary off storage)."""
    return rd.read_parquet(os.path.join(synth_d, "tiles.parquet"), columns=columns, **kw)


def read_documents(synth_d: str, **kw) -> rd.Dataset:
    return rd.read_parquet(os.path.join(synth_d, "documents.parquet"), **kw)


def read_zones(synth_d: str, columns: list[str] | None = None, **kw) -> rd.Dataset:
    return rd.read_parquet(os.path.join(synth_d, "zones.parquet"), columns=columns, **kw)


def read_training(synth_d: str, **kw) -> rd.Dataset:
    return rd.read_parquet(os.path.join(synth_d, "training.parquet"), **kw)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kw) -> rd.Dataset:
    """Driver-provided TPC-H-ish tables (TESTDATA.md)."""
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns, **kw)
